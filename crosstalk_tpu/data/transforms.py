"""Device-side tile transforms (jittable).

The reference runs per-tile min-max normalization and paired random flips on
the host inside DataLoader worker processes (train_model.py:211-318). On TPU
both are trivially vectorizable, so they run *inside the jitted step* on
device: the host ships raw float32 tiles and the VPU does the rest. This both
removes host CPU from the critical path and makes augmentation exactly
reproducible from a JAX PRNG key.

Semantics preserved:
  * normalize: ``(img - min) / (max - min)`` per tile, identity when the tile
    is constant (train_model.py:211-216);
  * train augmentation: horizontal flip with p=0.5 and vertical flip with
    p=0.5, each applied to *both* channels of a sample together
    (train_model.py:227-234). The commented-out affine/noise/erasing blocks in
    the reference (train_model.py:236-306) are disabled intent, not features,
    and are not implemented.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_tile(img: jnp.ndarray) -> jnp.ndarray:
    """Per-tile min-max normalization over the last two (H, W) axes.

    Works on any leading batch/channel dims. Constant tiles pass through
    unchanged (the reference's division-by-zero guard, train_model.py:213).
    """
    lo = jnp.min(img, axis=(-2, -1), keepdims=True)
    hi = jnp.max(img, axis=(-2, -1), keepdims=True)
    span = hi - lo
    safe = jnp.where(span > 0, span, 1.0)
    return jnp.where(span > 0, (img - lo) / safe, img)


def normalize_batch_nhwc(batch: jnp.ndarray) -> jnp.ndarray:
    """Min-max normalize a (B, H, W, C) batch per (sample, channel) tile."""
    lo = jnp.min(batch, axis=(1, 2), keepdims=True)
    hi = jnp.max(batch, axis=(1, 2), keepdims=True)
    span = hi - lo
    safe = jnp.where(span > 0, span, 1.0)
    return jnp.where(span > 0, (batch - lo) / safe, batch)


def paired_random_flips(
    key: jax.Array, batch: jnp.ndarray, index_offset=0
) -> jnp.ndarray:
    """Random horizontal + vertical flips, per sample, channels kept paired.

    ``batch`` is (B, H, W, C). Each sample independently draws hflip ~ p=0.5
    then vflip ~ p=0.5; a flip applies to every channel of that sample
    (the mixed/source pair must stay aligned — train_model.py:227-234).

    The draw for sample ``i`` comes from ``fold_in(key, index_offset + i)``,
    i.e. it is a function of the *global example index*, not of the batch
    layout. A data-parallel shard passes its global batch offset
    (``axis_index * shard_batch``) as ``index_offset`` and draws exactly the
    flips the single-device step would have drawn for the same examples —
    augmentation is layout-invariant across device counts (the epoch-scale
    1-vs-8-device CLI equivalence receipt in tests/test_training.py rides
    on this).

    Implemented as two batched `where`s over reversed views: XLA fuses this
    into the surrounding computation, no gather needed.
    """
    b = batch.shape[0]
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        key, index_offset + jnp.arange(b)
    )
    bits = jax.vmap(lambda k: jax.random.bernoulli(k, 0.5, (2,)))(keys)
    do_h = bits[:, 0].reshape(b, 1, 1, 1)
    do_v = bits[:, 1].reshape(b, 1, 1, 1)
    batch = jnp.where(do_h, batch[:, :, ::-1, :], batch)  # horizontal: flip W
    batch = jnp.where(do_v, batch[:, ::-1, :, :], batch)  # vertical: flip H
    return batch


def prepare_train_batch(
    key: jax.Array,
    raw_batch: jnp.ndarray,
    augment: bool = True,
    index_offset=0,
) -> jnp.ndarray:
    """Full on-device preprocessing for a raw (B, H, W, 2) float32 batch."""
    batch = normalize_batch_nhwc(raw_batch)
    if augment:
        batch = paired_random_flips(key, batch, index_offset=index_offset)
    return batch

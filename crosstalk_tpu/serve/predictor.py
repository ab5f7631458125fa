"""Build the jitted fixed-shape predict function for serving.

One program, one shape: normalization + forward compile once for the
serving batch size (the batcher pads every flush to that shape). The
forward is the folded-BN bf16 serving path by default (see
eval/fast_forward.py — measured ~6x the module path, 5,141 tiles/s/chip on
a v5e-1), with the f32 flax-module path available for checkpoint-parity
serving. With a multi-device mesh the batch is sharded over the 'data'
axis and params are replicated (GSPMD inserts the gather of the
(batch,)-sized result).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np

from crosstalk_tpu.config import ModelConfig


def make_predictor(
    variables,
    model_cfg: ModelConfig,
    batch_size,
    image_size: int = 256,
    fast: bool = True,
    mesh=None,
    use_pallas: Optional[bool] = None,
    warmup: bool = True,
    input_dtype=np.float32,
    int8_scales=None,
) -> Callable[[np.ndarray], np.ndarray]:
    """-> fn((n, H, W, C) ``input_dtype`` np) -> (n,) f32 np.

    ``batch_size`` is one int (one compiled shape — the batcher pads every
    flush to it) or a sequence of ints (batch buckets: one program per
    size, all compiled at warmup; ``n`` must then be one of them — the
    batcher's ``bucket_sizes`` picks the smallest that fits a flush).
    ``fast`` selects the folded-BN bf16 serving forward; False uses the flax
    module in the config's compute dtype (f32 for checkpoint parity).
    ``use_pallas`` defaults to True exactly when running single-device on a
    TPU backend (the Mosaic kernel has no GSPMD partitioning rule).
    ``input_dtype=np.float16`` compiles the program to take float16 batches
    and upcast ON DEVICE — the host->device transfer (the serving-stack
    bottleneck on bandwidth-limited links, PERF_NOTES "Online serving
    stack") moves half the bytes; normalization still runs in f32.
    ``int8_scales`` (from ``eval.calibrate_int8``) serves the opt-in int8
    MXU tier — requires ``fast=True`` and is OUTSIDE the 1e-4 parity
    budget (DEPLOY.md parity map).
    """
    import jax.numpy as jnp

    from crosstalk_tpu.io.export import make_forward

    n_channels = 2
    input_dtype = np.dtype(input_dtype)
    if isinstance(batch_size, (list, tuple, set, frozenset)):
        sizes = tuple(sorted({int(b) for b in batch_size}))
    else:
        sizes = (int(batch_size),)
    if not sizes or sizes[0] <= 0:
        raise ValueError(f"batch sizes must be positive, got {sizes}")
    if use_pallas is None:
        platform = jax.devices()[0].platform
        use_pallas = (fast and platform in ("tpu", "axon") and mesh is None)
    inner = make_forward(model_cfg, fast=fast, use_pallas=use_pallas,
                         int8_scales=int8_scales)
    if input_dtype == np.float32:
        step = inner
    else:
        def step(vs, x):
            return inner(vs, x.astype(jnp.float32))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        for b in sizes:
            if b % mesh.size != 0:
                raise ValueError(
                    f"serving batch size {b} must divide across the "
                    f"{mesh.size}-device mesh"
                )
        batch_sharding = NamedSharding(mesh, P("data"))
        replicated = NamedSharding(mesh, P())
        variables = jax.device_put(variables, replicated)
        step = jax.jit(
            step,
            in_shardings=(replicated, NamedSharding(mesh, P("data", None, None, None))),
            out_shardings=batch_sharding,
        )
    else:
        step = jax.jit(step)
        variables = jax.device_put(variables)

    def predict(raw: np.ndarray) -> np.ndarray:
        shape = (image_size, image_size, n_channels)
        if raw.ndim != 4 or raw.shape[1:] != shape or raw.shape[0] not in sizes:
            raise ValueError(
                f"predict expects shape (n, {', '.join(map(str, shape))}) "
                f"with n in {list(sizes)}, got {raw.shape}"
            )
        return np.asarray(step(variables, np.asarray(raw, input_dtype)))

    if warmup:  # compile every serving shape before the first request arrives
        for b in reversed(sizes):
            predict(np.zeros((b, image_size, image_size, n_channels), input_dtype))
    return predict

"""Jitted train / validation step functions, single-chip and data-parallel.

The reference's inner loop is zero_grad -> forward -> MSE -> backward -> step
on one device (train_model.py:419-424). Here the whole step — on-device
normalize + paired-flip augmentation, forward with batch-stat updates,
gradient, Adam update — is ONE compiled XLA program, with the learning rate
passed as a traced scalar so host-side schedules never trigger recompilation.
The train state is donated to the step, so parameter/optimizer buffers are
updated in place in HBM.

Data parallelism (SURVEY.md §5, BASELINE config #5) is `shard_map` over a
1-axis 'data' mesh: the batch is sharded across devices, parameters are
replicated, gradients and the loss are `pmean`-reduced over ICI, and
BatchNorm batch statistics are psum-synced inside the model (the model must
be built with axis_name='data'; see models/layers.py), so an N-chip step is
bitwise-equivalent in expectation to a 1-chip step on the global batch.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from crosstalk_tpu.config import OptimConfig
from crosstalk_tpu.data.transforms import (
    normalize_batch_nhwc,
    prepare_train_batch,
)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) equivalence: L2 is coupled into the
    gradient BEFORE the Adam moments (train_model.py:637 — this is Adam+L2,
    not AdamW), and the returned update is the *unscaled* Adam direction —
    the step applies ``params -= lr * update`` with the schedule's lr."""
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps),
    )


def init_train_state(model, variables, tx) -> TrainState:
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def _train_core(model, tx, axis_name: Optional[str], augment: bool = True,
                grad_accum: int = 1):
    """The per-shard training step body.

    ``augment=False`` skips the random flips, making the step a pure
    function of (state, batch) — this is what lets the N-device == 1-device
    equivalence claim in the module docstring be asserted numerically
    (tests/test_training.py) rather than only stated.

    ``grad_accum=N`` (extension — the reference's loop,
    train_model.py:419-424, has no equivalent) splits the step's batch into
    N sequential microbatches inside ONE compiled program: a ``lax.scan``
    whose body runs forward+backward on batch/N examples, so peak activation
    memory is bounded by the microbatch while the optimizer still takes one
    step on the mean gradient of the full batch. Semantics match a torch
    accumulation loop exactly (``(loss/N).backward()`` per microbatch, one
    ``optimizer.step()``): each microbatch is normalized by its OWN
    BatchNorm batch statistics and running stats update sequentially — so
    ``grad_accum=N`` at batch B is NOT bitwise the big-batch step at B
    (BN stats and dropout draws differ); it is bitwise the accumulation
    loop every torch user writes. Augmentation stays layout-invariant:
    each example's flip is drawn from its global batch index, so
    accumulated and unaccumulated steps see identical augmented pixels.
    """

    def loss_fn(params, batch_stats, batch, targets, dropout_rng):
        preds, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
        )
        loss = jnp.mean(jnp.square(preds - targets))
        return loss, mut["batch_stats"]

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def rngs_and_offset(rng, per_step_batch: int):
        """Split the step key and localize it to this shard.

        Dropout masks are whole-activation draws whose shapes depend on
        the shard batch — no layout-invariant scheme exists, so shards
        decorrelate (fold_in on the axis index). Augmentation, by
        contrast, is per-example: each shard passes its global batch
        offset and draws exactly the single-device flips
        (layout-invariant — see paired_random_flips).
        """
        aug_rng, dropout_rng = jax.random.split(rng)
        if axis_name is not None:
            idx = jax.lax.axis_index(axis_name)
            dropout_rng = jax.random.fold_in(dropout_rng, idx)
            offset = idx * per_step_batch
        else:
            offset = 0
        return aug_rng, dropout_rng, offset

    def accum_step_fn(state: TrainState, inputs, labels, lr, rng):
        aug_rng, dropout_rng, shard_offset = rngs_and_offset(
            rng, inputs.shape[0]
        )
        if inputs.shape[0] % grad_accum:
            raise ValueError(
                f"per-step batch {inputs.shape[0]} must divide by "
                f"grad_accum {grad_accum}"
            )
        micro = inputs.shape[0] // grad_accum
        xs = inputs.reshape(grad_accum, micro, *inputs.shape[1:])
        ys = labels.reshape(grad_accum, micro, *labels.shape[1:])

        def micro_step(carry, scanned):
            stats, grad_sum, loss_sum = carry
            i, xb, yb = scanned
            batch = prepare_train_batch(
                aug_rng, xb, augment=augment,
                index_offset=shard_offset + i * micro,
            )
            (loss, stats), g = grad_fn(
                state.params, stats, batch, yb,
                jax.random.fold_in(dropout_rng, i),
            )
            grad_sum = jax.tree.map(jnp.add, grad_sum, g)
            return (stats, grad_sum, loss_sum + loss), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (new_stats, grad_sum, loss_sum), _ = jax.lax.scan(
            micro_step,
            (state.batch_stats, zero_grads, jnp.zeros((), jnp.float32)),
            (jnp.arange(grad_accum), xs, ys),
        )
        # equal microbatches: mean of per-microbatch means == full-batch mean
        grads = jax.tree.map(lambda g: g / grad_accum, grad_sum)
        loss = loss_sum / grad_accum
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        return _apply_update(state, tx, grads, new_stats, loss, lr)

    def step_fn(state: TrainState, inputs, labels, lr, rng):
        aug_rng, dropout_rng, index_offset = rngs_and_offset(
            rng, inputs.shape[0]
        )
        batch = prepare_train_batch(
            aug_rng, inputs, augment=augment, index_offset=index_offset
        )
        (loss, new_stats), grads = grad_fn(
            state.params, state.batch_stats, batch, labels, dropout_rng
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)

        return _apply_update(state, tx, grads, new_stats, loss, lr)

    return accum_step_fn if grad_accum > 1 else step_fn


def _apply_update(state: TrainState, tx, grads, new_stats, loss, lr):
    """One optimizer step: params -= lr * unscaled-Adam(update)."""
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(
        lambda p, u: (p - lr * u).astype(p.dtype), state.params, updates
    )
    new_state = state.replace(
        params=new_params,
        batch_stats=new_stats,
        opt_state=new_opt_state,
        step=state.step + 1,
    )
    return new_state, loss


def _val_core(model, axis_name: Optional[str]):
    """Masked validation body -> (sq_err_sum, count)."""

    def step_fn(params, batch_stats, inputs, labels, mask):
        batch = normalize_batch_nhwc(inputs)
        preds = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch, train=False
        )
        sq_err = jnp.sum(jnp.square(preds - labels)[:, 0] * mask)
        count = jnp.sum(mask)
        if axis_name is not None:
            sq_err = jax.lax.psum(sq_err, axis_name)
            count = jax.lax.psum(count, axis_name)
        return sq_err, count

    return step_fn


def make_train_step(model, tx, mesh=None, axis_name: str = "data",
                    augment: bool = True, grad_accum: int = 1):
    """-> jitted fn(state, inputs, labels, lr, rng) -> (state, loss).

    With a mesh, the function is shard_mapped over it: call it with the
    batch sharded P(axis_name) on dim 0 (see ``batch_sharding``) and the
    state replicated. The state argument is donated.

    ``grad_accum=N`` runs the step as N sequential microbatches (the step's
    batch — per-shard batch under a mesh — must divide by N); see
    ``_train_core`` for the exact semantics.
    """
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    if mesh is None:
        core = _train_core(model, tx, axis_name=None, augment=augment,
                           grad_accum=grad_accum)
        return jax.jit(core, donate_argnums=0)

    core = _train_core(model, tx, axis_name=axis_name, augment=augment,
                       grad_accum=grad_accum)
    mapped = jax.shard_map(
        core,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=0)


def make_val_step(model, mesh=None, axis_name: str = "data"):
    """-> jitted fn(params, batch_stats, inputs, labels, mask)
    -> (sq_err_sum, count)."""
    if mesh is None:
        return jax.jit(_val_core(model, axis_name=None))
    mapped = jax.shard_map(
        _val_core(model, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def batch_sharding(mesh, axis_name: str = "data"):
    """NamedSharding for host batches: dim 0 split across the data axis."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P(axis_name))


def replicate_state(state: TrainState, mesh) -> TrainState:
    """Place a train state fully-replicated on the mesh."""
    if mesh is None:
        return state
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)

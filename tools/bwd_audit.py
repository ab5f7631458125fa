#!/usr/bin/env python
"""Bounded audit of the training-step backward pass (VERDICT r1 item 5).

PERF_NOTES.md already falsified: pool-first blocks, strided-slice pooling,
remat, custom-vjp BN backward, B=256. This audit measures the REMAINING
unexplained gap (fwd+bwd ≈ 2.9x fwd vs the 3x-forward ~543 us/img
speed-of-light) by decomposition plus two new ideas from the round-1 review:

  full        : the shipping train step (normalize+aug+fwd+bwd+Adam)
  grads       : same minus the optimizer update (isolates Adam)
  data_grads  : grads with stop_gradient on every conv/dense kernel+bias
                (the filter-gradient convolutions dead-code away; the
                data-gradient chain and BN-param grads remain)
  bf16_grads  : grads taken w.r.t. a bf16 cast of the params — the whole
                backward runs in bf16 with no f32 cast-backs at the
                parameter boundaries
  bf16_full   : full step where Adam consumes the bf16 grads (upcast at
                the moment update)

All hoist-proof (per-step input perturbation) with a D2H fence; us/img at
B=128 over a 16-step lax.scan. Defaults to the single-branch flagship
model, bf16 compute; ``-o double`` audits the two-branch 137M-param model
(its decomposition receipt lives next to the single-branch one in
PERF_NOTES.md).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from crosstalk_tpu.config import ModelConfig, OptimConfig
from crosstalk_tpu.data.transforms import normalize_batch_nhwc, paired_random_flips
from crosstalk_tpu.models import build_model, init_model
from crosstalk_tpu.train.steps import init_train_state, make_optimizer

B = 128
SCAN = 16


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    return float(np.asarray(leaf.ravel()[0] if leaf.ndim else leaf))


def _is_kernel_or_bias(path):
    names = {getattr(p, "key", None) for p in path}
    return "kernel" in names or ("bias" in names and "BatchNorm_0" not in names)


def make_step(model, tx, mode: str):
    def loss_fn(params, batch_stats, batch, labels, dropout_rng):
        # mode-specific masking must happen INSIDE the differentiated
        # function — a stop_gradient applied to the argument before the
        # value_and_grad call sits outside the autodiff scope and is a no-op
        # (verified: identical optimized-HLO conv counts).
        if mode == "data_grads":
            params = jax.tree_util.tree_map_with_path(
                lambda p, v: jax.lax.stop_gradient(v) if _is_kernel_or_bias(p) else v,
                params,
            )
        preds, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
        )
        loss = jnp.mean(jnp.square(preds - labels))
        return loss, mut["batch_stats"]

    def step(state, x, y, rng):
        aug_rng, dropout_rng = jax.random.split(rng)
        batch = paired_random_flips(aug_rng, normalize_batch_nhwc(x))

        params = state.params
        if mode in ("bf16_grads", "bf16_full"):
            params = jax.tree.map(lambda v: v.astype(jnp.bfloat16), params)

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state.batch_stats, batch, y, dropout_rng
        )

        if mode in ("full", "bf16_full"):
            if mode == "bf16_full":
                grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(
                lambda p, u: (p - 1e-4 * u).astype(p.dtype), state.params, updates
            )
            return state.replace(params=new_params, batch_stats=new_stats,
                                 opt_state=new_opt, step=state.step + 1), loss
        # consume every gradient leaf so nothing dead-codes away
        gsum = sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))
        return state.replace(batch_stats=new_stats, step=state.step + 1), loss + gsum

    def scan_fn(state, x, y, key):
        def body(carry, i):
            st, _ = carry
            xi = x + i.astype(jnp.float32) * 1e-9  # defeat hoisting
            st, loss = step(st, xi, y, jax.random.fold_in(key, i))
            return (st, loss), None

        (state, loss), _ = jax.lax.scan(
            body, (state, jnp.zeros(())), jnp.arange(SCAN)
        )
        return state, loss

    return jax.jit(scan_fn, donate_argnums=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--model_options", default="single",
                    choices=["single", "double"])
    args = ap.parse_args()
    cfg = ModelConfig(variant=args.model_options, compute_dtype="bf16")
    model = build_model(cfg)
    tx = make_optimizer(OptimConfig())
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((B, 256, 256, 2)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 0.5, (B, 1)).astype(np.float32))

    results = {}
    for mode in ("full", "grads", "data_grads", "bf16_grads", "bf16_full"):
        variables = init_model(model, jax.random.key(0), image_size=256, batch=2)
        state = init_train_state(model, variables, tx)
        fn = make_step(model, tx, mode)
        state, loss = fn(state, x, y, jax.random.key(2))  # compile + warm
        _sync(loss)
        # donated arg: rebuild state each timing rep via fresh init (cheap)
        best = float("inf")
        for _ in range(3):
            variables = init_model(model, jax.random.key(0), image_size=256, batch=2)
            state = init_train_state(model, variables, tx)
            t0 = time.perf_counter()
            state, loss = fn(state, x, y, jax.random.key(2))
            _sync(loss)
            best = min(best, time.perf_counter() - t0)
        us_img = best / (SCAN * B) * 1e6
        results[mode] = round(us_img, 1)
        print(f"{mode:12s}: {us_img:8.1f} us/img   "
              f"({SCAN * B / best:.0f} tiles/s)", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()

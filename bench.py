#!/usr/bin/env python
"""Throughput benchmark — 256x256 tiles/sec/chip on both model families
(single-branch 12.8M flagship + two-branch 137M; BASELINE.md target:
>=5,000 tiles/sec/chip for inference + train step).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tiles/sec/chip", "vs_baseline": N,
   "infer_tps": ..., "train_tps": ...,
   "two_branch_infer_tps": ..., "two_branch_train_tps": ...}
``value`` is the headline single-branch inference throughput via the
serving path (eval/fast_forward.py: folded-BN bf16 forward). The
training-step rates are reported alongside (a v5e's bf16 peak bounds the
78 GFLOP/tile single-branch training step to ~2.5k tiles/s/chip at 100%
MXU, so the 5k target is an inference-side goal per chip; training scales
across the data-parallel mesh). Measured context: conv blocks 2-6 run at
70-86% of MXU peak; the few-channel input block and the remaining gap are
analyzed in PERF_NOTES.md.

Measurement method: per-dispatch latency through this environment's TPU
relay is large (~100 ms), so each timed unit is a jitted lax.scan of
SCAN_LEN steps over an HBM-resident batch (normalize + forward [+ backward
+ Adam] per step — full per-step work, steady-state data residency; a
double-buffered host pipeline keeps HBM fed in production, see
crosstalk_tpu/data/pipeline.py). Timing fences with a device-to-host read:
in this environment jax.block_until_ready can return before remote
execution finishes, so a D2H read is the only honest fence.
"""

import json
import time

import jax
import numpy as np


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    return float(np.asarray(leaf.ravel()[0] if leaf.ndim else leaf))


def _timed(fn, *args, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_model(variant: str, infer_batch: int, train_batch: int):
    """-> (infer_tps, train_tps, infer_batch, train_batch) for one model."""
    import jax.numpy as jnp

    from crosstalk_tpu.config import ModelConfig, OptimConfig
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.eval.fast_forward import make_fast_forward
    from crosstalk_tpu.models import build_model, init_model
    from crosstalk_tpu.train.steps import (
        _train_core,
        init_train_state,
        make_optimizer,
    )

    cfg = ModelConfig(variant=variant, compute_dtype="bf16")
    model = build_model(cfg)
    variables = init_model(model, jax.random.key(0), image_size=256, batch=2)

    SCAN_LEN = 16
    INFER_SCAN_LEN = 32  # longer scan amortizes the fixed scan-entry cost

    # ---------- inference (serving path) ----------
    fast = make_fast_forward(cfg, use_pallas=True)

    def infer_scan(variables, x):
        def body(acc, i):
            # per-step input perturbation defeats loop-invariant hoisting —
            # with a fixed body XLA computes the forward ONCE and the "scan"
            # measures relay latency (observed: a 5x-too-good number)
            xi = x + i.astype(jnp.float32) * 1e-9
            preds = fast(variables, normalize_batch_nhwc(xi))
            return acc + jnp.sum(preds), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(INFER_SCAN_LEN))
        return acc

    infer_jit = jax.jit(infer_scan)

    while True:
        try:
            rng = np.random.default_rng(0)
            x = jnp.asarray(
                rng.random((infer_batch, 256, 256, 2)).astype(np.float32)
            )
            _sync(infer_jit(variables, x))  # compile + warm
            dt = _timed(infer_jit, variables, x)
            break
        except Exception as e:  # pragma: no cover - OOM fallback
            if "RESOURCE_EXHAUSTED" not in str(e) or infer_batch <= 16:
                raise
            infer_batch //= 2
    infer_tps = INFER_SCAN_LEN * infer_batch / dt
    del x

    # ---------- training step ----------
    tx = make_optimizer(OptimConfig())
    core = _train_core(model, tx, axis_name=None)

    def train_scan(state, x, y, key):
        def body(carry, _):
            st, i = carry
            st, loss = core(st, x, y, jnp.float32(1e-4), jax.random.fold_in(key, i))
            return (st, i + 1), loss

        (state, _), losses = jax.lax.scan(
            body, (state, jnp.zeros((), jnp.int32)), None, length=SCAN_LEN
        )
        return state, losses

    train_jit = jax.jit(train_scan, donate_argnums=0)

    while True:
        try:
            # (re)build the state INSIDE the retry: train_jit donates it, so
            # after a failed call the old state's buffers are already gone —
            # reusing it would crash the halved-batch retry with
            # "Array has been deleted" instead of benchmarking
            state = init_train_state(model, variables, tx)
            rng = np.random.default_rng(1)
            x = jnp.asarray(
                rng.random((train_batch, 256, 256, 2)).astype(np.float32)
            )
            y = jnp.asarray(
                rng.uniform(0, 0.5, (train_batch, 1)).astype(np.float32)
            )
            state, losses = train_jit(state, x, y, jax.random.key(2))  # warm
            _sync(losses)
            t0 = time.perf_counter()
            state, losses = train_jit(state, x, y, jax.random.key(2))
            _sync(losses)
            dt_train = time.perf_counter() - t0
            break
        except Exception as e:  # pragma: no cover - OOM fallback
            if "RESOURCE_EXHAUSTED" not in str(e) or train_batch <= 8:
                raise
            train_batch //= 2
    train_tps = SCAN_LEN * train_batch / dt_train
    del state, x, y
    return infer_tps, train_tps, infer_batch, train_batch


def main() -> None:
    infer_tps, train_tps, infer_batch, train_batch = bench_model(
        "single", infer_batch=512, train_batch=128
    )
    # two-branch train batch 128: the 137M-param Adam update + head
    # weight-gradient HBM traffic amortize with batch (B=64: 804 tiles/s,
    # B=128: 1189, B=256: 1176 — see PERF_NOTES.md)
    tb_infer, tb_train, tb_ib, tb_tb = bench_model(
        "double", infer_batch=256, train_batch=128
    )

    value = round(infer_tps, 1)
    print(
        json.dumps(
            {
                "metric": "256x256 tiles/sec/chip, single-branch bf16 inference "
                          "(train step rate in train_tps; two-branch model in "
                          "two_branch_*)",
                "value": value,
                "unit": "tiles/sec/chip",
                "vs_baseline": round(value / 5000.0, 3),
                "infer_tps": round(infer_tps, 1),
                "train_tps": round(train_tps, 1),
                "two_branch_infer_tps": round(tb_infer, 1),
                "two_branch_train_tps": round(tb_train, 1),
                "infer_batch": infer_batch,
                "train_batch": train_batch,
                "two_branch_infer_batch": tb_ib,
                "two_branch_train_batch": tb_tb,
                "device": jax.devices()[0].device_kind,
            }
        )
    )


if __name__ == "__main__":
    main()

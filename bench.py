#!/usr/bin/env python
"""Throughput benchmark — 256x256 tiles/sec/chip on both model families
(single-branch 12.8M flagship + two-branch 137M; BASELINE.md target:
>=5,000 tiles/sec/chip for inference + train step).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tiles/sec/chip", "vs_baseline": N,
   "infer_tps": ..., "train_tps": ...,
   "two_branch_infer_tps": ..., "two_branch_train_tps": ...,
   "int8_infer_tps": ...}
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

``--num_devices N`` benchmarks the data-parallel mesh (BASELINE target
hardware is a v5e-8): the global batch is N x the per-chip batch, the train
step is the same shard_mapped psum-BN/pmean-grad program the train CLI
runs, and the reported *_global rates aggregate all chips (per-chip
headline stays in ``value``). On the CPU backend (virtual mesh) the rates
are NOT meaningful — the run only validates plumbing, and the JSON says so.
"""

import argparse
import json
import sys
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


def bench_model(variant: str, infer_batch: int, train_batch: int, mesh=None,
                scan_len: int = None, image_size: int = 256):
    """-> (infer_tps, train_tps, infer_batch, train_batch) for one model.

    ``infer_batch``/``train_batch`` are PER-CHIP; with a mesh the global
    batch is mesh-size x that, and the returned rates are GLOBAL tiles/s
    (all chips). The mesh train program is the production one: shard_mapped
    scan with psum-synced BatchNorm and pmean'd grads (train/steps.py)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from crosstalk_tpu.config import ModelConfig, OptimConfig
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.eval.fast_forward import make_fast_forward
    from crosstalk_tpu.models import build_model, init_model
    from crosstalk_tpu.train.steps import (
        _train_core,
        init_train_state,
        make_optimizer,
        replicate_state,
    )

    n_dev = 1 if mesh is None else mesh.devices.size
    cfg = ModelConfig(variant=variant, compute_dtype="bf16")
    # under a mesh the train program must be the production one: BN layers
    # psum batch statistics over the axis (init still uses an axis-free
    # model — it traces outside shard_map where the axis is unbound)
    model = (build_model(cfg) if mesh is None
             else build_model(cfg, axis_name="data"))
    variables = init_model(build_model(cfg), jax.random.key(0),
                           image_size=image_size, batch=2)

    SCAN_LEN = 16 if scan_len is None else scan_len
    # longer scan amortizes the fixed scan-entry cost
    INFER_SCAN_LEN = 32 if scan_len is None else scan_len

    # ---------- inference (serving path) ----------
    # the Pallas input-block kernel is TPU-only; CPU (virtual-mesh smoke
    # runs) takes the XLA path of the same forward
    fast = make_fast_forward(
        cfg, use_pallas=jax.devices()[0].platform == "tpu"
    )

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

    if mesh is None:
        infer_jit = jax.jit(infer_scan)
        batch_shd = None
        rep_shd = None
    else:
        # batch sharded over the data axis, weights replicated; the forward
        # has no cross-batch ops, so XLA partitions it collective-free
        batch_shd = NamedSharding(mesh, P("data"))
        rep_shd = NamedSharding(mesh, P())
        infer_jit = jax.jit(infer_scan, in_shardings=(rep_shd, batch_shd))

    def _put(arr, shd):
        return jax.device_put(arr, shd) if shd is not None else jnp.asarray(arr)

    while True:
        try:
            rng = np.random.default_rng(0)
            x = _put(
                rng.random((n_dev * infer_batch, image_size, image_size,
                            2)).astype(np.float32),
                batch_shd,
            )
            vars_in = (jax.device_put(variables, rep_shd)
                       if rep_shd is not None else variables)
            _sync(infer_jit(vars_in, x))  # compile + warm
            dt = _timed(infer_jit, vars_in, x)
            break
        except Exception as e:  # pragma: no cover - OOM fallback
            if "RESOURCE_EXHAUSTED" not in str(e) or infer_batch <= 16:
                raise
            infer_batch //= 2
    infer_tps = INFER_SCAN_LEN * n_dev * infer_batch / dt
    del x

    # ---------- training step ----------
    tx = make_optimizer(OptimConfig())
    core = _train_core(model, tx, axis_name=None if mesh is None else "data")

    def train_scan(state, x, y, key):
        def body(carry, _):
            st, i = carry
            st, loss = core(st, x, y, jnp.float32(1e-4), jax.random.fold_in(key, i))
            return (st, i + 1), loss

        (state, _), losses = jax.lax.scan(
            body, (state, jnp.zeros((), jnp.int32)), None, length=SCAN_LEN
        )
        return state, losses

    if mesh is None:
        train_jit = jax.jit(train_scan, donate_argnums=0)
    else:
        mapped = jax.shard_map(
            train_scan,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P()),
            out_specs=(P(), P()),  # loss is pmean'd inside the core
            check_vma=False,
        )
        train_jit = jax.jit(mapped, donate_argnums=0)

    while True:
        try:
            # (re)build the state INSIDE the retry: train_jit donates it, so
            # after a failed call the old state's buffers are already gone —
            # reusing it would crash the halved-batch retry with
            # "Array has been deleted" instead of benchmarking
            state = replicate_state(init_train_state(model, variables, tx), mesh)
            rng = np.random.default_rng(1)
            x = _put(
                rng.random((n_dev * train_batch, image_size, image_size,
                            2)).astype(np.float32),
                batch_shd,
            )
            y = _put(
                rng.uniform(0, 0.5, (n_dev * train_batch, 1)).astype(np.float32),
                batch_shd,
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
    train_tps = SCAN_LEN * n_dev * train_batch / dt_train
    del state, x, y
    return infer_tps, train_tps, infer_batch, train_batch


def bench_int8_single(infer_batch: int, scan_len: int = None,
                      image_size: int = 256):
    """Aux measurement: the opt-in int8 serving tier (eval/int8_forward.py)
    on the single-branch flagship — the tier's winning family (two-branch
    is a measured wash, PERF_NOTES "int8 serving"). Single-chip only.
    OUTSIDE the 1e-4 parity budget by design, so it never feeds the
    headline ``value``; it rides along so round-over-round BENCH records
    track the tier. -> (tiles/s, batch)."""
    import jax.numpy as jnp

    from crosstalk_tpu.config import ModelConfig
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.eval.int8_forward import calibrate_int8, make_int8_forward
    from crosstalk_tpu.models import build_model, init_model

    cfg = ModelConfig(variant="single", compute_dtype="bf16")
    variables = init_model(build_model(cfg), jax.random.key(0),
                           image_size=image_size, batch=2)
    INFER_SCAN_LEN = 32 if scan_len is None else scan_len
    on_tpu = jax.devices()[0].platform == "tpu"

    while True:
        try:
            rng = np.random.default_rng(3)
            x = jnp.asarray(
                rng.random((infer_batch, image_size, image_size,
                            2)).astype(np.float32))
            scales = calibrate_int8(
                cfg, variables,
                normalize_batch_nhwc(x[: min(256, infer_batch)]),
                use_pallas=on_tpu,
            )
            quant = make_int8_forward(cfg, scales, use_pallas=on_tpu)

            def infer_scan(variables, x):
                def body(acc, i):
                    # same hoist-proofing as the bf16 scan above
                    xi = x + i.astype(jnp.float32) * 1e-9
                    preds = quant(variables, normalize_batch_nhwc(xi))
                    return acc + jnp.sum(preds), None

                acc, _ = jax.lax.scan(body, jnp.zeros(()),
                                      jnp.arange(INFER_SCAN_LEN))
                return acc

            infer_jit = jax.jit(infer_scan)
            _sync(infer_jit(variables, x))  # compile + warm
            dt = _timed(infer_jit, variables, x)
            break
        except Exception as e:  # pragma: no cover - OOM fallback
            if "RESOURCE_EXHAUSTED" not in str(e) or infer_batch <= 16:
                raise
            infer_batch //= 2
    return INFER_SCAN_LEN * infer_batch / dt, infer_batch


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--num_devices", type=int, default=1,
        help="benchmark the data-parallel mesh over N devices (global batch "
             "= N x per-chip; rates aggregate all chips). Default 1 keeps "
             "the single-chip semantics the driver records.")
    parser.add_argument(
        "--skip_double", action="store_true",
        help="single-branch model only (faster mesh smoke runs)")
    parser.add_argument(
        "--skip_int8", action="store_true",
        help="skip the auxiliary int8-tier measurement (it never feeds the "
             "headline; single-chip runs only)")
    parser.add_argument(
        "--infer_batch", type=int, default=512,
        help="per-chip inference batch (default 512, the measured optimum)")
    parser.add_argument(
        "--train_batch", type=int, default=128,
        help="per-chip train batch (default 128)")
    parser.add_argument(
        "--scan_len", type=int, default=None,
        help="override both timed-scan lengths (default 16 train / 32 "
             "infer); lower it for CPU-mesh plumbing smokes")
    parser.add_argument(
        "--image_size", type=int, default=256,
        help="tile size (default 256, the production shape; lower it for "
             "CPU-mesh plumbing smokes)")
    args = parser.parse_args(argv)
    for flag in ("num_devices", "infer_batch", "train_batch", "image_size"):
        if getattr(args, flag) < 1:
            parser.error(f"--{flag} must be >= 1")
    if args.scan_len is not None and args.scan_len < 1:
        parser.error("--scan_len must be >= 1")

    mesh = None
    if args.num_devices > 1:
        from crosstalk_tpu.parallel.mesh import data_mesh

        mesh = data_mesh(args.num_devices)
    n_dev = args.num_devices

    infer_tps, train_tps, infer_batch, train_batch = bench_model(
        "single", infer_batch=args.infer_batch, train_batch=args.train_batch,
        mesh=mesh, scan_len=args.scan_len, image_size=args.image_size
    )
    if args.skip_double:
        # None -> JSON null: unambiguously "not measured", never mistaken
        # for a measured collapse to 0.0 by round-over-round comparisons
        tb_infer = tb_train = tb_ib = tb_tb = None
    else:
        # two-branch train batch 128: the 137M-param Adam update + head
        # weight-gradient HBM traffic amortize with batch (B=64: 804 tiles/s,
        # B=128: 1189, B=256: 1176 — see PERF_NOTES.md)
        tb_infer, tb_train, tb_ib, tb_tb = bench_model(
            "double", infer_batch=256, train_batch=128, mesh=mesh,
            scan_len=args.scan_len, image_size=args.image_size
        )

    int8_tps = int8_batch = None
    if mesh is None and not args.skip_int8:
        int8_tps, int8_batch = bench_int8_single(
            args.infer_batch, scan_len=args.scan_len,
            image_size=args.image_size)

    value = round(infer_tps / n_dev, 1)  # headline stays per-chip
    result = {
        "metric": "256x256 tiles/sec/chip, single-branch bf16 inference "
                  "(train step rate in train_tps; two-branch model in "
                  "two_branch_*)",
        "value": value,
        "unit": "tiles/sec/chip",
        "vs_baseline": round(value / 5000.0, 3),
        "infer_tps": round(infer_tps / n_dev, 1),
        "train_tps": round(train_tps / n_dev, 1),
        "two_branch_infer_tps": (None if tb_infer is None
                                 else round(tb_infer / n_dev, 1)),
        "two_branch_train_tps": (None if tb_train is None
                                 else round(tb_train / n_dev, 1)),
        # aux: the opt-in int8 serving tier (outside the 1e-4 parity
        # budget — DEPLOY.md parity map); null = not measured (mesh mode
        # or --skip_int8), never a fake 0.0
        "int8_infer_tps": None if int8_tps is None else round(int8_tps, 1),
        "int8_infer_batch": int8_batch,
        "infer_batch": infer_batch,
        "train_batch": train_batch,
        "two_branch_infer_batch": tb_ib,
        "two_branch_train_batch": tb_tb,
        "device": jax.devices()[0].device_kind,
    }
    if n_dev > 1:
        result["num_devices"] = n_dev
        result["infer_tps_global"] = round(infer_tps, 1)
        result["train_tps_global"] = round(train_tps, 1)
        result["two_branch_infer_tps_global"] = (
            None if tb_infer is None else round(tb_infer, 1))
        result["two_branch_train_tps_global"] = (
            None if tb_train is None else round(tb_train, 1))
        if jax.devices()[0].platform == "cpu":
            result["note"] = ("virtual CPU mesh: validates the sharded "
                              "programs only; rates are NOT meaningful")
            print("NOTE: running on a virtual CPU mesh — plumbing "
                  "validation only, rates are not meaningful.",
                  file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

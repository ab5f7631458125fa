#!/usr/bin/env python
"""End-to-end probe for the opt-in int8 serving tier.

Measures, per model family, the bf16 fast-forward vs int8 forward
(eval/int8_forward.py) with bench.py's exact serving methodology
(normalize + forward in a lax.scan timed unit, per-step input
perturbation, D2H fence, OOM batch backoff), plus the int8-vs-f32
prediction deviation on the reference's 100 bundled real tiles.

Default weights are random-init + burned batch stats — the THROUGHPUT
ratio is weight-independent (same program), but the deviation number
must be re-measured per trained checkpoint before deploying the tier
(quantization error depends on the trained weight/activation
distributions): pass ``-p ckpt.pth -o family`` to probe the checkpoint
you intend to serve. Measured on a trained config-3 checkpoint: same
1.34x speedup, but 8.3e-3 MAE vs ~1.6e-5 at random init (PERF_NOTES
"Trained-checkpoint deviation receipt").

Run on the chip: python tools/int8_tier_probe.py [--skip_double]
                 python tools/int8_tier_probe.py -p best_model.pth -o single
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCAN_LEN = 16
REF_DATA = "/root/reference/Training_Data"


def _sync(out):
    return float(np.asarray(out))


def _timed(fn, *args, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _scan_probe(forward, normalize):
    def run(variables, x):
        def body(acc, i):
            xi = x + i.astype(jnp.float32) * 1e-9
            preds = forward(variables, normalize(xi))
            return acc + jnp.sum(preds), None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(SCAN_LEN))
        return acc

    return jax.jit(run)


def _rate(probe, variables, batch, image_size):
    while True:
        try:
            rng = np.random.default_rng(0)
            x = jnp.asarray(
                rng.random((batch, image_size, image_size, 2)).astype(np.float32)
            )
            _sync(probe(variables, x))  # compile + warm
            dt = _timed(probe, variables, x)
            return SCAN_LEN * batch / dt, batch
        except Exception as e:  # OOM backoff, as bench.py
            if "RESOURCE_EXHAUSTED" not in str(e) or batch <= 16:
                raise
            batch //= 2


def _real_tiles(n=100):
    from crosstalk_tpu.data.index import PairIndex
    from crosstalk_tpu.data.tiff import read_tile

    idx = PairIndex(f"{REF_DATA}/Mixed", f"{REF_DATA}/Source")
    tiles = []
    for i in range(min(n, len(idx))):
        s = idx[i]
        tiles.append(
            np.stack(
                [read_tile(s.mixed_path), read_tile(s.source_path)], axis=-1
            )
        )
    return np.stack(tiles)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--skip_double", action="store_true")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("-p", "--model_path", default=None,
                   help="Probe a TRAINED .pth checkpoint instead of "
                        "random-init weights — the deviation number that "
                        "matters for deploying the tier (throughput is "
                        "weight-independent). Probes only the checkpoint's "
                        "family (-o)")
    p.add_argument("-o", "--model_options", default="single",
                   choices=["single", "double"],
                   help="-p checkpoint's model family")
    args = p.parse_args(argv)

    from crosstalk_tpu.config import ModelConfig
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.eval.fast_forward import make_fast_forward
    from crosstalk_tpu.eval.int8_forward import calibrate_int8 as calibrate, make_int8_forward
    from crosstalk_tpu.models.registry import build_model, init_model

    on_tpu = jax.devices()[0].platform == "tpu"
    print(f"devices: {jax.devices()}")
    real = normalize_batch_nhwc(jnp.asarray(_real_tiles()))

    if args.model_path is not None:
        variants = [args.model_options]
    else:
        variants = ["single"] + ([] if args.skip_double else ["double"])
    for variant in variants:
        if args.model_path is not None:
            from crosstalk_tpu.io.torch_convert import (
                image_size_compatible,
                infer_image_size,
                load_pth,
                model_config_for_checkpoint,
            )

            variables = load_pth(args.model_path, variant)
            if not image_size_compatible(variables, variant, 256):
                # the probe's throughput inputs and reference calibration
                # tiles are hardwired 256px — fail with the clear message
                # the serving CLIs give, not a jit-time shape error
                px = infer_image_size(variables, variant)
                print(f"error: {args.model_path} was trained at {px}px "
                      "tiles; this probe measures the 256px serving shape "
                      "only", file=sys.stderr)
                return 2
            cfg = model_config_for_checkpoint(variant, variables)
            print(f"probing trained checkpoint {args.model_path} ({cfg})")
        else:
            cfg = ModelConfig(variant=variant)
            model = build_model(cfg)
            variables = init_model(model, jax.random.key(0), image_size=256)
            rng = np.random.default_rng(7)
            variables = {
                "params": variables["params"],
                "batch_stats": jax.tree.map(
                    lambda a: a
                    + jnp.asarray(rng.normal(0, 0.01, a.shape), a.dtype) ** 2,
                    variables["batch_stats"],
                ),
            }

        scales = calibrate(cfg, variables, real[:64], use_pallas=on_tpu)
        fast = make_fast_forward(cfg, use_pallas=on_tpu)
        quant = make_int8_forward(cfg, scales, use_pallas=on_tpu)

        tps_bf16, b1 = _rate(
            _scan_probe(fast, normalize_batch_nhwc), variables, args.batch, 256
        )
        tps_int8, b2 = _rate(
            _scan_probe(quant, normalize_batch_nhwc), variables, args.batch, 256
        )

        # deviation on the real tiles: int8 vs the f32 parity path
        import dataclasses

        f32_cfg = dataclasses.replace(cfg, compute_dtype="f32")
        f32_model = build_model(f32_cfg)
        p_f32 = np.asarray(
            jax.jit(lambda v, a: f32_model.apply(v, a, train=False))(
                variables, real
            )
        )
        p_int8 = np.asarray(jax.jit(quant)(variables, real))
        mae = float(np.abs(p_int8 - p_f32).mean())
        spread = float(np.ptp(p_f32))

        print(
            f"{variant}: bf16 {tps_bf16:7.1f} tiles/s (b{b1})"
            f" | int8 {tps_int8:7.1f} tiles/s (b{b2})"
            f" | speedup {tps_int8 / tps_bf16:.2f}x"
            f" | real-tile MAE vs f32 {mae:.2e} (pred spread {spread:.3f})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

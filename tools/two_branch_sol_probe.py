#!/usr/bin/env python
"""Per-stage speed-of-light accounting for the two-branch serving path.

The single-branch path measures at ~92-95% of the chip's bf16 peak because
its hot convs carry 256-512 channels (PERF_NOTES "Speed-of-light
accounting"). The two-branch model's convs are narrower (64-512 per
branch); this probe times each serving stage at B=256 (hoist-proof scan,
D2H fence) and compares against its own FLOP theory at the measured
~197 TF/s matmul rate, so the gap between the model's ~16 GFLOP/tile floor
(~82 us/img) and the measured full forward is attributed per stage.

Usage: python tools/two_branch_sol_probe.py [-b 256] [--scan 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-b", "--batch", type=int, default=256)
    ap.add_argument("--scan", type=int, default=32)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from crosstalk_tpu.config import ModelConfig
    from crosstalk_tpu.eval.fast_forward import (
        _block_affine,
        _conv_block_eval,
        _double_fused_input,
    )
    from crosstalk_tpu.models import build_model, init_model
    from crosstalk_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B, SCAN = args.batch, args.scan
    cfg = ModelConfig(variant="double", compute_dtype="bf16")
    model = build_model(cfg)
    variables = init_model(model, jax.random.key(0), image_size=256, batch=2)
    params, stats = variables["params"], variables["batch_stats"]
    eps, slope = cfg.bn_eps, cfg.leaky_slope

    def sync(out):
        return float(np.asarray(jax.tree_util.tree_leaves(out)[-1].ravel()[0]))

    def timed(fn, *a, repeats=3):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            sync(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    PEAK_TFS = 197.0  # measured bf16 matmul rate (PERF_NOTES)

    def stage(fn, tree, x, label, gflop_per_img):
        def loop(tree, x):
            def body(acc, i):
                xi = x + i.astype(x.dtype) * jnp.asarray(1e-9, x.dtype)
                return acc + fn(tree, xi), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(SCAN))
            return acc
        j = jax.jit(loop)
        sync(j(tree, x))
        dt = timed(j, tree, x)
        us = dt / (SCAN * B) * 1e6
        theory = gflop_per_img / PEAK_TFS * 1e3  # us at peak
        eff = theory / us * 100 if us else 0.0
        print(f"{label:42s} {us:7.1f} us/img  theory {theory:5.1f}  "
              f"-> {eff:4.0f}% of peak", flush=True)
        return us

    rng = np.random.default_rng(0)

    # conv block GFLOPs (2*MACs) per image, per branch:
    #   b1 1->64 @256^2: 9*1*64*256^2*2   = 0.075 G (as fused C=2,F=128 phase
    #       GEMM it is 9*8*512*128^2*2/4 ... measured as one stage below)
    #   b2 64->128 @128^2 (pool ->64^2): 9*64*128*128^2*2  = 2.42 G
    #   b3 128->256 @64^2: 9*128*256*64^2*2                = 2.42 G
    #   b4 256->512 @32^2: 9*256*512*32^2*2                = 2.42 G
    def branch_stage(i, cin, hw, gf):
        kb, sb, bb = _block_affine(
            params["bleed_branch"][f"ConvBlock_{i}"],
            stats["bleed_branch"][f"ConvBlock_{i}"], eps)
        x = jnp.asarray(rng.random((B, hw, hw, cin)).astype(np.float32))
        x = x.astype(jnp.bfloat16)
        return stage(
            lambda w, xi: jnp.sum(
                _conv_block_eval(xi, *w, slope).astype(jnp.float32)),
            (kb, sb, bb), x, f"branch block {i} ({cin}->{kb.shape[-1]} "
            f"@{hw}^2), x2 branches", gf)

    x0 = jnp.asarray(rng.random((B, 256, 256, 2)).astype(np.float32))
    us_in = stage(
        lambda vs, xi: sum(
            jnp.sum(z.astype(jnp.float32))
            for z in _double_fused_input(xi, vs["params"], vs["batch_stats"],
                                         eps, slope, False)
        ),
        variables, x0, "fused input block (both branches)", 2 * 0.075)

    us1 = branch_stage(1, 64, 128, 2.42)
    us2 = branch_stage(2, 128, 64, 2.42)
    us3 = branch_stage(3, 256, 32, 2.42)

    # head: flatten (16*16*1024) -> 512 -> 128 -> 1 (+ sigmoid*0.5)
    def head(w, h):
        from crosstalk_tpu.eval.fast_forward import _dense_bn_eval
        h = h.reshape(h.shape[0], -1)
        h = _dense_bn_eval(h, w["params"]["DenseBNBlock_0"],
                           w["batch_stats"]["DenseBNBlock_0"], eps, slope)
        h = _dense_bn_eval(h, w["params"]["DenseBNBlock_1"],
                           w["batch_stats"]["DenseBNBlock_1"], eps, slope)
        out = w["params"]["Dense_0"]
        h = jnp.dot(h.astype(jnp.bfloat16), out["kernel"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + out["bias"]
        return jnp.sum(jax.nn.sigmoid(h) * 0.5)

    hx = jnp.asarray(
        rng.random((B, 16, 16, 1024)).astype(np.float32)).astype(jnp.bfloat16)
    us_head = stage(head, variables, hx, "head (262144->512->128->1)", 0.27)

    total = us_in + 2 * (us1 + us2 + us3) + us_head
    print(f"\nsum of stages: {total:.1f} us/img "
          f"(full forward measures ~160.7; the remainder is normalize, "
          f"concat, and inter-stage fusion differences)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

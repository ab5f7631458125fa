#!/usr/bin/env python
"""Probe: fuse the two-branch model's two C=1->64 input blocks into ONE
block-diagonal Pallas input-block call.

The two-branch model's per-branch first blocks (1->64 @256^2,
two_branch_regression.py:10-13) are each too narrow for the Pallas fused
input kernel (F=64 < the 128-lane constraint), so the serving path runs
them as two XLA convs. But stacked they are EXACTLY the flagship
single-branch shape the kernel already wins at (C=2, F=128, measured 42 vs
49.7 us/img): a (3, 3, 2, 128) kernel with

    k[:, :, 0,   0: 64] = bleed kernel      (zeros elsewhere in that half)
    k[:, :, 1,  64:128] = source kernel

computes both branches' conv+affine+leaky+pool in one fused pass over the
(B, 256, 256, 2) input, and the branch outputs are lane slices
[..., :64] / [..., 64:] of the fused output.

Measures (B=256, 256px, hoist-proof scan, D2H fence):
  1. baseline full two-branch serving forward (current shipping path)
  2. the two XLA input blocks alone
  3. the fused Pallas block (+ the per-branch lane slices) alone
  4. full forward with the fused input block, + equivalence vs baseline

Usage: python tools/two_branch_input_probe.py [-b 256] [--scan 32]
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
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from crosstalk_tpu.config import ModelConfig
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.eval.fast_forward import (
        _block_affine,
        _conv_block_eval,
        _dense_bn_eval,
        make_fast_forward,
    )
    from crosstalk_tpu.models import build_model, init_model
    from crosstalk_tpu.ops.pallas.input_block import fused_input_block
    from crosstalk_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B, S, SCAN = args.batch, args.size, args.scan
    cfg = ModelConfig(variant="double", compute_dtype="bf16")
    model = build_model(cfg)
    variables = init_model(model, jax.random.key(0), image_size=S, batch=2)
    params, stats = variables["params"], variables["batch_stats"]
    eps, slope = cfg.bn_eps, cfg.leaky_slope

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[-1]
        return float(np.asarray(leaf.ravel()[0]))

    def timed(fn, *a, repeats=3):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            sync(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return best

    def scan_us_per_img(fn, tree, x, label):
        # ``tree`` rides as a jit ARGUMENT: closed-over weights constant-fold
        # into the lowered HLO and a 137M-param model overflows this
        # environment's remote-compile request (HTTP 413) — PERF_NOTES trap
        def loop(tree, x):
            def body(acc, i):
                xi = x + i.astype(jnp.float32) * 1e-9
                return acc + fn(tree, xi), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(SCAN))
            return acc
        j = jax.jit(loop)
        sync(j(tree, x))  # compile
        dt = timed(j, tree, x)
        us = dt / (SCAN * B) * 1e6
        print(f"{label:55s} {us:8.1f} us/img  ({SCAN * B / dt:,.0f} tiles/s)",
              flush=True)
        return us

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, S, S, 2)).astype(np.float32))

    # ---- per-branch block-0 params + the fused block-diagonal weights
    kb, sb, bb = _block_affine(params["bleed_branch"]["ConvBlock_0"],
                               stats["bleed_branch"]["ConvBlock_0"], eps)
    ks, ss, bs_ = _block_affine(params["source_branch"]["ConvBlock_0"],
                                stats["source_branch"]["ConvBlock_0"], eps)
    kfused = jnp.zeros((3, 3, 2, 128), kb.dtype)
    kfused = kfused.at[:, :, 0:1, 0:64].set(kb)
    kfused = kfused.at[:, :, 1:2, 64:128].set(ks)
    scale_f = jnp.concatenate([sb, ss])
    bias_f = jnp.concatenate([bb, bs_])

    # ---- equivalence first (bf16 noise budget)
    fused = fused_input_block(x, kfused, scale_f, bias_f, slope=slope)
    xla_b = _conv_block_eval(x[..., 0:1], kb, sb, bb, slope)
    xla_s = _conv_block_eval(x[..., 1:2], ks, ss, bs_, slope)
    db = float(jnp.max(jnp.abs(fused[..., :64].astype(jnp.float32)
                               - xla_b.astype(jnp.float32))))
    ds = float(jnp.max(jnp.abs(fused[..., 64:].astype(jnp.float32)
                               - xla_s.astype(jnp.float32))))
    print(f"equivalence: fused-vs-XLA max|diff| bleed {db:.2e}, source {ds:.2e}")

    # ---- 2. the two XLA input blocks alone
    def two_xla_blocks(w, xi):
        (kb, sb, bb), (ks, ss, bs_) = w
        a = _conv_block_eval(xi[..., 0:1], kb, sb, bb, slope)
        b2 = _conv_block_eval(xi[..., 1:2], ks, ss, bs_, slope)
        return jnp.sum(a.astype(jnp.float32)) + jnp.sum(b2.astype(jnp.float32))
    us_xla = scan_us_per_img(two_xla_blocks, ((kb, sb, bb), (ks, ss, bs_)), x,
                             "2x XLA input blocks (shipping)")

    # ---- 3. fused Pallas block + per-branch lane slices
    def fused_block(w, xi):
        kf, sf, bf = w
        z = fused_input_block(xi, kf, sf, bf, slope=slope)
        return (jnp.sum(z[..., :64].astype(jnp.float32))
                + jnp.sum(z[..., 64:].astype(jnp.float32)))
    us_fused = scan_us_per_img(fused_block, (kfused, scale_f, bias_f), x,
                               "fused Pallas block (+ slices)")

    # ---- 1. baseline full forward
    fast = make_fast_forward(cfg, use_pallas=True)
    us_base = scan_us_per_img(
        lambda vs, xi: jnp.sum(fast(vs, normalize_batch_nhwc(xi))),
        variables, x, "full forward, shipping path")

    # ---- 4. full forward with the fused input block
    def branch_rest_v(vs, h, brname):
        p, st = vs["params"][brname], vs["batch_stats"][brname]
        for i in range(1, 4):
            k, sc, bi = _block_affine(p[f"ConvBlock_{i}"], st[f"ConvBlock_{i}"], eps)
            h = _conv_block_eval(h, k, sc, bi, slope)
        return h

    def fused_predict(vs, xn):
        p, st = vs["params"], vs["batch_stats"]
        kb, sb, bb = _block_affine(p["bleed_branch"]["ConvBlock_0"],
                                   st["bleed_branch"]["ConvBlock_0"], eps)
        ks, ss, bs_ = _block_affine(p["source_branch"]["ConvBlock_0"],
                                    st["source_branch"]["ConvBlock_0"], eps)
        kf = jnp.zeros((3, 3, 2, 128), kb.dtype)
        kf = kf.at[:, :, 0:1, 0:64].set(kb)
        kf = kf.at[:, :, 1:2, 64:128].set(ks)
        z = fused_input_block(xn, kf, jnp.concatenate([sb, ss]),
                              jnp.concatenate([bb, bs_]), slope=slope)
        bleed = branch_rest_v(vs, z[..., :64], "bleed_branch")
        source = branch_rest_v(vs, z[..., 64:], "source_branch")
        h = jnp.concatenate([bleed, source], axis=-1)
        h = h.reshape(h.shape[0], -1)
        h = _dense_bn_eval(h, p["DenseBNBlock_0"], st["DenseBNBlock_0"], eps, slope)
        h = _dense_bn_eval(h, p["DenseBNBlock_1"], st["DenseBNBlock_1"], eps, slope)
        out = p["Dense_0"]
        h = jnp.dot(h.astype(jnp.bfloat16), out["kernel"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + out["bias"]
        return jax.nn.sigmoid(h) * 0.5

    us_full_fused = scan_us_per_img(
        lambda vs, xi: jnp.sum(fused_predict(vs, normalize_batch_nhwc(xi))),
        variables, x, "full forward, fused input block")

    # prediction equivalence of the two full paths
    xn8 = normalize_batch_nhwc(x[:8])
    base_p = np.asarray(jax.jit(fast)(variables, xn8))
    fused_p = np.asarray(jax.jit(fused_predict)(variables, xn8))
    print(f"prediction max|diff| shipping-vs-fused: "
          f"{np.abs(base_p - fused_p).max():.2e}")
    print(f"\nsummary: input blocks {us_xla:.1f} -> {us_fused:.1f} us/img; "
          f"full forward {us_base:.1f} -> {us_full_fused:.1f} us/img")
    return 0


if __name__ == "__main__":
    sys.exit(main())

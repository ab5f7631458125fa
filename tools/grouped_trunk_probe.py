#!/usr/bin/env python
"""Probe: two-branch trunk as grouped convs vs per-branch convs.

The two-branch model (reference two_branch_regression.py:8-32) runs two
weight-independent 4-block encoders over the bleed / source channels and
concatenates features. Mathematically that equals ONE stack of grouped
convolutions with feature_group_count=2 on the 2-channel input, with each
block's kernels concatenated on the output-channel axis — and grouping
turns the two pathological C=1 input convs (64 output lanes, half the
128-lane register width) into a single C=2 -> 128 conv.

Measures eval-mode trunk forward and fwd+bwd for both forms at the
instantiated config (f=64/branch), checks numeric equivalence, prints
us/img. Hoist-proof scan + D2H fence as per PERF_NOTES.md.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B = 64
SCAN = 8
FEATS = [64, 128, 256, 512]  # per-branch


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


def conv(x, k, groups=1):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def block(x, k, scale, bias, groups=1):
    y = conv(x, k, groups) * scale.astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)
    y = jnp.where(y >= 0, y, jnp.asarray(0.01, jnp.bfloat16) * y)
    # weak-scalar -inf init so lax dispatches to the DIFFERENTIABLE
    # reduce_window_max primitive (a bf16 array init produces the generic
    # non-differentiable reduce_window)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )


def make_params(key):
    ks, ss, bs = [], [], []
    c = 1
    for i, f in enumerate(FEATS):
        k1, k2, k3, key = jax.random.split(key, 4)
        ks.append((jax.random.normal(k1, (3, 3, c, f), jnp.float32) * 0.1,
                   jax.random.normal(k2, (3, 3, c, f), jnp.float32) * 0.1))
        ss.append((jax.random.normal(k3, (f,)) * 0.1 + 1.0,
                   jax.random.normal(key, (f,)) * 0.1 + 1.0))
        bs.append((jnp.zeros((f,)) + 0.01, jnp.zeros((f,)) - 0.01))
        c = f
    return ks, ss, bs


def perbranch_trunk(params, x):
    ks, ss, bs = params
    hb, hs = x[..., 0:1], x[..., 1:2]
    for (kb, ksrc), (sb, ssrc), (bb, bsrc) in zip(ks, ss, bs):
        hb = block(hb, kb, sb, bb)
        hs = block(hs, ksrc, ssrc, bsrc)
    return jnp.concatenate([hb, hs], axis=-1)


def grouped_trunk(params, x):
    ks, ss, bs = params
    h = x
    for (kb, ksrc), (sb, ssrc), (bb, bsrc) in zip(ks, ss, bs):
        k = jnp.concatenate([kb, ksrc], axis=-1)  # (3,3,C,2F)
        s = jnp.concatenate([sb, ssrc])
        b = jnp.concatenate([bb, bsrc])
        h = block(h, k, s, b, groups=2)
    return h


def main():
    params = make_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, 256, 256, 2)).astype(np.float32))

    # numeric equivalence (bf16 -> expect close, not bitwise)
    a = jax.jit(perbranch_trunk)(params, x)
    b = jax.jit(grouped_trunk)(params, x)
    diff = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
    scale = float(jnp.mean(jnp.abs(a.astype(jnp.float32))))
    print(f"equivalence: rel MAE={float(jnp.mean(diff))/scale:.3e} "
          f"rel max={float(jnp.max(diff))/scale:.3e} (|a| mean {scale:.3f})",
          flush=True)

    for name, trunk in (("per-branch", perbranch_trunk), ("grouped", grouped_trunk)):
        def fwd_scan(params, x):
            def body(acc, i):
                xi = x + i.astype(jnp.float32) * 1e-9
                return acc + jnp.sum(trunk(params, xi).astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(SCAN))
            return acc

        def loss(params, x):
            return jnp.mean(jnp.square(trunk(params, x).astype(jnp.float32)))

        def bwd_scan(params, x):
            def body(acc, i):
                xi = x + i.astype(jnp.float32) * 1e-9
                l, g = jax.value_and_grad(loss)(params, xi)
                gsum = sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(g))
                return acc + l + gsum, None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(SCAN))
            return acc

        fj = jax.jit(fwd_scan)
        _sync(fj(params, x))
        dt = _timed(fj, params, x)
        fwd_us = dt / (SCAN * B) * 1e6

        bj = jax.jit(bwd_scan)
        _sync(bj(params, x))
        dt = _timed(bj, params, x)
        bwd_us = dt / (SCAN * B) * 1e6
        print(f"{name:11s}: fwd {fwd_us:7.1f} us/img   fwd+bwd {bwd_us:7.1f} us/img",
              flush=True)


if __name__ == "__main__":
    main()

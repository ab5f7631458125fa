#!/usr/bin/env python
"""Probe: does this chip deliver int8 MXU throughput above bf16?

v5e datasheet: 197 TF/s bf16 vs 394 TOPS int8. If the toolchain routes
``lax.dot_general(int8, int8, preferred_element_type=int32)`` onto the int8
MXU path, an int8 serving path could roughly double inference throughput
(the model is FLOPs-bound at ~92-95% of bf16 speed-of-light, PERF_NOTES
"Speed-of-light accounting"). This probe measures raw matmul rates with the
repo's hoist-proof methodology (per-step input perturbation, D2H fence)
before we invest in a quantized path.

Usage: python tools/int8_probe.py [-n 4096] [-s 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def _rate(fn, x, w, steps, n):
    jitted = jax.jit(fn, static_argnums=2)
    out = jitted(x, w, steps)
    float(jnp.asarray(out)[0, 0])  # warm BOTH the program and the fence op
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jitted(x, w, steps)
        float(jnp.asarray(out)[0, 0])  # D2H fence (warm)
        best = min(best, time.perf_counter() - t0)
    flops = 2 * n * n * n * steps
    return flops / best / 1e12


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("-n", type=int, default=4096)
    p.add_argument("-s", "--steps", type=int, default=64)
    args = p.parse_args(argv)
    n, steps = args.n, args.steps

    key = jax.random.key(0)
    kx, kw = jax.random.split(key)

    # bf16 baseline
    xb = jax.random.normal(kx, (n, n), jnp.bfloat16)
    wb = jax.random.normal(kw, (n, n), jnp.bfloat16)

    def bf16_scan(x, w, steps):
        def body(acc, i):
            xi = x + i.astype(jnp.bfloat16)  # hoist-proof perturbation
            return acc + jnp.dot(xi, w), ()
        acc0 = jnp.zeros((n, n), jnp.bfloat16)
        acc, _ = lax.scan(body, acc0, jnp.arange(steps))
        return acc

    # int8 x int8 -> int32
    xi8 = jax.random.randint(kx, (n, n), -127, 128, jnp.int8)
    wi8 = jax.random.randint(kw, (n, n), -127, 128, jnp.int8)

    def int8_scan(x, w, steps):
        def body(acc, i):
            xi = x ^ i.astype(jnp.int8)  # hoist-proof, free on VPU
            z = lax.dot_general(
                xi, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc + z, ()
        acc0 = jnp.zeros((n, n), jnp.int32)
        acc, _ = lax.scan(body, acc0, jnp.arange(steps))
        return acc

    # int4 x int4 -> int32 (v5e MXU also has an int4 mode on paper)
    xi4 = (xi8 & 0x7).astype(jnp.int4)
    wi4 = (wi8 & 0x7).astype(jnp.int4)

    def int4_scan(x, w, steps):
        def body(acc, i):
            xi = x ^ i.astype(jnp.int4)
            z = lax.dot_general(
                xi, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc + z, ()
        acc0 = jnp.zeros((n, n), jnp.int32)
        acc, _ = lax.scan(body, acc0, jnp.arange(steps))
        return acc

    steps_arr = steps
    r_bf16 = _rate(bf16_scan, xb, wb, steps_arr, n)
    print(f"bf16  {n}^3 x{steps}: {r_bf16:8.1f} TF/s")
    try:
        r_i8 = _rate(int8_scan, xi8, wi8, steps_arr, n)
        print(f"int8  {n}^3 x{steps}: {r_i8:8.1f} TOP/s  "
              f"({r_i8 / r_bf16:.2f}x bf16)")
    except Exception as e:  # noqa: BLE001
        print(f"int8 failed: {type(e).__name__}: {str(e)[:120]}")
    try:
        r_i4 = _rate(int4_scan, xi4, wi4, steps_arr, n)
        print(f"int4  {n}^3 x{steps}: {r_i4:8.1f} TOP/s  "
              f"({r_i4 / r_bf16:.2f}x bf16)")
    except Exception as e:  # noqa: BLE001
        # jax 0.8/axon: S4 arrays recurse in jit dispatch (toolchain limit)
        print(f"int4 failed: {type(e).__name__}: {str(e)[:120]}")

    # Does XLA route int8 CONVOLUTIONS to the int8 MXU? (block2-like shape)
    B, H, C, F, S = 32, 128, 128, 256, 16
    conv_steps = min(steps, S)
    dn = lax.conv_dimension_numbers(
        (B, H, H, C), (3, 3, C, F), ("NHWC", "HWIO", "NHWC"))
    work = 2 * B * H * H * 9 * C * F * conv_steps

    def conv_rate(fn, x, w):
        j = jax.jit(fn)
        out = j(x, w)
        float(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(j(x, w))
            best = min(best, time.perf_counter() - t0)
        return work / best / 1e12

    xcb = jax.random.normal(kx, (B, H, H, C), jnp.bfloat16)
    wcb = jax.random.normal(kw, (3, 3, C, F), jnp.bfloat16)

    def conv_bf16(x, w):
        def body(acc, i):
            xi = x + i.astype(jnp.bfloat16)
            z = lax.conv_general_dilated(
                xi, w, (1, 1), "SAME", dimension_numbers=dn)
            return acc + z, ()
        acc, _ = lax.scan(body, jnp.zeros((B, H, H, F), jnp.bfloat16),
                          jnp.arange(conv_steps))
        return jnp.sum(acc)  # consume the whole output (trap #5)

    xci = jax.random.randint(kx, (B, H, H, C), -127, 128, jnp.int8)
    wci = jax.random.randint(kw, (3, 3, C, F), -127, 128, jnp.int8)

    def conv_int8(x, w):
        def body(acc, i):
            xi = x ^ i.astype(jnp.int8)
            z = lax.conv_general_dilated(
                xi, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32)
            return acc + z, ()
        acc, _ = lax.scan(body, jnp.zeros((B, H, H, F), jnp.int32),
                          jnp.arange(conv_steps))
        return jnp.sum(acc)

    rc = conv_rate(conv_bf16, xcb, wcb)
    print(f"conv(3x3,{C}->{F}@{H}^2) bf16: {rc:6.1f} TF/s")
    rci = conv_rate(conv_int8, xci, wci)
    print(f"conv(3x3,{C}->{F}@{H}^2) int8: {rci:6.1f} TOP/s  "
          f"({rci / rc:.2f}x bf16)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

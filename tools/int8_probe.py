"""Probe: does an int8 conv hit the v5e MXU at ~2x bf16 rate?

Measures lax.conv_general_dilated at the single-branch hot-block shapes
(PERF_NOTES "Inference" table) in bf16 vs int8(+int32 accum), to decide
whether an int8 serving tier is worth shipping (v5e nominal: 394 TOPS
int8 vs 197 TFLOPs bf16).

Measurement rules learned the hard way (PERF_NOTES traps + bench.py):
  * jax.block_until_ready can return before remote execution finishes in
    this environment -- the only honest fence is a D2H read;
  * per-dispatch relay overhead is ~100 ms -- the timed unit is a
    lax.scan of SCAN_LEN convs;
  * sum(conv(x, k)) is algebraically simplified by XLA (the reduction
    factors through the conv -- measured an impossible 38 PF/s) -- the
    consumer must be sum(abs(conv(...)));
  * the conv input is perturbed per scan step (x + i) so the conv cannot
    be hoisted out of the loop. The add + abs-reduce cost ~20% extra
    bandwidth; the bf16/int8 RATIO is the decision variable, not the
    absolute rate.

Run on the chip: python tools/int8_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

BLOCKS = [
    # (name, B, H, C_in, C_out)  -- conv 3x3 s1 p1 at HxH
    ("block2", 64, 128, 128, 256),
    ("block3", 64, 64, 256, 512),
    ("block4", 64, 32, 512, 512),
]
SCAN_LEN = 16


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8 else None,
    )


# x/k must be ARGUMENTS, not closure captures: a closed-over device array is
# baked into the HLO as a constant, and a ~1 GB program body overflows the
# remote-compile relay (HTTP 413).
@jax.jit
def run(x, k):
    def step(acc, i):
        xi = x + i.astype(x.dtype)  # int8 wraps; fine for a perf probe
        y = conv(xi, k)
        return acc + jnp.sum(jnp.abs(y).astype(jnp.float32)), None

    acc, _ = jax.lax.scan(
        step, jnp.float32(0), jnp.arange(SCAN_LEN, dtype=jnp.int32)
    )
    return acc


def bench(x, k, repeats=3):
    float(np.asarray(run(x, k)))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run(x, k)
        float(np.asarray(out))  # D2H fence
        best = min(best, time.perf_counter() - t0)
    return best / SCAN_LEN


def main():
    print(f"devices: {jax.devices()}")
    key = jax.random.key(0)
    kx, kk = jax.random.split(key)
    for name, b, h, cin, cout in BLOCKS:
        flops = 2 * b * h * h * cin * cout * 9
        xf = jax.random.normal(kx, (b, h, h, cin), jnp.bfloat16)
        kf = jax.random.normal(kk, (3, 3, cin, cout), jnp.bfloat16)
        xi = jax.random.randint(kx, (b, h, h, cin), -127, 128, jnp.int8)
        ki = jax.random.randint(kk, (3, 3, cin, cout), -127, 128, jnp.int8)
        tf = bench(xf, kf)
        ti = bench(xi, ki)
        print(
            f"{name}: bf16 {tf*1e6/b:7.2f} us/img ({flops/tf/1e12:6.1f} TF/s)"
            f" | int8 {ti*1e6/b:7.2f} us/img ({flops/ti/1e12:6.1f} TOP/s)"
            f" | speedup {tf/ti:.2f}x"
        )


if __name__ == "__main__":
    main()

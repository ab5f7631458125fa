"""Pallas TPU kernel: fused input ConvBlock (conv3x3 + folded-BN affine +
LeakyReLU + maxpool 2x2) for few-channel inputs.

Why this kernel exists. The models' first block convolves a 1-2 channel
image (regression_model.py:14-17 / two_branch_regression.py:10-13 in the
reference). On TPU this layer is pathological for XLA: the input channel
dim (2) is padded to the 128-lane register width, and the 16 MB/image
pre-pool activation (256x256x128 bf16) is materialized to HBM and read back
by the pool — the block is pure HBM bandwidth, ~38 us/image, ~47% of the
whole model's inference time for ~1% of its FLOPs (measured, v5e).

The kernel fuses the whole block so only the pooled output (4 MB) ever
touches HBM, and restructures the conv for the MXU:

  * space-to-depth: the (H, W, C) image becomes (H/2, W/2, 4C) — the 2x2
    maxpool windows align exactly with the four s2d phases, so
    pool(conv3x3(x)) == max over 4 phase-convs of the s2d image. The four
    phase kernels assemble into ONE (3, 3, 4C, 4F) kernel (zero-structured),
    turning the MXU contraction from 9*C (= 18, 14% MXU utilization) into
    9*4C (= 72, 56%).
  * per row-chunk: an im2col patch matrix in VMEM -> one MXU matmul ->
    affine -> LeakyReLU -> max over the 4 phase groups -> write the pooled
    rows. The affine is the eval-mode BatchNorm fold (scale = gamma * rsqrt
    (var + eps); bias = (conv_bias - mean) * scale + beta), so the kernel
    computes the block's exact eval semantics.

Used by the fast inference path (eval/fast_forward.py); training and the
f32 parity mode keep the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def build_phase_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, F) canonical conv kernel -> (3, 3, 4C, 4F) s2d phase kernel.

    Output channel o' = phase * F + o where phase = 2*p + q indexes the
    position inside the 2x2 pool window; input channel c' = (r*2 + s)*C + c
    where (r, s) is the position inside the source 2x2 s2d patch. For output
    pixel (2a+p, 2b+q), tap (dh, dw): source row 2a+p+dh-1 = 2(a+du)+r with
    (du, r) = divmod(p+dh-1, 2) — du spans {-1, 0, 1}, hence the 3x3 s2d
    kernel with zero rows where a phase never reaches.
    """
    three, three2, c_in, f = kernel.shape
    assert three == 3 and three2 == 3, "input block kernel must be 3x3"
    # static scatter indices, built once per trace
    tu, tv, tc, tp, sh, sw, sc = [], [], [], [], [], [], []
    for p in range(2):
        for q in range(2):
            for dh in range(3):
                for dw in range(3):
                    du, r = divmod(p + dh - 1, 2)
                    dv, s = divmod(q + dw - 1, 2)
                    for c in range(c_in):
                        tu.append(du + 1)
                        tv.append(dv + 1)
                        tc.append((r * 2 + s) * c_in + c)
                        tp.append(p * 2 + q)
                        sh.append(dh)
                        sw.append(dw)
                        sc.append(c)
    idx = tuple(np.asarray(a) for a in (tu, tv, tc, tp))
    src = kernel[np.asarray(sh), np.asarray(sw), np.asarray(sc), :]  # (N, F)
    w2 = jnp.zeros((3, 3, 4 * c_in, 4, f), kernel.dtype).at[idx].set(src)
    return w2.reshape(3, 3, 4 * c_in, 4 * f)


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (r, s, c)."""
    b, h, w, c = x.shape
    return (
        x.reshape(b, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, w // 2, 4 * c)
    )


def _kernel_body(x_ref, w_ref, scale_ref, bias_ref, out_ref, *, chunk: int,
                 w2: int, c4: int, f: int, slope: float):
    """One (batch, row-chunk) program: im2col -> MXU -> epilogue -> write.

    The x block is the whole padded image of this batch element (the row
    grid index maps to the same block, so it is fetched once per batch and
    reused across row programs); the out block is just this program's
    ``chunk`` pooled rows, keeping VMEM footprint small.
    """
    a0 = pl.program_id(1) * chunk
    # x_ref is channel-FIRST (1, 4C, H2+2, W2+2): a trailing 4C channel dim
    # would be padded to the 128-lane width in VMEM (16x waste); as a leading
    # dim the (rows, cols) planes tile natively.
    #
    # Dynamic sublane slices must be 8-aligned on TPU, but the conv taps need
    # rows a0+dh for dh in {0,1,2}. So: one aligned 2*chunk-row load per
    # channel, then STATIC (dh, dw) sub-slices in registers (vector rotates,
    # no memory op). Rows past the image edge read VMEM padding and are
    # statically sliced away before use.
    planes = [x_ref[0, c, pl.ds(a0, 2 * chunk), :] for c in range(c4)]
    taps = [
        planes[c][dh : dh + chunk, dw : dw + w2]  # (chunk, w2)
        for dh in range(3)
        for dw in range(3)
        for c in range(c4)
    ]
    patches = jnp.stack(taps, axis=0).reshape(9 * c4, chunk * w2)
    z = jax.lax.dot_general(
        patches.astype(jnp.bfloat16),
        w_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),  # contract the tap dim
        preferred_element_type=jnp.float32,
    )  # (chunk * w2, 4F)
    z = z * scale_ref[:] + bias_ref[:]
    z = jnp.where(z >= 0, z, slope * z)
    z = z.reshape(chunk, w2, 4, f)
    out_ref[0, :, :, :] = jnp.max(z, axis=2).astype(out_ref.dtype)


def fused_input_block(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    slope: float = 0.01,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused conv3x3(SAME) -> (*scale + bias) -> LeakyReLU -> maxpool2x2.

    x: (B, H, W, C) with C small (1, 2, 4); H, W even, H/2 % 4 == 0.
    kernel: (3, 3, C, F) canonical conv weights (converter layout).
    scale, bias: (F,) eval-mode folded affine (see module docstring).
    -> (B, H/2, W/2, F) in ``out_dtype``.
    """
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    h2, w2 = h // 2, w // 2
    chunk = 8 if h2 % 8 == 0 else (4 if h2 % 4 == 0 else 1)

    xs = space_to_depth(x)
    # rows: 1 halo on top, and enough bottom padding (chunk - 1) that the
    # last chunk's aligned 2*chunk-row load stays in bounds (see kernel body)
    xs = jnp.pad(xs, ((0, 0), (1, chunk - 1), (1, 1), (0, 0)))
    xs = jnp.transpose(xs, (0, 3, 1, 2))  # channel-first (see kernel body)
    w2k = build_phase_kernel(kernel).reshape(9 * 4 * c, 4 * f)
    scale4 = jnp.tile(scale, 4).reshape(1, 4 * f).astype(jnp.float32)
    bias4 = jnp.tile(bias, 4).reshape(1, 4 * f).astype(jnp.float32)

    body = functools.partial(
        _kernel_body, chunk=chunk, w2=w2, c4=4 * c, f=f, slope=slope
    )
    return pl.pallas_call(
        body,
        grid=(b, h2 // chunk),
        in_specs=[
            pl.BlockSpec(
                (1, 4 * c, h2 + chunk, w2 + 2),
                lambda i, j: (i, 0, 0, 0),  # same block across the row grid
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, chunk, w2, f), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2, f), out_dtype),
        interpret=interpret,
    )(xs, w2k, scale4, bias4)


def fold_bn_affine(conv_bias, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Fold eval-mode BatchNorm (+ the conv bias) into (scale, bias)."""
    scale = bn_scale * jax.lax.rsqrt(bn_var + eps)
    bias = (conv_bias - bn_mean) * scale + bn_bias
    return scale, bias

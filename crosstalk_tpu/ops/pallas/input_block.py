"""Pallas TPU kernel: fused input ConvBlock (conv3x3 + folded-BN affine +
LeakyReLU + maxpool 2x2) for few-channel inputs.

Why this kernel exists. The models' first block convolves a 1-2 channel
image (reference regression_model.py:14-17 / two_branch_regression.py:10-13).
On TPU this layer is pathological for XLA: the input channel dim is padded to
the 128-lane register width and the pre-pool activation (16 MB/image at the
flagship config) is materialized to HBM and read back by the pool — measured
49.7 us/image, ~22% of the whole model's inference time for ~1% of its FLOPs
(v5e, hoist-proof measurement; see PERF_NOTES.md).

Design (v2 — the v1 all-in-kernel design lost to Mosaic relayout costs):

  1. space-to-depth (XLA): the (H, W, C) image becomes (H/2, W/2, 4C); the
     2x2 maxpool windows align exactly with the four s2d phases, so
     pool(conv3x3(x)) == max over 4 phase-convs of the s2d image. The four
     phase kernels assemble into ONE (3, 3, 4C, 4F) kernel (zero-structured).
  2. im2col (XLA): `conv_general_dilated_patches` builds the (B, H/2 * W/2,
     9*4C) patch matrix in HBM — XLA moves data at bandwidth; hand-built
     in-kernel patch assembly paid 3-10x in Mosaic relayouts.
  3. Pallas GEMM + epilogue: one natural-orientation MXU matmul per
     pixel-chunk, phase-max over aligned lane blocks (NO reshape — a
     (M, 4, F) reshape forces a full-tensor relayout), + bias + LeakyReLU.
     The BN scale is folded into the GEMM weights (exact: max commutes with
     the per-channel bias and the monotone LeakyReLU once the scale lives
     inside the matmul), so only the pooled (M, F) output sees the epilogue.

Net effect: the 16 MB pre-pool intermediate never exists; the only large
HBM traffic is the 2.4 MB patch matrix and the 4 MB pooled output.
Measured: 42 us/image vs XLA's 49.7 at the flagship config.

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


def _patches_row_perm(c4: int) -> np.ndarray:
    """conv_general_dilated_patches orders the patch features channel-major
    (c, dh, dw); build_phase_kernel's rows are (dh, dw, c). Map q -> r."""
    perm = np.empty(9 * c4, np.int64)
    for q in range(9 * c4):
        c, rem = divmod(q, 9)
        dh, dw = divmod(rem, 3)
        perm[q] = (dh * 3 + dw) * c4 + c
    return perm


def _gemm_max_body(p_ref, w_ref, b_ref, o_ref, *, f: int, slope: float):
    """One pixel-chunk: natural-orientation MXU GEMM over the phase-stacked
    weights, max over the 4 aligned F-wide lane blocks, bias + LeakyReLU."""
    z = jnp.dot(p_ref[0], w_ref[:], preferred_element_type=jnp.float32)
    m = jnp.maximum(
        jnp.maximum(z[:, 0 * f : 1 * f], z[:, 1 * f : 2 * f]),
        jnp.maximum(z[:, 2 * f : 3 * f], z[:, 3 * f : 4 * f]),
    )
    y = m + b_ref[0]
    o_ref[0, :, :] = jnp.where(y >= 0, y, slope * y).astype(o_ref.dtype)


def select_chunk(m: int) -> int:
    """Pixel-chunk size the kernel will tile the m = (H/2)*(W/2) dim with.

    Callers gating the Pallas path (eval/fast_forward.py) must also check
    ``select_chunk(m) % 16 == 0`` — the chunk is the bf16 sublane dim of the
    patch/output blocks, and Mosaic needs it 16-aligned; an unaligned m with
    no candidate divisor (e.g. 90px tiles, m=2025) falls back to XLA.
    """
    for cand in (4096, 2048, 1024, 512, 256):
        if m % cand == 0:
            return min(cand, m)
    return m


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

    x: (B, H, W, C) with C small (1, 2, 4); H, W even.
    kernel: (3, 3, C, F) canonical conv weights (converter layout); F must
    be a multiple of 128 (lane-aligned phase blocks).
    scale, bias: (F,) eval-mode folded BatchNorm affine
    (scale = gamma * rsqrt(var + eps); bias = (conv_bias - mean)*scale + beta).
    -> (B, H/2, W/2, F) in ``out_dtype``.
    """
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    h2, w2 = h // 2, w // 2
    m = h2 * w2

    xs = space_to_depth(x)
    patches = jax.lax.conv_general_dilated_patches(
        xs.astype(jnp.bfloat16),
        (3, 3),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, m, 9 * 4 * c)

    perm = jnp.asarray(_patches_row_perm(4 * c))
    w2k = build_phase_kernel(kernel).reshape(9 * 4 * c, 4 * f)[perm]
    w2k = (w2k * jnp.tile(scale, 4)[None, :]).astype(jnp.bfloat16)
    bias1 = bias.reshape(1, f).astype(jnp.float32)

    chunk = select_chunk(m)

    body = functools.partial(_gemm_max_body, f=f, slope=slope)
    out = pl.pallas_call(
        body,
        grid=(b, m // chunk),
        in_specs=[
            pl.BlockSpec(
                (1, chunk, 9 * 4 * c), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, chunk, f), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, f), out_dtype),
        interpret=interpret,
    )(patches, w2k, bias1)
    return out.reshape(b, h2, w2, f)


def fold_bn_affine(conv_bias, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-5):
    """Fold eval-mode BatchNorm (+ the conv bias) into (scale, bias)."""
    scale = bn_scale * jax.lax.rsqrt(bn_var + eps)
    bias = (conv_bias - bn_mean) * scale + bn_bias
    return scale, bias

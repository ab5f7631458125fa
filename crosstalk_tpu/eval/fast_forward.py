"""Fast inference path: hand-scheduled eval-mode forward.

Serving doesn't need flax module machinery or training-mode branches — in
eval mode every ConvBlock is conv -> per-channel affine (the folded
BatchNorm running stats) -> LeakyReLU -> maxpool, and the head is matmuls
with the same folds (dropout inactive). This module compiles that directly
from a model's ``variables`` tree:

  * the first block (1-2 input channels) runs through the Pallas fused
    kernel (ops/pallas/input_block.py) — one HBM pass instead of three; the
    two-branch model's pair of C=1 first blocks (each too narrow for the
    128-lane constraint) fuse into ONE block-diagonal kernel call
    (measured +8.2% end-to-end, ``_double_fused_input``);
  * remaining blocks run as XLA convs in bfloat16 with the affine+relu
    epilogue fused by XLA;
  * dense head in bfloat16 with f32 accumulation.

Produces the same predictions as ``model.apply(variables, x, train=False)``
in bf16 mode (tests compare both); the f32 parity path stays on the flax
model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crosstalk_tpu.config import ModelConfig
from crosstalk_tpu.ops.pallas.input_block import (
    fold_bn_affine,
    fused_input_block,
    select_chunk,
)

_BF16 = jnp.bfloat16


def _block_affine(block_params, block_stats, eps):
    conv = block_params["Conv_0"]
    bn = block_params["BatchNorm_0"]
    st = block_stats["BatchNorm_0"]
    scale, bias = fold_bn_affine(
        conv["bias"], bn["scale"], bn["bias"], st["mean"], st["var"], eps
    )
    return conv["kernel"], scale, bias


def _conv_block_eval(x, kernel, scale, bias, slope):
    y = jax.lax.conv_general_dilated(
        x.astype(_BF16),
        kernel.astype(_BF16),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y * scale.astype(_BF16) + bias.astype(_BF16)
    y = jnp.where(y >= 0, y, jnp.asarray(slope, _BF16) * y)
    return jax.lax.reduce_window(
        y,
        jnp.asarray(-jnp.inf, _BF16),
        jax.lax.max,
        (1, 2, 2, 1),
        (1, 2, 2, 1),
        "VALID",
    )


def _dense_bn_eval(x, block_params, block_stats, eps, slope):
    dense = block_params["Dense_0"]
    bn = block_params["BatchNorm_0"]
    st = block_stats["BatchNorm_0"]
    scale, bias = fold_bn_affine(
        dense["bias"], bn["scale"], bn["bias"], st["mean"], st["var"], eps
    )
    y = (
        jnp.dot(
            x.astype(_BF16),
            dense["kernel"].astype(_BF16),
            preferred_element_type=jnp.float32,
        )
        * scale
        + bias
    )
    return jnp.where(y >= 0, y, slope * y)


def _pallas_gate(x, f_total: int, use_pallas: bool) -> bool:
    """Route the first block through the fused Pallas kernel only when its
    shapes satisfy Mosaic's constraints; everything else falls back to XLA."""
    m = (x.shape[1] // 2) * (x.shape[2] // 2)
    return (
        use_pallas
        and x.shape[-1] <= 4
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
        and f_total % 128 == 0  # Mosaic lane-width constraint
        # the resolved pixel chunk is the bf16 sublane dim of the
        # kernel's blocks: it must be 16-aligned and VMEM-sized, else
        # fall back to the XLA block (e.g. 90px tiles -> m=2025)
        and select_chunk(m) % 16 == 0
        and select_chunk(m) <= 4096
    )


def _branch_eval(x, params, stats, eps, slope, use_pallas, interpret,
                 start: int = 0):
    """Run a branch's conv blocks from ``start`` (start=1 when block 0 was
    already computed by the fused two-branch input block below)."""
    n = 0
    while f"ConvBlock_{n}" in params:
        n += 1
    for i in range(start, n):
        kernel, scale, bias = _block_affine(
            params[f"ConvBlock_{i}"], stats[f"ConvBlock_{i}"], eps
        )
        if i == 0 and _pallas_gate(x, kernel.shape[-1], use_pallas):
            x = fused_input_block(
                x, kernel, scale, bias, slope=slope, interpret=interpret
            )
        else:
            x = _conv_block_eval(x, kernel, scale, bias, slope)
    return x


def _double_fused_input(x, params, stats, eps, slope, interpret):
    """Both branches' first blocks (each C=1 -> F, too narrow for the Pallas
    lane constraint alone) as ONE block-diagonal fused input-block call.

    Stacked, they are exactly the flagship single-branch kernel shape
    (C=2, F_total = 2F): k[:, :, 0, :F] holds the bleed kernel and
    k[:, :, 1, F:] the source kernel (zeros elsewhere), so the one GEMM
    computes both branches and the branch outputs are lane slices of the
    fused output. Measured: two-branch serving 173.9 -> 160.7 us/img
    (+8.2%), predictions within 5e-6 (tools/two_branch_input_probe.py).

    -> (bleed_out, source_out), each (B, H/2, W/2, F).
    """
    kb, sb, bb = _block_affine(
        params["bleed_branch"]["ConvBlock_0"],
        stats["bleed_branch"]["ConvBlock_0"], eps,
    )
    ks, ss, bs = _block_affine(
        params["source_branch"]["ConvBlock_0"],
        stats["source_branch"]["ConvBlock_0"], eps,
    )
    f = kb.shape[-1]
    kf = (
        jnp.zeros((3, 3, 2, 2 * f), kb.dtype)
        .at[:, :, 0:1, :f].set(kb)
        .at[:, :, 1:2, f:].set(ks)
    )
    z = fused_input_block(
        x, kf, jnp.concatenate([sb, ss]), jnp.concatenate([bb, bs]),
        slope=slope, interpret=interpret,
    )
    return z[..., :f], z[..., f:]


def make_fast_forward(
    cfg: ModelConfig,
    use_pallas: bool = True,
    interpret: bool = False,
):
    """-> jittable fn(variables, batch_nhwc) -> (B, 1) float32 predictions.

    ``use_pallas`` routes the few-channel input block through the fused
    im2col-GEMM-max kernel (measured 42 vs 49.7 us/img for XLA at the
    flagship config; see PERF_NOTES.md). ``interpret=True`` runs it in
    interpreter mode (CPU tests); on TPU leave it False.
    """
    eps = cfg.bn_eps
    slope = cfg.leaky_slope
    variant = cfg.variant

    def forward(variables, x):
        params = variables["params"]
        stats = variables["batch_stats"]
        if variant == "double":
            kb0 = params["bleed_branch"]["ConvBlock_0"]["Conv_0"]["kernel"]
            ks0 = params["source_branch"]["ConvBlock_0"]["Conv_0"]["kernel"]
            fuse_ok = (
                kb0.shape == ks0.shape
                and kb0.shape[2] == 1  # each branch reads one channel
                and _pallas_gate(x, 2 * kb0.shape[-1], use_pallas)
            )
            if fuse_ok:
                bleed, source = _double_fused_input(
                    x, params, stats, eps, slope, interpret
                )
                start = 1
            else:
                bleed, source = x[..., 0:1], x[..., 1:2]
                start = 0
            bleed = _branch_eval(
                bleed, params["bleed_branch"], stats["bleed_branch"],
                eps, slope, use_pallas, interpret, start=start,
            )
            source = _branch_eval(
                source, params["source_branch"], stats["source_branch"],
                eps, slope, use_pallas, interpret, start=start,
            )
            h = jnp.concatenate([bleed, source], axis=-1)
        else:
            h = _branch_eval(x, params, stats, eps, slope, use_pallas, interpret)
        h = h.reshape(h.shape[0], -1)
        h = _dense_bn_eval(h, params["DenseBNBlock_0"], stats["DenseBNBlock_0"], eps, slope)
        h = _dense_bn_eval(h, params["DenseBNBlock_1"], stats["DenseBNBlock_1"], eps, slope)
        out = params["Dense_0"]
        h = (
            jnp.dot(
                h.astype(_BF16),
                out["kernel"].astype(_BF16),
                preferred_element_type=jnp.float32,
            )
            + out["bias"]
        )
        if variant == "double":
            h = jax.nn.sigmoid(h) * 0.5
        return h.astype(jnp.float32)

    return forward

"""Opt-in int8 serving tier: post-training-quantized eval forward.

The v5e MXU runs int8xint8->int32 convolutions 1.32-1.47x faster than bf16
at this model's hot-block shapes (measured, ``tools/int8_probe.py`` +
PERF_NOTES "int8 serving"), so a quantized tier buys real throughput on a
FLOPs-bound serving path. Quantization error is far outside the <=1e-4 MAE
parity budget the default paths honor, so — like the f16 wire — this tier
is strictly opt-in, with its measured deviation published in the DEPLOY.md
parity map.

Scheme (standard symmetric post-training quantization, v2 calibration):

  * weights: per-output-channel symmetric int8, quantized in-graph from the
    served f32 ``variables`` (no second checkpoint format; the requant cost
    is <2% of a forward at serving batch sizes);
  * activations: per-tensor symmetric int8 with static calibration
    (``calibrate_int8`` runs one representative batch through the bf16 path
    and records a clip at every quantize point). v2 default is an
    **MSE-optimal clip** — per tensor, the clip minimizing the quantization
    MSE over a swept fraction of the batch absmax — which beats raw absmax
    whenever the activation distribution is heavy-tailed (one outlier pixel
    no longer inflates the whole tensor's quantum). ``method="absmax"``
    reproduces the v1 scheme;
  * each conv computes in int8 with an int32 accumulator; the
    dequantization constant folds into the already-folded BatchNorm affine,
    so the epilogue (scale, bias, LeakyReLU, maxpool) costs exactly what
    the bf16 path's does;
  * the first conv block (1-2 input channels, ~0.1% of FLOPs) stays on the
    bf16/Pallas path of ``fast_forward``; the final 128->1 dense stays f32.
    v2 also keeps the two FC+BN head blocks in bf16 by default
    (``int8_dense=False``): they are <0.1% of the model's FLOPs — no
    measurable throughput — while their flattened 8192-dim input mixes
    activation scales from every spatial position, exactly where per-tensor
    int8 loses the most accuracy. Calibrations carrying ``dense_*`` scales
    (``int8_dense=True``, and every pre-v2 exported artifact) still run the
    dense blocks in int8, so old ``.ctkx`` artifacts serve unchanged.

Same prediction contract as ``make_fast_forward``: fn(variables, x_nhwc)
-> (B, 1) float32 alphas (reference models regression_model.py:58-61,
two_branch_regression.py:85-100).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from crosstalk_tpu.config import ModelConfig
from crosstalk_tpu.eval.fast_forward import (
    _block_affine,
    _conv_block_eval,
    _dense_bn_eval,
    _double_fused_input,
    _pallas_gate,
)
from crosstalk_tpu.ops.pallas.input_block import fold_bn_affine, fused_input_block

_BF16 = jnp.bfloat16


def _quant_weight(k):
    """Per-output-channel symmetric int8. k: (..., C_out) f32 ->
    (k_q int8, sw f32 (C_out,)) with k ~= k_q * sw."""
    absmax = jnp.max(jnp.abs(k.astype(jnp.float32)), axis=tuple(range(k.ndim - 1)))
    sw = jnp.maximum(absmax, 1e-12) / 127.0
    kq = jnp.clip(jnp.round(k.astype(jnp.float32) / sw), -127, 127).astype(jnp.int8)
    return kq, sw


# clip-search grid for method="mse": fractions of the batch absmax. 1.0 is
# always a candidate so the MSE scheme can never do worse than absmax on the
# calibration batch itself.
_MSE_CLIP_RATIOS = (1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.45, 0.4, 0.35, 0.3, 0.25, 0.2)


def _mse_clip(h):
    """MSE-optimal symmetric int8 clip for tensor ``h``.

    Sweeps clips c = ratio * absmax(|h|) and returns the one minimizing
    mean((quant_dequant(h, c) - h)^2). Unrolled (12 fused reductions) rather
    than vmapped — a vmap would materialize a candidates-times-tensor
    intermediate on multi-hundred-MB calibration activations.
    """
    h = h.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(h))
    clips, errs = [], []
    for r in _MSE_CLIP_RATIOS:
        c = absmax * r
        s = jnp.maximum(c, 1e-12) / 127.0
        q = jnp.clip(jnp.round(h / s), -127, 127) * s
        clips.append(c)
        errs.append(jnp.mean(jnp.square(q - h)))
    return jnp.stack(clips)[jnp.argmin(jnp.stack(errs))]


def _quant_act(x, sx):
    """Per-tensor symmetric int8 against the calibrated absmax ``sx``.
    Inputs outside the calibration range saturate (standard PTQ)."""
    qs = 127.0 / jnp.maximum(sx, 1e-12)
    return jnp.clip(jnp.round(x.astype(jnp.float32) * qs), -127, 127).astype(jnp.int8)


def _conv_block_int8(x, sx, kernel, scale, bias, slope):
    """conv3x3(int8) -> folded BN affine (dequant included) -> LeakyReLU ->
    maxpool 2x2. Mirrors fast_forward._conv_block_eval's epilogue exactly."""
    kq, sw = _quant_weight(kernel)
    y = jax.lax.conv_general_dilated(
        _quant_act(x, sx),
        kq,
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    eff_scale = scale.astype(jnp.float32) * sw * (sx / 127.0)
    y = (y.astype(jnp.float32) * eff_scale + bias.astype(jnp.float32)).astype(_BF16)
    y = jnp.where(y >= 0, y, jnp.asarray(slope, _BF16) * y)
    return jax.lax.reduce_window(
        y,
        jnp.asarray(-jnp.inf, _BF16),
        jax.lax.max,
        (1, 2, 2, 1),
        (1, 2, 2, 1),
        "VALID",
    )


def _dense_bn_int8(x, sx, block_params, block_stats, eps, slope):
    dense = block_params["Dense_0"]
    bn = block_params["BatchNorm_0"]
    st = block_stats["BatchNorm_0"]
    scale, bias = fold_bn_affine(
        dense["bias"], bn["scale"], bn["bias"], st["mean"], st["var"], eps
    )
    kq, sw = _quant_weight(dense["kernel"])
    y = jax.lax.dot_general(
        _quant_act(x, sx),
        kq,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (scale * sw * (sx / 127.0)) + bias
    return jnp.where(y >= 0, y, slope * y)


def _branch_int8(x, params, stats, scales, prefix, eps, slope):
    """Conv blocks 1..n-1 of one branch in int8 (block 0 is handled by the
    caller on the bf16/Pallas path)."""
    n = 0
    while f"ConvBlock_{n}" in params:
        n += 1
    for i in range(1, n):
        kernel, scale, bias = _block_affine(
            params[f"ConvBlock_{i}"], stats[f"ConvBlock_{i}"], eps
        )
        x = _conv_block_int8(x, scales[f"{prefix}{i}"], kernel, scale, bias, slope)
    return x


def _first_blocks(variant, variables, x, eps, slope, use_pallas, interpret):
    """Block 0 on the default bf16/Pallas path -> activations entering the
    quantized region. For 'double' returns the concatenation input halves."""
    params = variables["params"]
    stats = variables["batch_stats"]
    if variant == "double":
        kb0 = params["bleed_branch"]["ConvBlock_0"]["Conv_0"]["kernel"]
        ks0 = params["source_branch"]["ConvBlock_0"]["Conv_0"]["kernel"]
        if (
            kb0.shape == ks0.shape
            and kb0.shape[2] == 1
            and _pallas_gate(x, 2 * kb0.shape[-1], use_pallas)
        ):
            return _double_fused_input(x, params, stats, eps, slope, interpret)
        outs = []
        for ch, branch in ((0, "bleed_branch"), (1, "source_branch")):
            kernel, scale, bias = _block_affine(
                params[branch]["ConvBlock_0"], stats[branch]["ConvBlock_0"], eps
            )
            outs.append(
                _conv_block_eval(x[..., ch : ch + 1], kernel, scale, bias, slope)
            )
        return tuple(outs)
    kernel, scale, bias = _block_affine(
        params["ConvBlock_0"], stats["ConvBlock_0"], eps
    )
    if _pallas_gate(x, kernel.shape[-1], use_pallas):
        return fused_input_block(
            x, kernel, scale, bias, slope=slope, interpret=interpret
        )
    return _conv_block_eval(x, kernel, scale, bias, slope)


def load_calibration_tiles(mixed_dir: str, source_dir: str,
                           image_size: int, max_tiles: int = 256,
                           jobs: int = 4):
    """Pair, decode, and normalize up to ``max_tiles`` tile pairs for
    activation-range calibration — the shared loader behind the serve CLI's
    ``--calibration_*`` flags and the export tool's ``--quantize int8``.

    -> (n, image_size, image_size, 2) f32 normalized array. Raises
    ValueError (pairing / decode / shape problems) or FileNotFoundError.
    """
    import numpy as np

    from crosstalk_tpu.data.index import pair_unlabeled
    from crosstalk_tpu.data.pipeline import load_tiles
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc

    index = pair_unlabeled(mixed_dir, source_dir)
    samples = index.samples[:max_tiles]
    tiles = load_tiles(samples, jobs=jobs)
    n, h, w, _ = tiles.shape
    if h != image_size or w != image_size:
        raise ValueError(
            f"calibration tiles are {h}x{w} but the serving tile size is "
            f"{image_size}px — calibrate on tiles of the serving shape "
            "(grid large acquisitions with cli/predict first)")
    return np.asarray(normalize_batch_nhwc(tiles))


def calibrate_int8(
    cfg: ModelConfig,
    variables,
    batch,
    use_pallas: bool = True,
    interpret: bool = False,
    method: str = "mse",
    int8_dense: bool = False,
):
    """Run one representative batch through the bf16 serving path and record
    an activation clip at every int8 quantize point.

    -> dict[str, float] of scales, the ``scales`` argument of
    ``make_int8_forward``. Calibrate on data drawn from the serving
    distribution (e.g. a few hundred normalized tiles); inputs beyond the
    calibrated clip saturate at inference time.

    ``method``: "mse" (v2 default, MSE-optimal clip per tensor — see
    ``_mse_clip``) or "absmax" (v1, the raw batch absmax).
    ``int8_dense``: also record clips for the two FC+BN head blocks so
    ``make_int8_forward`` runs them in int8 (v1 behavior; v2 keeps the head
    in bf16 — it is ~0.1% of FLOPs and the dominant quantization-error
    source on trained checkpoints).
    """
    eps, slope, variant = cfg.bn_eps, cfg.leaky_slope, cfg.variant
    if method not in ("mse", "absmax"):
        raise ValueError(f"unknown calibration method {method!r}")
    clip_fn = _mse_clip if method == "mse" else (
        lambda h: jnp.max(jnp.abs(h.astype(jnp.float32))))

    def run(variables, x):
        params = variables["params"]
        stats = variables["batch_stats"]
        scales: dict[str, jax.Array] = {}

        def record(name, h):
            scales[name] = clip_fn(h)
            return h

        if variant == "double":
            bleed, source = _first_blocks(
                variant, variables, x, eps, slope, use_pallas, interpret
            )
            for prefix, h, branch in (
                ("bleed_", bleed, "bleed_branch"),
                ("source_", source, "source_branch"),
            ):
                n = 1
                while f"ConvBlock_{n}" in params[branch]:
                    kernel, scale, bias = _block_affine(
                        params[branch][f"ConvBlock_{n}"],
                        stats[branch][f"ConvBlock_{n}"],
                        eps,
                    )
                    record(f"{prefix}{n}", h)
                    h = _conv_block_eval(h, kernel, scale, bias, slope)
                    n += 1
                if prefix == "bleed_":
                    bleed = h
                else:
                    source = h
            h = jnp.concatenate([bleed, source], axis=-1)
        else:
            h = _first_blocks(variant, variables, x, eps, slope, use_pallas, interpret)
            n = 1
            while f"ConvBlock_{n}" in params:
                kernel, scale, bias = _block_affine(
                    params[f"ConvBlock_{n}"], stats[f"ConvBlock_{n}"], eps
                )
                record(f"conv_{n}", h)
                h = _conv_block_eval(h, kernel, scale, bias, slope)
                n += 1
        h = h.reshape(h.shape[0], -1)
        if int8_dense:
            for i in (0, 1):
                record(f"dense_{i}", h)
                h = _dense_bn_eval(
                    h, params[f"DenseBNBlock_{i}"], stats[f"DenseBNBlock_{i}"],
                    eps, slope
                )
        return scales

    # one compiled program: eager dispatch of each op through a remote
    # relay (the axon serving environment) costs ~100 ms/op and makes an
    # eager calibration pass minutes-slow
    scales = jax.jit(run)(variables, jnp.asarray(batch))
    return {k: float(v) for k, v in scales.items()}


def make_int8_forward(
    cfg: ModelConfig,
    scales: dict[str, float],
    use_pallas: bool = True,
    interpret: bool = False,
):
    """-> jittable fn(variables, batch_nhwc) -> (B, 1) float32 predictions,
    with every conv after block 0 computed on the int8 MXU path. The two
    FC+BN head blocks run in int8 only when ``scales`` carries their
    ``dense_*`` clips (``calibrate_int8(int8_dense=True)`` / pre-v2
    artifacts); otherwise they ride the bf16 path — same throughput,
    materially lower error.

    ``scales`` comes from ``calibrate_int8`` (must match the model variant/depth:
    missing conv keys raise KeyError at trace time). Accuracy is NOT within
    the 1e-4 parity budget — see DEPLOY.md's parity map for the measured
    deviation before choosing this tier.
    """
    eps, slope, variant = cfg.bn_eps, cfg.leaky_slope, cfg.variant

    def forward(variables, x):
        params = variables["params"]
        stats = variables["batch_stats"]
        if variant == "double":
            bleed, source = _first_blocks(
                variant, variables, x, eps, slope, use_pallas, interpret
            )
            bleed = _branch_int8(
                bleed, params["bleed_branch"], stats["bleed_branch"],
                scales, "bleed_", eps, slope,
            )
            source = _branch_int8(
                source, params["source_branch"], stats["source_branch"],
                scales, "source_", eps, slope,
            )
            h = jnp.concatenate([bleed, source], axis=-1)
        else:
            h0 = _first_blocks(
                variant, variables, x, eps, slope, use_pallas, interpret
            )
            h = _branch_int8(h0, params, stats, scales, "conv_", eps, slope)
        h = h.reshape(h.shape[0], -1)
        # dense head tier follows the calibration: v2 calibrations omit the
        # dense_* clips (bf16 head); v1/int8_dense calibrations — including
        # every pre-v2 exported .ctkx artifact — carry them and keep the
        # original int8 dense path
        for i in (0, 1):
            if f"dense_{i}" in scales:
                h = _dense_bn_int8(
                    h, scales[f"dense_{i}"],
                    params[f"DenseBNBlock_{i}"], stats[f"DenseBNBlock_{i}"],
                    eps, slope,
                )
            else:
                h = _dense_bn_eval(
                    h, params[f"DenseBNBlock_{i}"], stats[f"DenseBNBlock_{i}"],
                    eps, slope,
                )
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

"""PyTorch ``.pth`` <-> Flax weight conversion.

The reference ships (and its README documents) PyTorch ``state_dict``
checkpoints (torch.save at train_model.py:460,647; torch.load at
train_model.py:671 and test-cross-talk-model.py:320). This module makes those
checkpoints first-class citizens of the TPU framework, in both directions:

  * ``torch_to_flax``: load a reference-trained .pth into our Flax models for
    evaluation / fine-tuning (the <=1e-4 MAE parity path, SURVEY.md §7 step 3);
  * ``flax_to_torch``: export our TPU-trained weights as a .pth the reference's
    own eval script can consume — the run-dir artifact contract keeps naming
    ``best_model_{type}.pth`` etc., and the files really are torch-loadable.

Layout mapping (the three transposes that make or break parity —
SURVEY.md §2 "PyTorch semantics that matter"):

  1. Conv kernels: torch OIHW -> flax HWIO (transpose 2,3,1,0).
  2. BatchNorm: weight->scale, bias->bias, running_mean->mean,
     running_var->var (torch stores the unbiased running variance; our
     BatchNorm accumulates the same — see models/layers.py).
  3. The first dense layer after the flatten: torch flattens NCHW as
     (C, H, W); we flatten NHWC as (H, W, C). The torch kernel
     (out, C*H*W) is reshaped to (out, C, H, W), transposed to
     (H, W, C, out), and reshaped to (H*W*C, out). Other dense kernels
     are a plain transpose.

torch state_dict key schema (derived from the reference module trees):
  single: conv_layers.{4k}.{weight,bias}  (Conv2d, k-th block)
          conv_layers.{4k+1}.{weight,bias,running_mean,running_var}  (BN2d)
          fc_layers.{1,5,9}.{weight,bias}  (Linear)  fc_layers.{2,6}.*  (BN1d)
  double: {bleed,source}_branch.conv_blocks.{4k}/{4k+1}.*  (4 blocks each)
          regression_head.fc_layers.{1,2,5,6,9}.*
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np


def _conv_w(t: np.ndarray) -> np.ndarray:
    return np.transpose(t, (2, 3, 1, 0))  # OIHW -> HWIO


def _conv_w_inv(k: np.ndarray) -> np.ndarray:
    return np.transpose(k, (3, 2, 0, 1))  # HWIO -> OIHW


def _first_dense_w(t: np.ndarray, channels: int) -> np.ndarray:
    """(out, C*H*W) torch kernel -> (H*W*C, out) flax kernel.

    The feature map is assumed SQUARE (H == W == isqrt(flat/C)) — true for
    every config this framework or the reference instantiates (square
    image_size throughout; reference train_model.py:534-537). A checkpoint
    from a rectangular-tile training run whose H*W happens to be a perfect
    square would reshape with the wrong dims here and scramble silently —
    the state_dict alone cannot disambiguate, so don't feed rectangular
    checkpoints through this converter."""
    out, flat = t.shape
    hw = flat // channels
    side = int(math.isqrt(hw))
    if side * side != hw:
        raise ValueError(f"non-square flatten: {flat} / {channels} channels")
    return (
        t.reshape(out, channels, side, side)
        .transpose(2, 3, 1, 0)
        .reshape(flat, out)
    )


def _first_dense_w_inv(k: np.ndarray, channels: int) -> np.ndarray:
    """Inverse of ``_first_dense_w`` (same square-feature-map assumption)."""
    flat, out = k.shape
    hw = flat // channels
    side = int(math.isqrt(hw))
    if side * side != hw:
        raise ValueError(f"non-square flatten: {flat} / {channels} channels")
    return (
        k.reshape(side, side, channels, out)
        .transpose(3, 2, 0, 1)
        .reshape(out, flat)
    )


def _dense_w(t: np.ndarray) -> np.ndarray:
    return t.T


def _structure(variant: str) -> Tuple[list, str]:
    """-> ([(torch_conv_prefix, flax_branch_path)], torch_head_prefix)."""
    if variant == "single":
        return [("conv_layers", ())], "fc_layers"
    if variant == "double":
        return (
            [
                ("bleed_branch.conv_blocks", ("bleed_branch",)),
                ("source_branch.conv_blocks", ("source_branch",)),
            ],
            "regression_head.fc_layers",
        )
    raise ValueError(f"unknown variant {variant!r}")


def _count_torch_blocks(sd: dict, prefix: str) -> int:
    """Blocks = Conv2d modules at Sequential indices 0, 4, 8, ..."""
    n = 0
    while f"{prefix}.{4 * n}.weight" in sd:
        n += 1
    if n == 0:
        raise KeyError(f"no conv blocks found under {prefix!r}")
    return n


def _count_flax_blocks(tree: dict) -> int:
    n = 0
    while f"ConvBlock_{n}" in tree:
        n += 1
    if n == 0:
        raise KeyError("no ConvBlock_* entries in params tree")
    return n


def _set(tree: dict, path: tuple, value) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def torch_to_flax(state_dict: Dict[str, np.ndarray], variant: str) -> dict:
    """torch state_dict (tensors or ndarrays) -> flax variables
    {'params': ..., 'batch_stats': ...}."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)()) for k, v in state_dict.items()}
    branches, head = _structure(variant)
    params: dict = {}
    stats: dict = {}

    flat_channels = 0
    for torch_prefix, flax_branch in branches:
        n_blocks = _count_torch_blocks(sd, torch_prefix)
        for b in range(n_blocks):
            conv, bn = f"{torch_prefix}.{4 * b}", f"{torch_prefix}.{4 * b + 1}"
            block = flax_branch + (f"ConvBlock_{b}",)
            _set(params, block + ("Conv_0", "kernel"), _conv_w(sd[f"{conv}.weight"]))
            _set(params, block + ("Conv_0", "bias"), sd[f"{conv}.bias"])
            _set(params, block + ("BatchNorm_0", "scale"), sd[f"{bn}.weight"])
            _set(params, block + ("BatchNorm_0", "bias"), sd[f"{bn}.bias"])
            _set(stats, block + ("BatchNorm_0", "mean"), sd[f"{bn}.running_mean"])
            _set(stats, block + ("BatchNorm_0", "var"), sd[f"{bn}.running_var"])
            if b == n_blocks - 1:
                flat_channels += sd[f"{conv}.weight"].shape[0]

    # Head: torch Sequential indices (1 Linear)(2 BN)(5 Linear)(6 BN)(9 Linear).
    for i, (lin, bn) in enumerate([(1, 2), (5, 6)]):
        block = (f"DenseBNBlock_{i}",)
        w = sd[f"{head}.{lin}.weight"]
        kernel = _first_dense_w(w, flat_channels) if i == 0 else _dense_w(w)
        _set(params, block + ("Dense_0", "kernel"), kernel)
        _set(params, block + ("Dense_0", "bias"), sd[f"{head}.{lin}.bias"])
        _set(params, block + ("BatchNorm_0", "scale"), sd[f"{head}.{bn}.weight"])
        _set(params, block + ("BatchNorm_0", "bias"), sd[f"{head}.{bn}.bias"])
        _set(stats, block + ("BatchNorm_0", "mean"), sd[f"{head}.{bn}.running_mean"])
        _set(stats, block + ("BatchNorm_0", "var"), sd[f"{head}.{bn}.running_var"])

    _set(params, ("Dense_0", "kernel"), _dense_w(sd[f"{head}.9.weight"]))
    _set(params, ("Dense_0", "bias"), sd[f"{head}.9.bias"])

    import jax.numpy as jnp
    import jax

    as_f32 = lambda tree: jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), tree)
    return {"params": as_f32(params), "batch_stats": as_f32(stats)}


def infer_model_size(variables: dict, variant: str) -> dict:
    """Width/depth encoded in a checkpoint's parameter tree.

    -> ``{"initial_filters": w, "num_conv_blocks": n}`` for ``single``,
    ``{"initial_filters_per_branch": w}`` for ``double`` (its trunk depth
    is fixed by the architecture). The reference's instantiated configs
    (reference train_model.py:534-537) are just the defaults; any size the
    model classes accept round-trips through the converter, and this lets
    the eval/serve/export CLIs self-configure from the checkpoint."""
    params = variables["params"]
    if variant == "single":
        kernel = params["ConvBlock_0"]["Conv_0"]["kernel"]
        return {
            "initial_filters": int(np.shape(kernel)[-1]),
            "num_conv_blocks": _count_flax_blocks(params),
        }
    if variant == "double":
        kernel = params["bleed_branch"]["ConvBlock_0"]["Conv_0"]["kernel"]
        return {"initial_filters_per_branch": int(np.shape(kernel)[-1])}
    raise ValueError(f"unknown variant {variant!r}")


def checkpoint_tile_geometry(variables: dict, variant: str):
    """-> (head_spatial, pools): the post-trunk feature-map side length and
    pooling count baked into a checkpoint's head dimensions (the torch
    models size their first FC with a dummy forward — reference
    regression_model.py:52-56, two_branch_regression.py:68-80)."""
    params = variables["params"]
    dense_in = int(np.shape(params["DenseBNBlock_0"]["Dense_0"]["kernel"])[0])
    if variant == "single":
        pools = _count_flax_blocks(params)
        final_ch = int(
            np.shape(params[f"ConvBlock_{pools - 1}"]["Conv_0"]["kernel"])[-1]
        )
    elif variant == "double":
        pools = 4  # fixed trunk depth per branch
        final_ch = 2 * int(
            np.shape(
                params["bleed_branch"]["ConvBlock_3"]["Conv_0"]["kernel"]
            )[-1]
        )
    else:
        raise ValueError(f"unknown variant {variant!r}")
    if dense_in % final_ch:
        raise ValueError(
            f"checkpoint head input dim {dense_in} is not a multiple of the "
            f"final conv width {final_ch} — corrupt or mismatched checkpoint"
        )
    spatial_sq = dense_in // final_ch
    spatial = int(round(spatial_sq ** 0.5))
    if spatial * spatial != spatial_sq:
        raise ValueError(
            f"checkpoint head input dim {dense_in} implies a non-square "
            f"{spatial_sq}-pixel feature map — corrupt or mismatched checkpoint"
        )
    return spatial, pools


def image_size_compatible(variables: dict, variant: str, px: int) -> bool:
    """Whether ``px``-sized tiles feed this checkpoint's head exactly.

    Each max-pool floors odd dims (kernel 2 stride 2), so every px in
    ``[spatial*2**pools, (spatial+1)*2**pools - 1]`` pools down to the same
    head spatial — tile sizes that are not multiples of ``2**pools`` are
    valid but not uniquely recoverable from the weights."""
    spatial, pools = checkpoint_tile_geometry(variables, variant)
    x = px
    for _ in range(pools):
        x //= 2
    return x == spatial


def infer_image_size(variables: dict, variant: str) -> int:
    """Tile size a checkpoint was trained at, from its parameter tree.

    Exact whenever the size is a multiple of ``2**pools`` (all standard
    configs; the reference trains at 256). Otherwise this is the SMALLEST
    compatible size — pooling floors odd dims, so a whole range of sizes
    shares one head shape (see ``image_size_compatible``); CLIs accept an
    explicit ``--image_size`` for those."""
    spatial, pools = checkpoint_tile_geometry(variables, variant)
    return spatial * (2 ** pools)


def _compatible_px_range(variables: dict, variant: str):
    spatial, pools = checkpoint_tile_geometry(variables, variant)
    return spatial * 2 ** pools, (spatial + 1) * 2 ** pools - 1


def model_config_for_checkpoint(
    variant: str,
    variables: dict,
    *,
    initial_filters=None,
    num_conv_blocks=None,
    compute_dtype: str = "bf16",
):
    """ModelConfig sized to a loaded checkpoint.

    Size flags, when given, are validated against the checkpoint (raises
    ValueError naming both sizes on a mismatch — better than the shape
    error jit would throw later); when omitted the size is auto-detected,
    so a non-default checkpoint (``--initial_filters`` at train time,
    DIVERGENCES.md 14d) evaluates/serves/exports with no extra flags."""
    from crosstalk_tpu.config import ModelConfig

    if num_conv_blocks is not None and variant != "single":
        raise ValueError(
            "num_conv_blocks applies to the single-branch model only "
            "(the two-branch trunk is fixed at 4 blocks per branch)"
        )
    detected = infer_model_size(variables, variant)
    width_key = ("initial_filters" if variant == "single"
                 else "initial_filters_per_branch")
    if initial_filters is not None and initial_filters != detected[width_key]:
        raise ValueError(
            f"--initial_filters {initial_filters} does not match the "
            f"checkpoint (trained with {detected[width_key]})"
        )
    if num_conv_blocks is not None and variant == "single" and (
        num_conv_blocks != detected["num_conv_blocks"]
    ):
        raise ValueError(
            f"--num_conv_blocks {num_conv_blocks} does not match the "
            f"checkpoint (trained with {detected['num_conv_blocks']})"
        )
    return ModelConfig(variant=variant, compute_dtype=compute_dtype,
                       **detected)


def _get(tree: dict, path: tuple):
    node = tree
    for key in path:
        node = node[key]
    return np.asarray(node)


def flax_to_torch(variables: dict, variant: str) -> Dict[str, np.ndarray]:
    """flax variables -> a torch-schema state_dict of float32 ndarrays
    (pass to ``save_pth`` to write an actual .pth)."""
    params, stats = variables["params"], variables["batch_stats"]
    branches, head = _structure(variant)
    sd: Dict[str, np.ndarray] = {}

    flat_channels = 0
    for torch_prefix, flax_branch in branches:
        branch_tree = params
        for key in flax_branch:
            branch_tree = branch_tree[key]
        n_blocks = _count_flax_blocks(branch_tree)
        for b in range(n_blocks):
            conv, bn = f"{torch_prefix}.{4 * b}", f"{torch_prefix}.{4 * b + 1}"
            block = flax_branch + (f"ConvBlock_{b}",)
            kernel = _get(params, block + ("Conv_0", "kernel"))
            sd[f"{conv}.weight"] = _conv_w_inv(kernel)
            sd[f"{conv}.bias"] = _get(params, block + ("Conv_0", "bias"))
            sd[f"{bn}.weight"] = _get(params, block + ("BatchNorm_0", "scale"))
            sd[f"{bn}.bias"] = _get(params, block + ("BatchNorm_0", "bias"))
            sd[f"{bn}.running_mean"] = _get(stats, block + ("BatchNorm_0", "mean"))
            sd[f"{bn}.running_var"] = _get(stats, block + ("BatchNorm_0", "var"))
            sd[f"{bn}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
            if b == n_blocks - 1:
                flat_channels += kernel.shape[-1]

    for i, (lin, bn) in enumerate([(1, 2), (5, 6)]):
        block = (f"DenseBNBlock_{i}",)
        kernel = _get(params, block + ("Dense_0", "kernel"))
        sd[f"{head}.{lin}.weight"] = (
            _first_dense_w_inv(kernel, flat_channels) if i == 0 else kernel.T
        )
        sd[f"{head}.{lin}.bias"] = _get(params, block + ("Dense_0", "bias"))
        sd[f"{head}.{bn}.weight"] = _get(params, block + ("BatchNorm_0", "scale"))
        sd[f"{head}.{bn}.bias"] = _get(params, block + ("BatchNorm_0", "bias"))
        sd[f"{head}.{bn}.running_mean"] = _get(stats, block + ("BatchNorm_0", "mean"))
        sd[f"{head}.{bn}.running_var"] = _get(stats, block + ("BatchNorm_0", "var"))
        sd[f"{head}.{bn}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)

    sd[f"{head}.9.weight"] = _get(params, ("Dense_0", "kernel")).T
    sd[f"{head}.9.bias"] = _get(params, ("Dense_0", "bias"))
    return sd


def load_pth(path: str, variant: str) -> dict:
    """Read a reference .pth checkpoint into flax variables.

    Raises FileNotFoundError for a missing path and ValueError for a file
    that is not a torch checkpoint (corrupt/truncated/wrong format) — so
    CLIs can catch one clear exception type instead of torch's pickle/zip
    internals leaking as tracebacks."""
    import torch

    try:
        state_dict = torch.load(path, map_location="cpu", weights_only=True)
    except FileNotFoundError:
        raise
    except Exception as e:  # UnpicklingError, BadZipFile, RuntimeError, ...
        raise ValueError(f"{path} is not a readable torch checkpoint: "
                         f"{type(e).__name__}: {e}") from e
    return torch_to_flax(state_dict, variant)


def save_pth(path: str, variables: dict, variant: str) -> None:
    """Write flax variables as a torch-loadable .pth state_dict."""
    import torch

    sd = flax_to_torch(variables, variant)
    # np.array(copy=True) -> writable buffers (torch.from_numpy on a read-only
    # device-array view would warn and risk UB if the tensor were mutated)
    torch.save(
        {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}, path
    )

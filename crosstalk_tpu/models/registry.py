"""Model registry: the CLI's ``-o single|double`` flag resolves here
(reference instantiation at train_model.py:534-537 and
test-cross-talk-model.py:255-258)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from crosstalk_tpu.config import ModelConfig
from crosstalk_tpu.models.single_branch import SingleBranchRegressor
from crosstalk_tpu.models.two_branch import TwoBranchRegressor

_DTYPES = {"bf16": jnp.bfloat16, "f32": jnp.float32}


def compute_dtype(cfg: ModelConfig):
    return _DTYPES[cfg.compute_dtype]


def precision_for(cfg: ModelConfig):
    # In the f32 parity mode, force full-precision MXU passes so eval-mode
    # outputs track the PyTorch reference to <=1e-4 (SURVEY.md §7 hard part 1).
    return jax.lax.Precision.HIGHEST if cfg.compute_dtype == "f32" else None


def build_model(cfg: ModelConfig, axis_name: str | None = None):
    """ModelConfig -> Flax module with the reference's instantiated config."""
    dtype = compute_dtype(cfg)
    precision = precision_for(cfg)
    common = dict(
        leaky_slope=cfg.leaky_slope,
        bn_momentum=cfg.bn_momentum,
        bn_eps=cfg.bn_eps,
        axis_name=axis_name,
        dtype=dtype,
        precision=precision,
    )
    if cfg.variant == "double":
        return TwoBranchRegressor(
            initial_filters_per_branch=cfg.initial_filters_per_branch,
            dropout=cfg.dropout_double,
            **common,
        )
    if cfg.variant == "single":
        return SingleBranchRegressor(
            initial_filters=cfg.initial_filters,
            num_conv_blocks=cfg.num_conv_blocks,
            max_filters=cfg.max_filters,
            dropout=cfg.dropout_single,
            **common,
        )
    raise ValueError(f"unknown model variant {cfg.variant!r} (use 'single' or 'double')")


def init_model(model, rng, image_size: int = 256, batch: int = 2):
    """Initialize variables with a dummy batch.

    The whole init is wrapped in one jit: in this environment every XLA
    compilation pays a fixed remote-compile round-trip, so op-by-op eager
    dispatch of the per-parameter RNG draws is pathologically slow. One
    traced program = one compile.
    """
    dummy = jnp.zeros((batch, image_size, image_size, 2), jnp.float32)
    return jax.jit(lambda r: model.init({"params": r}, dummy, train=False))(rng)


def count_params(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def architecture_summary(model, variables) -> str:
    """Human-readable architecture description written to
    model_architecture.txt (the reference writes torch's __repr__,
    train_model.py:556-559; ours is the flax tabulate-style param listing)."""
    lines = [repr(model), "", "Parameters:"]
    flat = jax.tree_util.tree_flatten_with_path(variables.get("params", {}))[0]
    total = 0
    for path, leaf in flat:
        name = "/".join(getattr(p, "key", str(p)) for p in path)
        lines.append(f"  {name}: {tuple(leaf.shape)} {leaf.dtype}")
        total += leaf.size
    lines.append(f"Total trainable parameters: {total:,}")
    return "\n".join(lines)

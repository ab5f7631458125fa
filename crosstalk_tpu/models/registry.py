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
    """Flax param listing (kept for library users; the CLIs write
    ``torch_style_repr`` to model_architecture.txt for content fidelity
    with the reference)."""
    lines = [repr(model), "", "Parameters:"]
    flat = jax.tree_util.tree_flatten_with_path(variables.get("params", {}))[0]
    total = 0
    for path, leaf in flat:
        name = "/".join(getattr(p, "key", str(p)) for p in path)
        lines.append(f"  {name}: {tuple(leaf.shape)} {leaf.dtype}")
        total += leaf.size
    lines.append(f"Total trainable parameters: {total:,}")
    return "\n".join(lines)


def torch_style_repr(cfg: ModelConfig, image_size: int = 256) -> str:
    """Re-creation of ``str(<reference torch module>)`` from the config.

    The reference writes the torch ``__repr__`` to model_architecture.txt
    (train_model.py:556-559, test-cross-talk-model.py:276-279); this
    produces the same content without a torch dependency. Byte-equality
    with the real reference modules is pinned in
    tests/test_reference_parity.py. The flatten size uses 256x256 inputs
    exactly like the reference's hardcoded dummy forward
    (regression_model.py:31, two_branch_regression.py:60).
    """
    eps, mom, slope = cfg.bn_eps, cfg.bn_momentum, cfg.leaky_slope

    def conv(cin, cout):
        return (f"Conv2d({cin}, {cout}, kernel_size=(3, 3), "
                f"stride=(1, 1), padding=(1, 1))")

    def bn(ndim, c):
        return (f"BatchNorm{ndim}d({c}, eps={eps}, momentum={mom}, "
                f"affine=True, bias=True, track_running_stats=True)")

    leaky = f"LeakyReLU(negative_slope={slope})"
    pool = "MaxPool2d(kernel_size=2, stride=2, padding=0, dilation=1, ceil_mode=False)"

    def seq(items, indent):
        pad = " " * indent
        return [f"{pad}({i}): {s}" for i, s in enumerate(items)]

    def head_items(flat, p):
        return [
            "Flatten(start_dim=1, end_dim=-1)",
            f"Linear(in_features={flat}, out_features=512, bias=True)",
            bn(1, 512), leaky, f"Dropout(p={p}, inplace=False)",
            "Linear(in_features=512, out_features=128, bias=True)",
            bn(1, 128), leaky, f"Dropout(p={p}, inplace=False)",
            "Linear(in_features=128, out_features=1, bias=True)",
        ]

    if cfg.variant == "single":
        items = []
        cin, cout = cfg.input_channels, cfg.initial_filters
        items += [conv(cin, cout), bn(2, cout), leaky, pool]
        for _ in range(1, cfg.num_conv_blocks):
            cin, cout = cout, min(cout * 2, cfg.max_filters)
            items += [conv(cin, cout), bn(2, cout), leaky, pool]
        side = image_size >> cfg.num_conv_blocks
        lines = ["AdvancedRegressionModel(", "  (conv_layers): Sequential("]
        lines += seq(items, 4)
        lines += ["  )", "  (fc_layers): Sequential("]
        lines += seq(head_items(cout * side * side, cfg.dropout_single), 4)
        lines += ["  )", ")"]
        return "\n".join(lines)

    f = cfg.initial_filters_per_branch
    branch_items = []
    cin = 1
    for mult in (1, 2, 4, 8):
        branch_items += [conv(cin, f * mult), bn(2, f * mult), leaky, pool]
        cin = f * mult
    side = image_size >> 4

    def branch(name):
        out = [f"  ({name}): SimplifiedFeatureExtractionBranch(",
               "    (conv_blocks): Sequential("]
        out += seq(branch_items, 6)
        out += ["    )", "  )"]
        return out

    lines = ["SimplifiedTwoBranchRegressionModel("]
    lines += branch("bleed_branch")
    lines += branch("source_branch")
    lines += ["  (regression_head): SimplifiedRegressionHead(",
              "    (fc_layers): Sequential("]
    lines += seq(
        head_items(2 * f * 8 * side * side, cfg.dropout_double) + ["Sigmoid()"], 6
    )
    lines += ["    )", "  )", ")"]
    return "\n".join(lines)

from crosstalk_tpu.models.layers import BatchNorm, ConvBlock, DenseBNBlock
from crosstalk_tpu.models.registry import (
    architecture_summary,
    torch_style_repr,
    build_model,
    count_params,
    init_model,
)
from crosstalk_tpu.models.single_branch import SingleBranchRegressor
from crosstalk_tpu.models.two_branch import FeatureBranch, TwoBranchRegressor

__all__ = [
    "BatchNorm",
    "ConvBlock",
    "DenseBNBlock",
    "SingleBranchRegressor",
    "TwoBranchRegressor",
    "FeatureBranch",
    "build_model",
    "init_model",
    "count_params",
    "architecture_summary",
    "torch_style_repr",
]

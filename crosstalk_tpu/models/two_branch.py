"""Two-branch regressor — capability match for the reference's
``SimplifiedTwoBranchRegressionModel`` (two_branch_regression.py:59-100).

Two weight-independent 4-block encoders (bleed + source), each
1->f->2f->4f->8f channels / 256->16 spatial (two_branch_regression.py:8-32);
features concatenate on the channel axis (line 96) and feed a
Dense(512)+BN+LeakyReLU+Dropout(0.5) -> Dense(128)+... -> Dense(1) -> Sigmoid
head (lines 40-54) whose output is scaled by 0.5 to map into the alpha range
[0, 0.5] (line 100).

At the instantiated config (initial_filters_per_branch=64,
train_model.py:535) the concatenated map is (16, 16, 1024) -> 262,144 flat;
the first head matmul holds 134M of the model's 137M params. On TPU that is
one (B, 262144) x (262144, 512) MXU matmul in bfloat16 — comfortably
HBM-resident per chip, so data parallelism remains the right (and only)
sharding axis (SURVEY.md §5).

The head input size is static from shapes — no dummy eval-mode forward (the
reference sizes it by running a batch-2 zeros tensor through a branch,
two_branch_regression.py:68-80).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from crosstalk_tpu.models.layers import ConvBlock, DenseBNBlock, output_dense


class FeatureBranch(nn.Module):
    """4x ConvBlock encoder: 1 -> f -> 2f -> 4f -> 8f channels."""

    initial_filters: int = 64
    leaky_slope: float = 0.01
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = jnp.bfloat16
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(
            leaky_slope=self.leaky_slope,
            bn_momentum=self.bn_momentum,
            bn_eps=self.bn_eps,
            axis_name=self.axis_name,
            dtype=self.dtype,
            precision=self.precision,
        )
        for mult in (1, 2, 4, 8):
            x = ConvBlock(features=self.initial_filters * mult, **kw)(x, train)
        return x


class TwoBranchRegressor(nn.Module):
    initial_filters_per_branch: int = 64
    leaky_slope: float = 0.01
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dropout: float = 0.5
    axis_name: Optional[str] = None
    dtype: Any = jnp.bfloat16
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 2) float32 -> (B, 1) float32 alpha in [0, 0.5]."""
        kw = dict(
            leaky_slope=self.leaky_slope,
            bn_momentum=self.bn_momentum,
            bn_eps=self.bn_eps,
            axis_name=self.axis_name,
            dtype=self.dtype,
            precision=self.precision,
        )
        bleed = FeatureBranch(
            initial_filters=self.initial_filters_per_branch, name="bleed_branch", **kw
        )(x[..., 0:1], train)
        source = FeatureBranch(
            initial_filters=self.initial_filters_per_branch, name="source_branch", **kw
        )(x[..., 1:2], train)
        fused = jnp.concatenate([bleed, source], axis=-1)  # channel concat
        h = fused.reshape(fused.shape[0], -1)
        h = DenseBNBlock(features=512, dropout=self.dropout, **kw)(h, train)
        h = DenseBNBlock(features=128, dropout=self.dropout, **kw)(h, train)
        h = output_dense(1, fan_in=128, dtype=self.dtype, precision=self.precision)(h)
        return (nn.sigmoid(h.astype(jnp.float32)) * 0.5).astype(jnp.float32)

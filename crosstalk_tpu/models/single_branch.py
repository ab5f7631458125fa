"""Single-branch regressor — capability match for the reference's
``AdvancedRegressionModel`` (regression_model.py:5-61).

Architecture (instantiated config: initial_filters=128, num_conv_blocks=6,
train_model.py:537): a 2-channel 256x256 input runs through 6 ConvBlocks whose
widths double per block capped at 512 (2->128->256->512->512->512->512,
regression_model.py:22), spatially 256->4; the 4*4*512 feature map flattens
into a Dense(512)+BN+LeakyReLU+Dropout(0.1) -> Dense(128)+... -> Dense(1) head
with NO output activation (the reference's Sigmoid is commented out,
regression_model.py:49).

Differences by design (TPU-first):
  * NHWC layout; the flatten order is therefore (H, W, C) — the .pth
    converter permutes the first head kernel accordingly.
  * The flatten size is known statically from shapes at init — no dummy
    forward pass (the reference sizes its head by running zeros through the
    conv stack and hardcodes 256x256, regression_model.py:52-56; this module
    works at any input size divisible by 2^num_conv_blocks).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from crosstalk_tpu.models.layers import ConvBlock, DenseBNBlock, output_dense


class SingleBranchRegressor(nn.Module):
    initial_filters: int = 128
    num_conv_blocks: int = 6
    max_filters: int = 512
    leaky_slope: float = 0.01
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    dropout: float = 0.1
    axis_name: Optional[str] = None
    dtype: Any = jnp.bfloat16
    precision: Any = None

    def block_widths(self):
        widths = [self.initial_filters]
        for _ in range(1, self.num_conv_blocks):
            widths.append(min(widths[-1] * 2, self.max_filters))
        return widths

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 2) float32 -> (B, 1) float32 alpha prediction."""
        kw = dict(
            leaky_slope=self.leaky_slope,
            bn_momentum=self.bn_momentum,
            bn_eps=self.bn_eps,
            axis_name=self.axis_name,
            dtype=self.dtype,
            precision=self.precision,
        )
        for width in self.block_widths():
            x = ConvBlock(features=width, **kw)(x, train)
        x = x.reshape(x.shape[0], -1)  # NHWC flatten: (H, W, C) order
        x = DenseBNBlock(features=512, dropout=self.dropout, **kw)(x, train)
        x = DenseBNBlock(features=128, dropout=self.dropout, **kw)(x, train)
        x = output_dense(1, fan_in=128, dtype=self.dtype, precision=self.precision)(x)
        return x.astype(jnp.float32)

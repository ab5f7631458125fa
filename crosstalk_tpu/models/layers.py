"""Building-block layers.

TPU-first notes:
  * Everything is NHWC — XLA's preferred conv layout on TPU (the reference is
    NCHW PyTorch; the .pth converter handles the transpose).
  * Convs/matmuls run in a configurable compute dtype (bfloat16 by default —
    MXU native) with float32 parameters and accumulation; BatchNorm statistics
    are always computed in float32.
  * BatchNorm is implemented here rather than taken from flax so that
    (a) running-stat semantics match torch exactly (torch normalizes with the
    *biased* batch variance but accumulates the *unbiased* variance into
    running_var — flax accumulates biased), keeping exported checkpoints
    interchangeable with the reference ecosystem, and
    (b) batch statistics can be psum-synced across a data-parallel mesh axis,
    preserving single-device training semantics under data parallelism
    (SURVEY.md §5 "BatchNorm under data parallelism").

Reference semantics reproduced (for the parity harness, SURVEY.md §2 end):
Conv2d 3x3 stride 1 pad 1; BatchNorm eps=1e-5 momentum=0.1;
LeakyReLU(0.01); MaxPool2d 2x2; torch default Kaiming-uniform(a=sqrt(5)) init.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def torch_uniform_init(fan_in: int):
    """torch's default Kaiming-uniform(a=sqrt(5)) for weights — and its
    matching bias init — both reduce to U(-1/sqrt(fan_in), +1/sqrt(fan_in)).

    (gain = sqrt(2 / (1 + a^2)) = 1/sqrt(3); bound = gain * sqrt(3/fan_in)
    = 1/sqrt(fan_in).) Used so training curves are comparable with the
    reference's initialization distribution.
    """
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class BatchNorm(nn.Module):
    """Batch normalization with torch-exact running-stat semantics and
    optional cross-replica statistics over a mesh axis.

    Normalizes over all axes except the last (works for both the 2D conv maps
    and the dense head, i.e. torch's BatchNorm2d and BatchNorm1d).

    momentum follows the *torch* convention (new = (1-m)*old + m*batch),
    torch default 0.1.
    """

    momentum: float = 0.1
    eps: float = 1e-5
    axis_name: Optional[str] = None  # psum batch stats across this mesh axis
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        reduce_axes = tuple(range(x.ndim - 1))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # Stats are ACCUMULATED in f32 without materializing an f32 copy
            # of the activation (on a bf16 conv output that copy doubles the
            # layer's HBM traffic — measured 6x end-to-end slowdown). The
            # squares must be TAKEN in f32 though (cast fuses into the
            # reduction, still reading x once in bf16): squaring in bf16
            # loses ~0.4% per element, and since post-LeakyReLU activations
            # are mostly positive (E[x]^2 ~ E[x^2]), that error exceeds the
            # true variance and E[x^2]-E[x]^2 goes negative -> rsqrt = NaN.
            n = math.prod(x.shape[:-1])
            total = jnp.asarray(n, jnp.float32)
            s = jnp.sum(x, axis=reduce_axes, dtype=jnp.float32)
            sq = jnp.sum(
                jnp.square(x.astype(jnp.float32)), axis=reduce_axes
            )
            if self.axis_name is not None:
                # Cross-replica sync: one psum of the packed (sum, sumsq, n)
                # triple rides ICI per BN layer.
                s = jax.lax.psum(s, self.axis_name)
                sq = jax.lax.psum(sq, self.axis_name)
                total = jax.lax.psum(total, self.axis_name)
            mean = s / total
            # biased variance, used to normalize; clamped at 0 because even
            # f32 cancellation can dip epsilon-negative for near-constant x
            var = jnp.maximum(sq / total - jnp.square(mean), 0.0)

            if not self.is_initializing():
                # torch stores the UNBIASED variance in running_var.
                unbiased = var * (total / jnp.maximum(total - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        # One fused multiply-add in the compute dtype: y = x*eff_scale+eff_bias
        inv = jax.lax.rsqrt(var + self.eps)
        eff_scale = (scale * inv).astype(self.dtype)
        eff_bias = (bias - mean * scale * inv).astype(self.dtype)
        return x.astype(self.dtype) * eff_scale + eff_bias


class ConvBlock(nn.Module):
    """Conv3x3(SAME) -> BatchNorm -> LeakyReLU(0.01) -> MaxPool 2x2.

    The repeated unit of both reference models (regression_model.py:14-27,
    two_branch_regression.py:8-32). The conv runs on the MXU in the compute
    dtype; BN/LeakyReLU/pool are VPU elementwise work that XLA fuses into the
    conv epilogue.
    """

    features: int
    leaky_slope: float = 0.01
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.bfloat16
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        fan_in = 3 * 3 * x.shape[-1]
        x = nn.Conv(
            self.features,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding=((1, 1), (1, 1)),
            kernel_init=torch_uniform_init(fan_in),
            bias_init=torch_uniform_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=self.precision,
        )(x)
        x = BatchNorm(
            momentum=self.bn_momentum,
            eps=self.bn_eps,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x, use_running_average=not train)
        x = nn.leaky_relu(x, negative_slope=self.leaky_slope)
        x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return x


class DenseBNBlock(nn.Module):
    """Dense -> BatchNorm1d -> LeakyReLU -> Dropout — the regression-head unit
    (regression_model.py:36-44, two_branch_regression.py:42-50)."""

    features: int
    dropout: float
    leaky_slope: float = 0.01
    bn_momentum: float = 0.1
    bn_eps: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.bfloat16
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        fan_in = x.shape[-1]
        x = nn.Dense(
            self.features,
            kernel_init=torch_uniform_init(fan_in),
            bias_init=torch_uniform_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=self.precision,
        )(x)
        x = BatchNorm(
            momentum=self.bn_momentum,
            eps=self.bn_eps,
            axis_name=self.axis_name,
            dtype=self.dtype,
        )(x, use_running_average=not train)
        x = nn.leaky_relu(x, negative_slope=self.leaky_slope)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


def output_dense(features: int, fan_in: int, dtype, precision=None) -> nn.Dense:
    """Final scalar-regression Dense layer."""
    return nn.Dense(
        features,
        kernel_init=torch_uniform_init(fan_in),
        bias_init=torch_uniform_init(fan_in),
        dtype=dtype,
        param_dtype=jnp.float32,
        precision=precision,
    )

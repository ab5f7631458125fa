"""Fast-inference-path tests: the Pallas fused input block (interpreter mode
on CPU) and the full hand-scheduled forward must match the flax model's
eval-mode output.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crosstalk_tpu.config import ModelConfig
from crosstalk_tpu.eval.fast_forward import make_fast_forward
from crosstalk_tpu.models import build_model, init_model
from crosstalk_tpu.ops.pallas.input_block import (
    build_phase_kernel,
    fold_bn_affine,
    fused_input_block,
    space_to_depth,
)


def _reference_block(x, kernel, scale, bias, slope=0.01):
    """Plain-XLA f32 conv+affine+lrelu+pool — the semantics the kernel fuses."""
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y * scale + bias
    y = jnp.where(y >= 0, y, slope * y)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def test_pallas_gate_rejects_unaligned_pixel_chunks():
    """90px tiles give m = 45*45 = 2025 pooled pixels — no candidate divisor
    and not sublane-aligned; the gate must route them to the XLA block (and
    the XLA fallback must still be numerically right). 256px (m=16384) and
    32px (m=256) stay on the Pallas path."""
    from crosstalk_tpu.ops.pallas.input_block import select_chunk

    assert select_chunk(16384) == 4096 and select_chunk(16384) % 16 == 0
    assert select_chunk(256) == 256 and select_chunk(256) % 16 == 0
    assert select_chunk(2025) == 2025 and select_chunk(2025) % 16 != 0

    # end-to-end: a 90px forward through the fast path (gate falls back to
    # XLA internally) matches the flax model
    cfg = ModelConfig(variant="single", initial_filters=8, num_conv_blocks=2,
                      compute_dtype="bf16")
    model = build_model(cfg)
    variables = init_model(model, jax.random.PRNGKey(0), image_size=90)
    x = jnp.asarray(
        np.random.default_rng(3).random((2, 90, 90, 2)).astype(np.float32))
    golden = model.apply(variables, x, train=False)
    fast = make_fast_forward(cfg, use_pallas=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fast(variables, x)), np.asarray(golden),
        atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("c_in,features,size", [(2, 128, 32), (1, 64, 64), (2, 128, 64)])
def test_fused_input_block_matches_reference(c_in, features, size):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((3, size, size, c_in)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(0, 0.2, (3, 3, c_in, features)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1.0, 0.3, (features,)).astype(np.float32))
    scale = scale.at[::5].set(-scale[::5])  # negative-scale channels exercise
    # the phase-max placed AFTER the affine (order matters when scale < 0)
    bias = jnp.asarray(rng.normal(0, 0.2, (features,)).astype(np.float32))

    ref = _reference_block(x, kernel, scale, bias)
    out = fused_input_block(x, kernel, scale, bias, interpret=True)
    assert out.shape == (3, size // 2, size // 2, features)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )  # bf16 matmul tolerance


def test_phase_kernel_exactness_f32():
    """The s2d phase decomposition itself is exact: compare in f32 via a
    dense einsum of the phase kernel against the canonical conv."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 16, 16, 2)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(0, 0.3, (3, 3, 2, 8)).astype(np.float32))
    w2 = build_phase_kernel(kernel)
    xs = jnp.pad(space_to_depth(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xs, w2, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y = y.reshape(2, 8, 8, 4, 8)
    pooled_phase_max = jnp.max(y, axis=3)

    ref_conv = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    ref = jax.lax.reduce_window(
        ref_conv, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    np.testing.assert_allclose(
        np.asarray(pooled_phase_max), np.asarray(ref), atol=1e-5
    )


@pytest.mark.parametrize("variant", ["single", "double"])
def test_fast_forward_matches_flax(variant):
    cfg = ModelConfig(
        variant=variant,
        initial_filters=8,
        num_conv_blocks=3,
        initial_filters_per_branch=4,
        compute_dtype="bf16",
    )
    model = build_model(cfg)
    size = 64
    variables = init_model(model, jax.random.key(0), image_size=size)
    # move batch stats off their init values
    rng = np.random.default_rng(2)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda a: a + jnp.asarray(rng.normal(0, 0.01, a.shape), a.dtype) ** 2,
            variables["batch_stats"],
        ),
    }
    x = jnp.asarray(rng.random((4, size, size, 2)).astype(np.float32))

    flax_out = jax.jit(lambda v, a: model.apply(v, a, train=False))(variables, x)
    fast = make_fast_forward(cfg, use_pallas=True, interpret=True)
    fast_out = jax.jit(fast)(variables, x)
    np.testing.assert_allclose(
        np.asarray(fast_out), np.asarray(flax_out), atol=5e-3, rtol=0
    )  # both bf16 paths, different op order


def test_double_fused_input_block_path(monkeypatch):
    """At the real two-branch width (64 filters/branch) the pair of C=1
    first blocks must route through ONE block-diagonal fused kernel call
    (2F = 128 meets the lane constraint) and match the flax forward."""
    import crosstalk_tpu.eval.fast_forward as ff

    calls = {"n": 0}
    real = ff.fused_input_block

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(ff, "fused_input_block", counting)

    cfg = ModelConfig(variant="double", initial_filters_per_branch=64,
                      compute_dtype="bf16")
    model = build_model(cfg)
    size = 64
    variables = init_model(model, jax.random.key(1), image_size=size)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((2, size, size, 2)).astype(np.float32))

    golden = model.apply(variables, x, train=False)
    fast = ff.make_fast_forward(cfg, use_pallas=True, interpret=True)
    out = fast(variables, x)
    assert calls["n"] == 1  # ONE fused call covers both branches' block 0
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(golden), atol=5e-3, rtol=0
    )

    # odd width per branch (2F not lane-aligned) falls back to XLA blocks
    calls["n"] = 0
    cfg2 = ModelConfig(variant="double", initial_filters_per_branch=4,
                       compute_dtype="bf16")
    model2 = build_model(cfg2)
    v2 = init_model(model2, jax.random.key(2), image_size=32)
    x2 = jnp.asarray(rng.random((2, 32, 32, 2)).astype(np.float32))
    fast2 = ff.make_fast_forward(cfg2, use_pallas=True, interpret=True)
    out2 = fast2(v2, x2)
    assert calls["n"] == 0
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(model2.apply(v2, x2, train=False)),
        atol=5e-3, rtol=0,
    )


def test_fast_forward_full_config_torch_parity():
    """Fast path vs the torch golden at the full single config: the bf16
    serving path must stay within a few*1e-4 of the f64-exact reference."""
    torch = pytest.importorskip("torch")
    from crosstalk_tpu.io.torch_convert import torch_to_flax
    from tests.torch_ref import TorchSingle, burn_in_batch_stats

    torch.manual_seed(11)
    tmodel = burn_in_batch_stats(TorchSingle(image_size=64), 64)
    variables = torch_to_flax(tmodel.state_dict(), "single")

    rng = np.random.default_rng(3)
    x = rng.random((4, 64, 64, 2)).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    fast = make_fast_forward(ModelConfig(variant="single"), interpret=True)
    out = np.asarray(jax.jit(fast)(variables, jnp.asarray(x)))
    assert np.abs(out - golden).mean() < 2e-3  # bf16 envelope

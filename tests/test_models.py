"""Model tests: shapes, exact parameter counts, BN semantics, dropout/flips
determinism, output ranges.

Param-count goldens come from the reference's instantiated configs
(SURVEY.md §2-C11): single 12,823,937; double 137,388,801.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crosstalk_tpu.config import ModelConfig
from crosstalk_tpu.models import (
    BatchNorm,
    build_model,
    count_params,
    init_model,
)

SMALL_SINGLE = ModelConfig(
    variant="single", initial_filters=8, num_conv_blocks=3, compute_dtype="f32"
)
SMALL_DOUBLE = ModelConfig(
    variant="double", initial_filters_per_branch=4, compute_dtype="f32"
)


def test_single_branch_param_count_matches_reference():
    cfg = ModelConfig(variant="single")  # 128 filters / 6 blocks
    model = build_model(cfg)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((2, 256, 256, 2)), train=False)
    )
    assert count_params(variables["params"]) == 12_823_937


def test_two_branch_param_count_matches_reference():
    cfg = ModelConfig(variant="double")  # 64 filters/branch
    model = build_model(cfg)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.key(0), jnp.zeros((2, 256, 256, 2)), train=False)
    )
    assert count_params(variables["params"]) == 137_388_801


def test_forward_shapes_small():
    for cfg in (SMALL_SINGLE, SMALL_DOUBLE):
        model = build_model(cfg)
        variables = init_model(model, jax.random.key(0), image_size=32)
        x = jax.random.normal(jax.random.key(1), (4, 32, 32, 2))
        y = jax.jit(lambda v, a: model.apply(v, a, train=False))(variables, x)
        assert y.shape == (4, 1)
        assert y.dtype == jnp.float32


def test_two_branch_output_range():
    """Sigmoid * 0.5 bounds the double model to [0, 0.5]
    (two_branch_regression.py:53,100)."""
    model = build_model(SMALL_DOUBLE)
    variables = init_model(model, jax.random.key(0), image_size=32)
    x = jax.random.normal(jax.random.key(1), (8, 32, 32, 2)) * 100
    y = np.asarray(jax.jit(lambda v, a: model.apply(v, a, train=False))(variables, x))
    assert (y >= 0).all() and (y <= 0.5).all()


def test_batchnorm_matches_torch():
    """Train-mode normalization, running-stat updates (unbiased var), and
    eval-mode use of running stats must match torch.nn.BatchNorm exactly."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(8, 5)).astype(np.float32) * 3 + 1
    x2 = rng.normal(size=(8, 5)).astype(np.float32) * 2 - 1

    tbn = torch.nn.BatchNorm1d(5, eps=1e-5, momentum=0.1)
    tbn.weight.data = torch.tensor([1.5, 0.5, 2.0, 1.0, 0.3])
    tbn.bias.data = torch.tensor([0.1, -0.2, 0.0, 0.4, 1.0])
    tbn.train()
    with torch.no_grad():
        t1 = tbn(torch.tensor(x1)).numpy()
        t2 = tbn(torch.tensor(x2)).numpy()
    tbn.eval()
    with torch.no_grad():
        t3 = tbn(torch.tensor(x1)).numpy()

    bn = BatchNorm(momentum=0.1, eps=1e-5, dtype=jnp.float32)
    variables = bn.init(jax.random.key(0), jnp.asarray(x1), use_running_average=False)
    variables = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
        "batch_stats": variables["batch_stats"],
    }
    j1, mut = bn.apply(
        variables, jnp.asarray(x1), use_running_average=False, mutable=["batch_stats"]
    )
    variables = {"params": variables["params"], "batch_stats": mut["batch_stats"]}
    j2, mut = bn.apply(
        variables, jnp.asarray(x2), use_running_average=False, mutable=["batch_stats"]
    )
    variables = {"params": variables["params"], "batch_stats": mut["batch_stats"]}
    j3 = bn.apply(variables, jnp.asarray(x1), use_running_average=True)

    np.testing.assert_allclose(np.asarray(j1), t1, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j2), t2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j3), t3, atol=1e-5)  # eval parity
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]),
        tbn.running_mean.numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        atol=1e-6,
    )


def test_batchnorm_4d():
    """BatchNorm2d equivalence on conv feature maps."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)

    tbn = torch.nn.BatchNorm2d(3)
    tbn.train()
    with torch.no_grad():
        t = tbn(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    bn = BatchNorm(dtype=jnp.float32)
    variables = bn.init(jax.random.key(0), jnp.asarray(x), use_running_average=False)
    j, mut = bn.apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(j), t, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["var"]),
        tbn.running_var.numpy(),
        atol=1e-6,
    )


def test_train_mode_dropout_and_mutability():
    model = build_model(SMALL_SINGLE)
    variables = init_model(model, jax.random.key(0), image_size=32)
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 2))
    train_apply = jax.jit(
        lambda v, a, k: model.apply(
            v, a, train=True, mutable=["batch_stats"], rngs={"dropout": k}
        )
    )
    y1, mut = train_apply(variables, x, jax.random.key(2))
    y2, _ = train_apply(variables, x, jax.random.key(3))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))  # dropout active
    # batch_stats moved away from init
    stats0 = variables["batch_stats"]
    assert not jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: np.allclose(a, b), stats0, mut["batch_stats"])
    )
    # eval mode is deterministic without a dropout rng
    eval_apply = jax.jit(lambda v, a: model.apply(v, a, train=False))
    e1 = eval_apply(variables, x)
    e2 = eval_apply(variables, x)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_init_distribution_matches_torch_bounds():
    """torch kaiming-uniform(a=sqrt(5)) => U(+/- 1/sqrt(fan_in))."""
    model = build_model(SMALL_SINGLE)
    variables = init_model(model, jax.random.key(0), image_size=32)
    params = variables["params"]
    conv0 = params["ConvBlock_0"]["Conv_0"]["kernel"]  # (3,3,2,8)
    bound = 1.0 / np.sqrt(3 * 3 * 2)
    assert np.abs(np.asarray(conv0)).max() <= bound
    assert np.abs(np.asarray(conv0)).max() > 0.8 * bound  # actually fills the range


def test_infer_model_size_and_checkpoint_config():
    """A checkpoint's width/depth is recoverable from its parameter tree,
    and model_config_for_checkpoint validates size flags against it."""
    import pytest

    from crosstalk_tpu.io.torch_convert import (
        infer_model_size,
        model_config_for_checkpoint,
    )

    v = init_model(build_model(SMALL_SINGLE), jax.random.key(0), image_size=32)
    assert infer_model_size(v, "single") == {
        "initial_filters": SMALL_SINGLE.initial_filters,
        "num_conv_blocks": SMALL_SINGLE.num_conv_blocks,
    }
    cfg = model_config_for_checkpoint("single", v, compute_dtype="f32")
    assert cfg.initial_filters == SMALL_SINGLE.initial_filters
    assert cfg.num_conv_blocks == SMALL_SINGLE.num_conv_blocks
    with pytest.raises(ValueError, match="does not match the checkpoint"):
        model_config_for_checkpoint(
            "single", v, initial_filters=SMALL_SINGLE.initial_filters + 1
        )

    vd = init_model(build_model(SMALL_DOUBLE), jax.random.key(1), image_size=32)
    assert infer_model_size(vd, "double") == {
        "initial_filters_per_branch": SMALL_DOUBLE.initial_filters_per_branch,
    }
    with pytest.raises(ValueError, match="does not match the checkpoint"):
        model_config_for_checkpoint(
            "double", vd,
            initial_filters=SMALL_DOUBLE.initial_filters_per_branch + 1,
        )


def test_checkpoint_config_rejects_double_depth_override():
    import pytest

    from crosstalk_tpu.io.torch_convert import model_config_for_checkpoint

    vd = init_model(build_model(SMALL_DOUBLE), jax.random.key(2), image_size=32)
    with pytest.raises(ValueError, match="single-branch model only"):
        model_config_for_checkpoint("double", vd, num_conv_blocks=3)

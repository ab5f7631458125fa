"""Int8 serving tier: quantization scheme + end-to-end closeness.

The int8 path is opt-in and explicitly OUTSIDE the 1e-4 parity budget
(DEPLOY.md parity map); these tests pin the scheme's mechanics exactly and
its end-to-end deviation loosely (order-of-magnitude envelope, not parity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crosstalk_tpu.config import ModelConfig
from crosstalk_tpu.eval.int8_forward import (
    _quant_act,
    _quant_weight,
    calibrate_int8 as calibrate,
    make_int8_forward,
)
from crosstalk_tpu.models.registry import build_model, init_model


def _small_cfg(variant):
    return ModelConfig(
        variant=variant,
        initial_filters=8,
        num_conv_blocks=3,
        initial_filters_per_branch=4,
        compute_dtype="bf16",
    )


def _variables(cfg, size, seed):
    model = build_model(cfg)
    variables = init_model(model, jax.random.key(seed), image_size=size)
    rng = np.random.default_rng(seed)
    # move batch stats off their init values (as the trained models have)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda a: a + jnp.asarray(rng.normal(0, 0.01, a.shape), a.dtype) ** 2,
            variables["batch_stats"],
        ),
    }
    return model, variables


def test_quant_weight_per_channel_roundtrip():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(0, 1, (3, 3, 16, 32)).astype(np.float32))
    k = k.at[..., 0].multiply(100.0)  # one hot channel must not wreck the rest
    kq, sw = _quant_weight(k)
    assert kq.dtype == jnp.int8 and sw.shape == (32,)
    err = np.abs(np.asarray(kq, np.float32) * np.asarray(sw) - np.asarray(k))
    # symmetric rounding: per-channel error bounded by half a quantum
    assert (err <= np.asarray(sw)[None, None, None, :] / 2 + 1e-7).all()


def test_quant_act_saturates_outside_calibration_range():
    x = jnp.asarray([-3.0, -1.0, 0.0, 0.5, 1.0, 3.0])
    q = np.asarray(_quant_act(x, jnp.float32(1.0)))
    assert q.dtype == np.int8
    assert q[0] == -127 and q[-1] == 127  # saturation, not wraparound
    assert q[2] == 0 and q[4] == 127


@pytest.mark.parametrize("variant", ["single", "double"])
@pytest.mark.parametrize("int8_dense", [False, True])
def test_calibrate_covers_every_quantize_point(variant, int8_dense):
    cfg = _small_cfg(variant)
    _, variables = _variables(cfg, 32, 3)
    x = np.random.default_rng(1).random((2, 32, 32, 2)).astype(np.float32)
    scales = calibrate(cfg, variables, x, use_pallas=False, interpret=True,
                       int8_dense=int8_dense)
    if variant == "single":
        expected = {"conv_1", "conv_2"}
    else:
        expected = {
            "bleed_1", "bleed_2", "bleed_3",
            "source_1", "source_2", "source_3",
        }
    if int8_dense:  # v1 scheme: the FC head quantizes too
        expected |= {"dense_0", "dense_1"}
    assert set(scales) == expected
    assert all(v > 0 for v in scales.values())


def test_mse_clip_never_exceeds_absmax_and_tightens_gaussian_tails():
    """method='mse' picks a clip <= the batch absmax, and on a large
    Gaussian tensor — where the absmax is a lone extreme order statistic —
    it clips below it, spending the saturation of a ~1e-5 tail fraction to
    shrink every other element's quantum. (Note the converse is also true
    and deliberate: a tensor whose outlier carries real squared mass keeps
    its absmax clip — MSE optimality, not blind percentile chopping.)"""
    from crosstalk_tpu.eval.int8_forward import _mse_clip

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, 2_000_000).astype(np.float32))
    absmax = float(jnp.max(jnp.abs(x)))
    clip = float(_mse_clip(x))
    assert clip <= absmax + 1e-6
    assert clip < 0.95 * absmax  # a real tightening, not grid noise
    assert clip > 0.2 * absmax  # and not a degenerate chop


def test_calibrate_mse_matches_or_beats_absmax_end_to_end():
    """On the same model/batch, the v2 (mse clip + bf16 head) forward must
    not be less accurate than the v1 (absmax + int8 head) forward."""
    cfg = _small_cfg("single")
    model, variables = _variables(cfg, 64, 2)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((4, 64, 64, 2)).astype(np.float32))
    golden = np.asarray(
        jax.jit(lambda v, a: model.apply(v, a, train=False))(variables, x)
    )

    def mae(scales):
        fwd = make_int8_forward(cfg, scales, use_pallas=False, interpret=True)
        return float(np.abs(np.asarray(jax.jit(fwd)(variables, x)) - golden).mean())

    v1 = mae(calibrate(cfg, variables, x, use_pallas=False, interpret=True,
                       method="absmax", int8_dense=True))
    v2 = mae(calibrate(cfg, variables, x, use_pallas=False, interpret=True))
    assert v2 <= v1 * 1.05, (v2, v1)  # 5% slack: different rounding noise


def test_calibrate_unknown_method_raises():
    cfg = _small_cfg("single")
    _, variables = _variables(cfg, 32, 3)
    x = np.random.default_rng(1).random((2, 32, 32, 2)).astype(np.float32)
    with pytest.raises(ValueError, match="calibration method"):
        calibrate(cfg, variables, x, use_pallas=False, interpret=True,
                  method="minmax")


@pytest.mark.parametrize("variant", ["single", "double"])
def test_int8_forward_tracks_f32_predictions(variant):
    cfg = _small_cfg(variant)
    model, variables = _variables(cfg, 64, 2)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((4, 64, 64, 2)).astype(np.float32))

    golden = np.asarray(
        jax.jit(lambda v, a: model.apply(v, a, train=False))(variables, x)
    )
    scales = calibrate(cfg, variables, x, use_pallas=False, interpret=True)
    fast = make_int8_forward(cfg, scales, use_pallas=False, interpret=True)
    out = np.asarray(jax.jit(fast)(variables, x))

    assert out.shape == golden.shape and out.dtype == np.float32
    # int8 envelope: well outside 1e-4 parity, well inside "useful"
    spread = max(float(np.ptp(golden)), 1e-3)
    mae = float(np.abs(out - golden).mean())
    assert mae < 0.15 * spread, (mae, spread)
    # deterministic
    out2 = np.asarray(jax.jit(fast)(variables, x))
    np.testing.assert_array_equal(out, out2)


def test_int8_forward_full_config_torch_envelope():
    """Full single config vs the f64-exact torch golden: the int8 tier must
    stay within an order-of-magnitude-looser envelope than bf16's 2e-3."""
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

    cfg = ModelConfig(variant="single")
    scales = calibrate(cfg, variables, x, interpret=True)
    fast = make_int8_forward(cfg, scales, interpret=True)
    out = np.asarray(jax.jit(fast)(variables, jnp.asarray(x)))
    assert np.abs(out - golden).mean() < 2e-2  # vs 2e-3 for the bf16 path


def test_make_predictor_int8_tier_matches_direct_forward():
    """serve/predictor.py's int8_scales wiring serves exactly the
    make_int8_forward program (normalize + int8 forward, padded shape)."""
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.serve.predictor import make_predictor

    cfg = _small_cfg("single")
    _, variables = _variables(cfg, 32, 7)
    rng = np.random.default_rng(8)
    raw = rng.random((4, 32, 32, 2)).astype(np.float32)
    norm = np.asarray(normalize_batch_nhwc(raw))

    scales = calibrate(cfg, variables, norm, use_pallas=False, interpret=True)
    predict = make_predictor(
        variables, cfg, batch_size=4, image_size=32,
        use_pallas=False, int8_scales=scales,
    )
    direct = make_int8_forward(cfg, scales, use_pallas=False)
    golden = np.asarray(jax.jit(direct)(variables, jnp.asarray(norm)))[:, 0]
    np.testing.assert_allclose(predict(raw), golden, atol=1e-6)


def test_make_forward_int8_requires_fast_path():
    from crosstalk_tpu.io.export import make_forward

    with pytest.raises(ValueError, match="fast serving path"):
        make_forward(_small_cfg("single"), fast=False,
                     int8_scales={"conv_1": 1.0})


def test_int8_forward_missing_scale_key_raises():
    cfg = _small_cfg("single")
    _, variables = _variables(cfg, 32, 4)
    x = jnp.asarray(np.random.default_rng(6).random((2, 32, 32, 2)), jnp.float32)
    fast = make_int8_forward(cfg, {"conv_1": 1.0}, use_pallas=False, interpret=True)
    with pytest.raises(KeyError):
        fast(variables, x)

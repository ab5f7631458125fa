"""Metric-parity tests: the batched JAX metrics must agree with the exact
libraries/formulas the reference uses (test-cross-talk-model.py:59-86):
scipy.stats.pearsonr, np.histogram+pearsonr, np.digitize+sklearn NMI,
plain-numpy RMSE, and skimage SSIM (re-derived in NumPy here — skimage itself
is not installed in this image; the re-derivation follows the published
algorithm: 7x7 uniform window, unbiased covariance, border-cropped mean).
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.ndimage import uniform_filter
from scipy.stats import pearsonr
from sklearn.metrics import normalized_mutual_info_score

from crosstalk_tpu.ops import classical_metrics


def _numpy_ssim(x, y, data_range, win=7, k1=0.01, k2=0.03):
    """skimage.metrics.structural_similarity, defaults, float64."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    np_ = win * win
    cov_norm = np_ / (np_ - 1)
    f = lambda a: uniform_filter(a, size=win)
    ux, uy = f(x), f(y)
    uxx, uyy, uxy = f(x * x), f(y * y), f(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    pad = (win - 1) // 2
    return s[pad:-pad, pad:-pad].mean()


def _reference_metrics_numpy(batch):
    """The reference's exact per-sample metric loop, vectorized over here
    for comparison (mirrors test-cross-talk-model.py:58-86 semantics)."""
    out = {k: [] for k in [
        "Root Mean Squared Error", "Structural Similarity Index",
        "Histogram Correlation", "Normalized Mutual Information",
        "Pearsons Correlation"]}
    for j in range(batch.shape[0]):
        a, b = batch[j, :, :, 0], batch[j, :, :, 1]
        af, bf = a.flatten(), b.flatten()
        p = np.nan if (np.std(af) == 0 or np.std(bf) == 0) else pearsonr(af, bf)[0]
        h1 = np.histogram(af, bins=256)[0]
        h2 = np.histogram(bf, bins=256)[0]
        hp = np.nan if (np.std(h1) == 0 or np.std(h2) == 0) else pearsonr(h1, h2)[0]
        d1 = np.digitize(af, bins=np.linspace(a.min(), a.max(), 256))
        d2 = np.digitize(bf, bins=np.linspace(b.min(), b.max(), 256))
        dr = max(a.max(), b.max()) - min(a.min(), b.min())
        out["Root Mean Squared Error"].append(np.sqrt(np.mean((a - b) ** 2)))
        out["Structural Similarity Index"].append(_numpy_ssim(a, b, dr))
        out["Histogram Correlation"].append(hp)
        out["Normalized Mutual Information"].append(
            normalized_mutual_info_score(d1, d2))
        out["Pearsons Correlation"].append(p)
    return {k: np.array(v) for k, v in out.items()}


@pytest.fixture(scope="module")
def random_batch():
    rng = np.random.default_rng(0)
    base = rng.random((4, 64, 64)).astype(np.float32)
    other = rng.random((4, 64, 64)).astype(np.float32)
    alpha = np.array([0.05, 0.2, 0.35, 0.5], dtype=np.float32)
    mixed = other + alpha[:, None, None] * base
    # normalize like the eval transform does
    def norm(x):
        lo = x.min(axis=(1, 2), keepdims=True)
        hi = x.max(axis=(1, 2), keepdims=True)
        return (x - lo) / (hi - lo)
    return np.stack([norm(mixed), norm(base)], axis=-1).astype(np.float32)


def test_metrics_match_reference_libraries(random_batch):
    ours = {k: np.asarray(v) for k, v in classical_metrics(jnp.asarray(random_batch)).items()}
    ref = _reference_metrics_numpy(random_batch)

    np.testing.assert_allclose(ours["Root Mean Squared Error"],
                               ref["Root Mean Squared Error"], atol=1e-6)
    np.testing.assert_allclose(ours["Pearsons Correlation"],
                               ref["Pearsons Correlation"], atol=1e-5)
    np.testing.assert_allclose(ours["Structural Similarity Index"],
                               ref["Structural Similarity Index"], atol=1e-4)
    np.testing.assert_allclose(ours["Histogram Correlation"],
                               ref["Histogram Correlation"], atol=1e-4)
    # digitize edge-rounding differs in f32 vs f64 on a handful of pixels
    np.testing.assert_allclose(ours["Normalized Mutual Information"],
                               ref["Normalized Mutual Information"], atol=5e-3)


def test_metrics_on_reference_tiles(reference_data_dirs):
    """Same comparison on real microscopy tiles (8 of the bundled 100)."""
    from crosstalk_tpu.data.index import PairIndex
    from crosstalk_tpu.data.pipeline import TileStore
    mixed_dir, source_dir = reference_data_dirs
    index = PairIndex(mixed_dir, source_dir, max_samples=8)
    store = TileStore(index.samples, jobs=4)
    def norm(x):
        lo = x.min(axis=(1, 2), keepdims=True)
        hi = x.max(axis=(1, 2), keepdims=True)
        return (x - lo) / (hi - lo)
    batch = norm(np.asarray(store.tiles))
    ours = {k: np.asarray(v) for k, v in classical_metrics(jnp.asarray(batch)).items()}
    ref = _reference_metrics_numpy(batch)
    np.testing.assert_allclose(ours["Root Mean Squared Error"],
                               ref["Root Mean Squared Error"], atol=1e-6)
    np.testing.assert_allclose(ours["Pearsons Correlation"],
                               ref["Pearsons Correlation"], atol=1e-5)
    np.testing.assert_allclose(ours["Structural Similarity Index"],
                               ref["Structural Similarity Index"], atol=1e-4)
    np.testing.assert_allclose(ours["Histogram Correlation"],
                               ref["Histogram Correlation"], atol=1e-3)
    np.testing.assert_allclose(ours["Normalized Mutual Information"],
                               ref["Normalized Mutual Information"], rtol=2e-2)


def test_identical_images_edge_case():
    rng = np.random.default_rng(1)
    img = rng.random((2, 32, 32)).astype(np.float32)
    batch = np.stack([img, img], axis=-1)
    m = {k: np.asarray(v) for k, v in classical_metrics(jnp.asarray(batch)).items()}
    np.testing.assert_allclose(m["Root Mean Squared Error"], 0.0, atol=1e-7)
    np.testing.assert_allclose(m["Pearsons Correlation"], 1.0, atol=1e-5)
    np.testing.assert_allclose(m["Structural Similarity Index"], 1.0, atol=1e-5)
    np.testing.assert_allclose(m["Histogram Correlation"], 1.0, atol=1e-5)
    np.testing.assert_allclose(m["Normalized Mutual Information"], 1.0, atol=1e-4)


def test_constant_image_nan_guards():
    """Constant channel: Pearson NaN (reference guard), NMI 1.0 for two
    identical single-cluster partitions (sklearn limit case)."""
    rng = np.random.default_rng(2)
    const = np.full((1, 32, 32), 0.7, dtype=np.float32)
    varying = rng.random((1, 32, 32)).astype(np.float32)
    batch = np.stack([const, varying], axis=-1)
    m = {k: np.asarray(v) for k, v in classical_metrics(jnp.asarray(batch)).items()}
    assert np.isnan(m["Pearsons Correlation"][0])
    both_const = np.stack([const, const], axis=-1)
    m2 = {k: np.asarray(v) for k, v in classical_metrics(jnp.asarray(both_const)).items()}
    assert np.isnan(m2["Pearsons Correlation"][0])
    np.testing.assert_allclose(m2["Normalized Mutual Information"], 1.0)


def test_metrics_match_reference_on_grid_quantized_data():
    """Real microscopy data is grid-quantized (integer sensor counts), so
    pixel values land EXACTLY on histogram/digitize bin edges systematically
    — the case where a scaled-floor bin assignment without NumPy's
    edge-correction pass is one bin off (caught by the round-3 review;
    before the fix np.digitize parity failed on every such tile)."""
    rng = np.random.default_rng(42)
    # f32-exact grid: integer counts scaled by a power of two
    a = (rng.integers(0, 50, (3, 32, 32)) * 8.0 + 4.0).astype(np.float32)
    b = (rng.integers(0, 50, (3, 32, 32)) * 8.0 + 4.0).astype(np.float32)
    batch = np.stack([a, b], axis=-1)

    from crosstalk_tpu.ops.metrics import _digitize_256, _histogram_256

    for j in range(batch.shape[0]):
        for img in (a[j], b[j]):
            flat = img.flatten()
            ref_h = np.histogram(flat, bins=256)[0]
            got_h = np.asarray(_histogram_256(jnp.asarray(img[None])))[0]
            np.testing.assert_array_equal(got_h, ref_h)
            ref_d = np.clip(
                np.digitize(flat, np.linspace(img.min(), img.max(), 256)) - 1,
                0, 255,
            )
            got_d = np.asarray(_digitize_256(jnp.asarray(img[None])))[0]
            np.testing.assert_array_equal(got_d, ref_d)

    ref = _reference_metrics_numpy(batch.astype(np.float64))
    got = classical_metrics(jnp.asarray(batch))
    for key in ("Histogram Correlation", "Normalized Mutual Information"):
        np.testing.assert_allclose(
            np.asarray(got[key]), ref[key], rtol=1e-5, atol=1e-6,
            err_msg=key,
        )

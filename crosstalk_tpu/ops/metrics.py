"""Classical image-comparison metrics as batched, jittable JAX ops.

The reference computes five per-sample metrics in a Python loop on the CPU
(test-cross-talk-model.py:59-86): Pearson correlation of the pixels, RMSE,
SSIM (skimage), histogram correlation, and normalized mutual information
(sklearn). That loop dominates its eval wall time (SURVEY.md §3.2). Here each
metric is a vectorized function of a whole (B, H, W, 2) normalized batch,
evaluated on the VPU/MXU in one fused program.

Numerical contracts (validated in tests against scipy/sklearn and a NumPy
re-derivation of skimage's SSIM — skimage itself is not installed here):

  * pearson(img1, img2): scipy.stats.pearsonr of the flattened pixels; NaN
    when either side has zero variance (the reference's explicit guard,
    test-cross-talk-model.py:61-64).
  * rmse: sqrt(mean((img1 - img2)^2)) (line 79).
  * ssim: skimage.metrics.structural_similarity defaults — 7x7 uniform
    window, K1=0.01, K2=0.03, unbiased covariance normalization
    (N/(N-1), N=49), mean over the border-cropped SSIM map — with the
    reference's joint data_range = max(both maxes) - min(both mins)
    (lines 80-82).
  * hist_correlation: pearson of the two 256-bin histograms, each over its
    own [min, max] range (np.histogram semantics: right-closed last bin);
    NaN when a histogram is constant (lines 65-70).
  * nmi: sklearn.metrics.normalized_mutual_info_score (arithmetic mean
    normalization, natural log) over images digitized into 256 bins via
    np.digitize(x, linspace(min, max, 256)) (lines 71-74, 84).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NBINS = 256
_SSIM_WIN = 7
_SSIM_K1 = 0.01
_SSIM_K2 = 0.03


def _flat(img):
    return img.reshape(img.shape[0], -1)


def _pearson_1d(a, b):
    """Pearson r along axis -1 with the zero-variance NaN guard.

    Constancy is detected exactly via max == min (a float32 mean-subtraction
    residual on a constant input is not exactly zero, so a variance threshold
    would miss the reference's np.std == 0 guard)."""
    const_a = jnp.max(a, axis=-1) == jnp.min(a, axis=-1)
    const_b = jnp.max(b, axis=-1) == jnp.min(b, axis=-1)
    a = a - jnp.mean(a, axis=-1, keepdims=True)
    b = b - jnp.mean(b, axis=-1, keepdims=True)
    num = jnp.sum(a * b, axis=-1)
    den = jnp.sqrt(jnp.sum(a * a, axis=-1) * jnp.sum(b * b, axis=-1))
    ok = jnp.logical_not(const_a | const_b) & (den > 0)
    return jnp.where(ok, num / jnp.where(ok, den, 1.0), jnp.nan)


def pearson(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) x2 -> (B,) pixelwise Pearson correlation."""
    return _pearson_1d(_flat(img1), _flat(img2))


def rmse(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) x2 -> (B,) root-mean-squared difference."""
    return jnp.sqrt(jnp.mean(jnp.square(img1 - img2), axis=(-2, -1)))


def _edge_rows(lo, hi, num: int) -> jnp.ndarray:
    """Per-sample np.linspace(lo, hi, num) edge rows: lo + step*k with the
    endpoint forced exact — the same construction np.histogram/np.digitize
    compare against, so edge corrections below use the same values."""
    step = (hi - lo) / (num - 1)
    k = jnp.arange(num, dtype=jnp.float32)
    edges = lo + step * k
    return jnp.concatenate([edges[..., :-1], hi], axis=-1)


def _histogram_256(img: jnp.ndarray) -> jnp.ndarray:
    """np.histogram(x, bins=256) over each sample's own [min, max] range.

    Bin index = floor((x - min) / width), then NumPy's edge-correction pass:
    the scaled floor can land one bin off for values sitting exactly on a
    bin edge (real microscopy data is grid-quantized, so edge collisions are
    systematic, not rare), so indices are checked against the actual
    linspace edge values exactly as np.histogram's uniform-bin fast path
    does. The max value belongs to the last bin (right-closed final bin).
    Computed as a one-hot scatter via bincount-style segment sums,
    vectorized over the batch.
    """
    x = _flat(img)
    lo = jnp.min(x, axis=-1, keepdims=True)
    hi = jnp.max(x, axis=-1, keepdims=True)
    span = jnp.where(hi > lo, hi - lo, 1.0)
    idx = jnp.clip(
        jnp.floor((x - lo) / span * _NBINS).astype(jnp.int32), 0, _NBINS - 1
    )
    edges = _edge_rows(lo, hi, _NBINS + 1)  # (B, 257)
    idx = jnp.where(jnp.take_along_axis(edges, idx, axis=-1) > x, idx - 1, idx)
    idx = jnp.where(
        (jnp.take_along_axis(edges, idx + 1, axis=-1) <= x)
        & (idx != _NBINS - 1),
        idx + 1,
        idx,
    )
    # constant image: np.histogram widens the degenerate range to
    # [v - 0.5, v + 0.5], landing every count in the middle bin (128)
    idx = jnp.where(hi > lo, idx, _NBINS // 2)
    one_hot_counts = jax.vmap(
        lambda row: jnp.zeros((_NBINS,), jnp.float32).at[row].add(1.0)
    )(idx)
    return one_hot_counts


def hist_correlation(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) x2 -> (B,) Pearson r of the per-image 256-bin histograms."""
    h1 = _histogram_256(img1)
    h2 = _histogram_256(img2)
    return _pearson_1d(h1, h2)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, data_range: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) x2 + (B,) data_range -> (B,) structural similarity.

    skimage defaults: uniform 7x7 window, unbiased covariance, mean over the
    valid (border-cropped) region. Local window sums are computed with
    reduce_window in 'valid' mode — the cropped border makes boundary
    handling irrelevant, so no reflect-padding is needed.
    """
    x = img1[..., None].astype(jnp.float32)
    y = img2[..., None].astype(jnp.float32)

    def win_mean(a):
        s = jax.lax.reduce_window(
            a,
            0.0,
            jax.lax.add,
            window_dimensions=(1, _SSIM_WIN, _SSIM_WIN, 1),
            window_strides=(1, 1, 1, 1),
            padding="VALID",
        )
        return s / (_SSIM_WIN * _SSIM_WIN)

    np_ = _SSIM_WIN * _SSIM_WIN
    cov_norm = np_ / (np_ - 1.0)  # unbiased (skimage use_sample_covariance)
    ux, uy = win_mean(x), win_mean(y)
    uxx, uyy, uxy = win_mean(x * x), win_mean(y * y), win_mean(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    dr = data_range.reshape(-1, 1, 1, 1).astype(jnp.float32)
    c1 = jnp.square(_SSIM_K1 * dr)
    c2 = jnp.square(_SSIM_K2 * dr)
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2)
    )
    return jnp.mean(s, axis=(1, 2, 3))


def _digitize_256(img: jnp.ndarray) -> jnp.ndarray:
    """np.digitize(x, linspace(min, max, 256)): right-open bins, so x == min
    -> 1 and x == max -> 256; 256 distinct labels mapped here to 0..255.

    digitize(x) counts edges <= x, so a value sitting EXACTLY on edge k must
    yield k+1 — but the scaled floor can compute fractionally below k for
    such values (systematic on grid-quantized data, where pixel values
    coincide with edges). Corrected against the actual linspace edge values,
    the comparison np.digitize (searchsorted) performs."""
    x = _flat(img)
    lo = jnp.min(x, axis=-1, keepdims=True)
    hi = jnp.max(x, axis=-1, keepdims=True)
    span = jnp.where(hi > lo, hi - lo, 1.0)
    cand = jnp.clip(
        jnp.floor((x - lo) / span * (_NBINS - 1)).astype(jnp.int32),
        0, _NBINS - 1,
    )
    edges = _edge_rows(lo, hi, _NBINS)  # (B, 256)
    # largest k with edges[k] <= x, starting from the floor candidate
    k = jnp.where(jnp.take_along_axis(edges, cand, axis=-1) > x, cand - 1, cand)
    nxt = jnp.clip(cand + 1, 0, _NBINS - 1)
    k = jnp.where(
        (jnp.take_along_axis(edges, nxt, axis=-1) <= x) & (cand != _NBINS - 1),
        cand + 1,
        k,
    )
    # labels = digitize - 1 = k (x >= lo = edges[0] keeps k >= 0)
    return jnp.clip(k, 0, _NBINS - 1)


def nmi(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) x2 -> (B,) normalized mutual information of the digitized
    images (sklearn arithmetic normalization, natural log)."""
    l1 = _digitize_256(img1)
    l2 = _digitize_256(img2)
    n = l1.shape[-1]

    def joint(a, b):
        flat_idx = a * _NBINS + b
        counts = jnp.zeros((_NBINS * _NBINS,), jnp.float32).at[flat_idx].add(1.0)
        return counts.reshape(_NBINS, _NBINS)

    c = jax.vmap(joint)(l1, l2)  # (B, 256, 256) contingency
    p = c / n
    pi = jnp.sum(p, axis=2)
    pj = jnp.sum(p, axis=1)

    def entropy(q):
        return -jnp.sum(jnp.where(q > 0, q * jnp.log(q), 0.0), axis=-1)

    log_outer = jnp.log(jnp.maximum(pi[:, :, None], 1e-30)) + jnp.log(
        jnp.maximum(pj[:, None, :], 1e-30)
    )
    mi = jnp.sum(
        jnp.where(p > 0, p * (jnp.log(jnp.maximum(p, 1e-30)) - log_outer), 0.0),
        axis=(1, 2),
    )
    h1, h2 = entropy(pi), entropy(pj)
    denom = 0.5 * (h1 + h2)
    # sklearn: if both clusterings are single-cluster, NMI is defined as 1
    # when they are identical partitions (entropy 0 on both sides) -> the
    # generalized_average of zeros; sklearn returns 0.0 in that case unless
    # labels are identical, where it special-cases 1.0. Constant images both
    # digitize to a single label -> identical partitions -> 1.0.
    both_const = (h1 == 0) & (h2 == 0)
    return jnp.where(both_const, 1.0, mi / jnp.where(denom > 0, denom, 1.0))


@functools.partial(jax.jit, static_argnames=())
def classical_metrics(batch_nhwc: jnp.ndarray) -> dict:
    """All five reference metrics over a normalized (B, H, W, 2) batch.

    Returns a dict of (B,) arrays keyed by the reference's CSV column names
    (test-cross-talk-model.py:39-41).
    """
    img1 = batch_nhwc[..., 0]
    img2 = batch_nhwc[..., 1]
    joint_max = jnp.maximum(
        jnp.max(img1, axis=(-2, -1)), jnp.max(img2, axis=(-2, -1))
    )
    joint_min = jnp.minimum(
        jnp.min(img1, axis=(-2, -1)), jnp.min(img2, axis=(-2, -1))
    )
    return {
        "Root Mean Squared Error": rmse(img1, img2),
        "Structural Similarity Index": ssim(img1, img2, joint_max - joint_min),
        "Histogram Correlation": hist_correlation(img1, img2),
        "Normalized Mutual Information": nmi(img1, img2),
        "Pearsons Correlation": pearson(img1, img2),
    }

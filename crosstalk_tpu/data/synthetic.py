"""Synthetic paired-tile dataset generator (reference on-disk layout).

The reference repo bundles ``Training_Data/{Mixed,Source}`` — 100 paired
256x256 float64 TIFFs named ``image_<ID>_alpha_<A>_(mixed|source).tif``
(SURVEY.md "Bundled data"; schema regex train_model.py:105). That asset is
the one reference artifact with no in-repo counterpart here, so this module
generates an equivalent: blobby microscopy-ish structure with a known
bleed-through coefficient, ``mixed = other + alpha * source``. Used by

  * the train CLI's quickstart bootstrap (a fresh clone's
    ``python train_model.py`` with zero flags generates the sample set);
  * ``tools/make_dataset.py`` (IDR-scale stand-ins for pipeline/scale work);
  * the test suite's fixtures (tests/conftest.py carries a trimmed copy).
"""

from __future__ import annotations

import os

import numpy as np

from crosstalk_tpu.data.tiff import write_tile


def generate_pair(rng: np.random.Generator, size: int):
    """-> (mixed, source, alpha): one paired tile with known bleed-through."""
    alpha = round(float(rng.uniform(0.01, 0.5)), 2)

    def field():
        base = rng.random((size // 8, size // 8))
        return np.kron(base, np.ones((8, 8)))[:size, :size]

    source = field() + 0.05 * rng.random((size, size))
    other = field() + 0.05 * rng.random((size, size))
    return other + alpha * source, source, alpha


def generate_dataset(
    out_dir: str,
    num_pairs: int = 1000,
    size: int = 256,
    seed: int = 0,
    start_id: int = 100000,
    progress_every: int = 500,
) -> tuple:
    """Write ``num_pairs`` paired float64 tiles under ``out_dir`` in the
    reference's exact layout; returns (mixed_dir, source_dir)."""
    mixed_dir = os.path.join(out_dir, "Mixed")
    source_dir = os.path.join(out_dir, "Source")
    os.makedirs(mixed_dir, exist_ok=True)
    os.makedirs(source_dir, exist_ok=True)

    rng = np.random.default_rng(seed)
    for i in range(num_pairs):
        mixed, source, alpha = generate_pair(rng, size)
        name = f"image_{start_id + i}_alpha_{alpha}"
        write_tile(os.path.join(mixed_dir, f"{name}_mixed.tif"), mixed)
        write_tile(os.path.join(source_dir, f"{name}_source.tif"), source)
        if progress_every and (i + 1) % progress_every == 0:
            print(f"{i + 1}/{num_pairs}", flush=True)
    return mixed_dir, source_dir

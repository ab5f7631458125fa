"""Real-texture remix generator (data/remix.py, make_dataset --preset remix).

The remix corpus is the round-5 sim-to-real experiment's foundation
(TRAINING_RESULTS "Real-texture remix training"): labels must be true by
construction and the texture holdout must actually hold textures out —
these tests pin both, on a tiny synthetic "real bank" so they run in
seconds without the reference mount.
"""

import os

import numpy as np
import pytest

from crosstalk_tpu.data.index import PairIndex
from crosstalk_tpu.data.remix import (
    RemixBank,
    generate_remix_dataset,
    split_texture_ids,
)
from crosstalk_tpu.data.tiff import read_tile
from tests.conftest import make_synthetic_dataset


@pytest.fixture()
def bank_dirs(tmp_path):
    return make_synthetic_dataset(str(tmp_path / "bank"), n=10, size=32,
                                  seed=4)


def test_split_texture_ids_deterministic_partition(bank_dirs):
    mixed, source = bank_dirs
    train, hold = split_texture_ids(mixed, source, holdout_frac=0.2)
    train2, hold2 = split_texture_ids(mixed, source, holdout_frac=0.2)
    assert (train, hold) == (train2, hold2)
    assert len(hold) == 2 and len(train) == 8
    assert not set(train) & set(hold)
    all_ids = {s.image_id for s in PairIndex(mixed, source).samples}
    assert set(train) | set(hold) == all_ids


def test_generate_remix_dataset_layout_and_labels(tmp_path, bank_dirs):
    mixed, source = bank_dirs
    out_m, out_s = generate_remix_dataset(
        str(tmp_path / "out"), mixed, source, num_pairs=16, seed=9)
    index = PairIndex(out_m, out_s)
    assert len(index.samples) == 16
    for s in index.samples:
        assert 0.01 <= s.scalar_label <= 0.5
        m = read_tile(s.mixed_path, dtype=np.float64)
        src = read_tile(s.source_path, dtype=np.float64)
        assert m.shape == src.shape == (32, 32)
        assert np.isfinite(m).all() and np.isfinite(src).all()


def test_generate_remix_dataset_deterministic(tmp_path, bank_dirs):
    mixed, source = bank_dirs
    a_m, _ = generate_remix_dataset(str(tmp_path / "a"), mixed, source,
                                    num_pairs=4, seed=5)
    b_m, _ = generate_remix_dataset(str(tmp_path / "b"), mixed, source,
                                    num_pairs=4, seed=5)
    for name in sorted(os.listdir(a_m)):
        with open(os.path.join(a_m, name), "rb") as fa, \
                open(os.path.join(b_m, name), "rb") as fb:
            assert fa.read() == fb.read(), name


def test_remix_mixing_identity_single_source_bank(tmp_path):
    """With a 2-pair bank the drawn source is forced to the OTHER image id,
    so the written pair must satisfy the mixing contract exactly:
    norm01(written_mixed) == norm01(norm01(base) + alpha*norm01(source_orig))
    up to the float64 write. Pins both the label semantics and the
    same-id exclusion."""
    mixed_dir, source_dir = make_synthetic_dataset(str(tmp_path / "bank"),
                                                   n=2, size=32, seed=7)
    bank = RemixBank(mixed_dir, source_dir)
    originals = {
        "mixed": {i: t for i, t in zip(bank.ids, bank.mixed)},
        "source": {i: t for i, t in zip(bank.ids, bank.source)},
    }

    def n01(x):
        lo, hi = x.min(), x.max()
        return (x - lo) / (hi - lo)

    from crosstalk_tpu.data.remix import _dihedral

    rng = np.random.default_rng(3)
    for _ in range(8):
        m, src, alpha = bank.pair(rng)
        # the written source is a dihedral transform of exactly one
        # original source tile; identify its image id
        src_id = next(
            (i for i, orig in originals["source"].items()
             if any(np.array_equal(src, _dihedral(orig, k))
                    for k in range(8))),
            None,
        )
        assert src_id is not None, "written source is not a bank transform"
        (base_id,) = [j for j in set(bank.ids) if j != src_id]
        # the base must be the OTHER id's mixed tile (some dihedral of it):
        # reconstruct the mixing for each of its 8 transforms and demand one
        # matches after normalization (raw offset/scale cancel under n01)
        target = n01(m)
        matched = any(
            np.allclose(
                target,
                n01(n01(_dihedral(originals["mixed"][base_id], k))
                    + alpha * n01(src)),
                atol=1e-12,
            )
            for k in range(8)
        )
        assert matched, "mixing identity violated"


def test_remix_bank_rejects_degenerate_inputs(tmp_path):
    mixed_dir, source_dir = make_synthetic_dataset(str(tmp_path / "one"),
                                                   n=1, size=16, seed=1)
    with pytest.raises(ValueError, match=">=2 distinct image ids"):
        RemixBank(mixed_dir, source_dir)

    # >=2 SAMPLES but one image id (same image at two alphas — legal under
    # PairIndex's compound key): pair()'s different-id rejection loop could
    # never terminate, so the constructor must reject up front
    from crosstalk_tpu.data.tiff import write_tile

    one_id = tmp_path / "oneid"
    rng = np.random.default_rng(0)
    for d in ("Mixed", "Source"):
        os.makedirs(one_id / d)
    for alpha in ("0.1", "0.2"):
        for d, kind in (("Mixed", "mixed"), ("Source", "source")):
            write_tile(str(one_id / d / f"image_7_alpha_{alpha}_{kind}.tif"),
                       rng.random((16, 16)))
    with pytest.raises(ValueError, match=">=2 distinct image ids"):
        RemixBank(str(one_id / "Mixed"), str(one_id / "Source"))


def test_make_dataset_cli_remix_requires_real_dirs(tmp_path):
    from tools.make_dataset import main as make_dataset

    with pytest.raises(SystemExit):
        make_dataset([str(tmp_path / "o"), "--preset", "remix"])

"""Data index tests: pairing regex, string-key semantics, sort order, splits.

The semantics under test mirror reference train_model.py:97-154 and 576-585.
"""

import os

import numpy as np
import pytest

from crosstalk_tpu.data.index import FILE_PATTERN, PairIndex, split_samples
from crosstalk_tpu.data.tiff import write_tile


def test_regex_matches_reference_schema():
    m = FILE_PATTERN.search("image_14144_alpha_0.43_mixed.tif")
    assert m and m.groups() == ("14144", "0.43", "mixed")
    m = FILE_PATTERN.search("image_7_alpha_0.5_source.tif")
    assert m and m.groups() == ("7", "0.5", "source")
    # integer alpha (regex allows \d+\.?\d*)
    m = FILE_PATTERN.search("image_1_alpha_0_mixed.tif")
    assert m and m.group(2) == "0"
    assert FILE_PATTERN.search("img_1_alpha_0.3_mixed.tif") is None


def test_pairing_and_sort(synthetic_data_dirs):
    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    assert len(index) == 12
    # sort is (string id, float alpha) — lexicographic on the id
    keys = [(s.image_id, s.scalar_label) for s in index.samples]
    assert keys == sorted(keys)
    for s in index.samples:
        assert os.path.exists(s.mixed_path)
        assert os.path.exists(s.source_path)
        assert 0.0 <= s.scalar_label <= 0.5


def test_unpaired_files_dropped(tmp_path):
    mixed_dir = tmp_path / "Mixed"
    source_dir = tmp_path / "Source"
    mixed_dir.mkdir()
    source_dir.mkdir()
    img = np.zeros((8, 8))
    write_tile(str(mixed_dir / "image_1_alpha_0.2_mixed.tif"), img)
    write_tile(str(source_dir / "image_1_alpha_0.2_source.tif"), img)
    # orphan mixed, orphan source, wrong-type file in mixed dir
    write_tile(str(mixed_dir / "image_2_alpha_0.3_mixed.tif"), img)
    write_tile(str(source_dir / "image_3_alpha_0.1_source.tif"), img)
    write_tile(str(mixed_dir / "image_4_alpha_0.1_source.tif"), img)
    index = PairIndex(str(mixed_dir), str(source_dir))
    assert len(index) == 1
    assert index[0].image_id == "1"


def test_alpha_string_key_disambiguates(tmp_path):
    """'0.2' and '0.20' are distinct keys (string compare, not float)."""
    mixed_dir = tmp_path / "Mixed"
    source_dir = tmp_path / "Source"
    mixed_dir.mkdir()
    source_dir.mkdir()
    img = np.zeros((8, 8))
    write_tile(str(mixed_dir / "image_1_alpha_0.2_mixed.tif"), img)
    write_tile(str(source_dir / "image_1_alpha_0.20_source.tif"), img)
    with pytest.raises(ValueError, match="No matching samples"):
        PairIndex(str(mixed_dir), str(source_dir))


def test_empty_raises(tmp_path):
    (tmp_path / "Mixed").mkdir()
    (tmp_path / "Source").mkdir()
    with pytest.raises(ValueError, match="No matching samples"):
        PairIndex(str(tmp_path / "Mixed"), str(tmp_path / "Source"))


def test_max_samples(synthetic_data_dirs):
    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir, max_samples=5)
    assert len(index) == 5


def test_split_matches_torch_randperm(synthetic_data_dirs):
    """Splits must equal the reference's torch.manual_seed(43)+randperm."""
    torch = pytest.importorskip("torch")
    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    train, val, test = split_samples(index.samples, 0.7, 0.15, seed=43)

    torch.manual_seed(43)
    perm = torch.randperm(len(index)).tolist()
    n = len(index)
    ts, vs = int(0.7 * n), int(0.15 * n)
    assert [s.image_id for s in train] == [index[i].image_id for i in perm[:ts]]
    assert [s.image_id for s in val] == [
        index[i].image_id for i in perm[ts : ts + vs]
    ]
    assert [s.image_id for s in test] == [
        index[i].image_id for i in perm[ts + vs :]
    ]
    assert len(train) + len(val) + len(test) == n


def test_reference_dataset_pairs(reference_data_dirs):
    """The bundled reference dataset: 100 fully-paired tiles."""
    mixed_dir, source_dir = reference_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    assert len(index) == 100
    alphas = [s.scalar_label for s in index.samples]
    assert min(alphas) >= 0.01 and max(alphas) <= 0.50

"""Native C++ tile-decoder tests: byte equality with the Python decoder on
synthetic and real tiles, fallback behavior, and a host-throughput sanity
check (the packed-cache build is the host-side feed for the TPU)."""

import time

import numpy as np
import pytest

from crosstalk_tpu.data.index import PairIndex
from crosstalk_tpu.data.native_loader import load_pairs_native, native_available
from crosstalk_tpu.data.pipeline import load_tiles

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def test_native_matches_python_synthetic(synthetic_data_dirs):
    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    python_out = load_tiles(index.samples, jobs=2, use_native=False)
    native_out = np.empty_like(python_out)
    assert load_pairs_native(
        [s.mixed_path for s in index.samples],
        [s.source_path for s in index.samples],
        native_out,
        threads=4,
    )
    np.testing.assert_array_equal(python_out, native_out)


def test_native_matches_python_reference(reference_data_dirs):
    mixed_dir, source_dir = reference_data_dirs
    index = PairIndex(mixed_dir, source_dir, max_samples=16)
    python_out = load_tiles(index.samples, jobs=2, use_native=False)
    native_out = load_tiles(index.samples, jobs=8, use_native=True)
    np.testing.assert_array_equal(python_out, native_out)


def test_native_bad_path_falls_back_cleanly(synthetic_data_dirs):
    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    out = np.empty((len(index), 32, 32, 2), dtype=np.float32)
    ok = load_pairs_native(
        ["/does/not/exist.tif"] * len(index),
        [s.source_path for s in index.samples],
        out,
        threads=2,
    )
    assert not ok  # signals fallback; no crash


def test_native_wrong_shape_rejected(synthetic_data_dirs):
    mixed_dir, source_dir = synthetic_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    out = np.empty((len(index), 16, 16, 2), dtype=np.float32)  # wrong H, W
    ok = load_pairs_native(
        [s.mixed_path for s in index.samples],
        [s.source_path for s in index.samples],
        out,
        threads=2,
    )
    assert not ok


def test_native_throughput_floor(reference_data_dirs):
    """Decoding the bundled 100 pairs repeatedly must comfortably exceed the
    Python decoder — and the ~5k tiles/s/chip feed target on this host."""
    mixed_dir, source_dir = reference_data_dirs
    index = PairIndex(mixed_dir, source_dir)
    out = np.empty((100, 256, 256, 2), dtype=np.float32)
    paths_m = [s.mixed_path for s in index.samples]
    paths_s = [s.source_path for s in index.samples]
    assert load_pairs_native(paths_m, paths_s, out, threads=8)  # warm cache
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        assert load_pairs_native(paths_m, paths_s, out, threads=8)
    native_tps = reps * 200 / (time.perf_counter() - t0)
    # measured ~5k tiles/s on this 2-4 core host (48x the Python decoder);
    # floor set with slack for CI noise
    assert native_tps > 2500, f"native decode too slow: {native_tps:.0f} tiles/s"

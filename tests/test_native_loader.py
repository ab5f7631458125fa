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


def _write_two_strip_tiff(path, img):
    """Craft a little-endian baseline TIFF whose 2 strips are NON-contiguous
    and whose StripOffsets tag is two inline SHORTs (ADVICE r1: the inline
    multi-value branch used to push only the first offset, silently decoding
    strip 1 from the gap bytes)."""
    import struct

    h, w = img.shape
    data = img.astype("<f4").tobytes()
    half = len(data) // 2
    strip0_off = 8
    gap = b"\xee" * 64  # garbage the buggy contiguous read would decode
    strip1_off = strip0_off + half + len(gap)
    counts_off = strip1_off + half
    ifd_off = counts_off + 8
    assert strip1_off < 0x10000  # must fit in an inline SHORT

    def tag(tid, ttype, count, value):
        return struct.pack("<HHII", tid, ttype, count, value)

    tags = [
        tag(256, 3, 1, w),                      # ImageWidth
        tag(257, 3, 1, h),                      # ImageLength
        tag(258, 3, 1, 32),                     # BitsPerSample
        tag(259, 3, 1, 1),                      # Compression=none
        tag(273, 3, 2, strip0_off | (strip1_off << 16)),  # inline SHORT x2
        tag(277, 3, 1, 1),                      # SamplesPerPixel
        tag(279, 4, 2, counts_off),             # StripByteCounts out-of-line
        tag(339, 3, 1, 3),                      # SampleFormat=float
    ]
    blob = struct.pack("<2sHI", b"II", 42, ifd_off)
    blob += data[:half] + gap + data[half:]
    blob += struct.pack("<II", half, half)
    blob += struct.pack("<H", len(tags)) + b"".join(tags) + struct.pack("<I", 0)
    with open(path, "wb") as f:
        f.write(blob)


def test_native_inline_multistrip_offsets(tmp_path):
    rng = np.random.default_rng(7)
    mixed = rng.random((32, 32)).astype(np.float32)
    source = rng.random((32, 32)).astype(np.float32)
    mp = str(tmp_path / "image_1_alpha_0.1_mixed.tif")
    sp = str(tmp_path / "image_1_alpha_0.1_source.tif")
    _write_two_strip_tiff(mp, mixed)
    _write_two_strip_tiff(sp, source)
    out = np.empty((1, 32, 32, 2), dtype=np.float32)
    assert load_pairs_native([mp], [sp], out, threads=1)
    np.testing.assert_array_equal(out[0, :, :, 0], mixed)
    np.testing.assert_array_equal(out[0, :, :, 1], source)

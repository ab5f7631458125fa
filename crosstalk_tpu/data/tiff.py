"""TIFF tile IO.

The reference reads tiles with ``imageio.v3.imread(path).astype(np.float32)``
(train_model.py:166-167). The bundled dataset is plain uncompressed
little-endian float64 single-plane TIFF (verified by header inspection), so the
hot path here is a minimal zero-dependency TIFF parser that goes straight from
``bytes`` to a NumPy array — roughly memcpy speed, no plugin dispatch — with
``imageio`` kept as the fallback for any exotic TIFF a user might feed in.

Also provides a writer for the same flavor of TIFF (used by tests to build
synthetic fixtures, and by tooling that exports tiles).
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

# TIFF tag ids we care about.
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_SAMPLE_FORMAT = 339

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4, 11: 4, 12: 8}
_TYPE_FMT = {3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d", 1: "B"}

# (sample_format, bits) -> dtype. sample_format: 1=uint, 2=int, 3=float.
_DTYPES = {
    (1, 8): np.uint8,
    (1, 16): np.uint16,
    (1, 32): np.uint32,
    (2, 8): np.int8,
    (2, 16): np.int16,
    (2, 32): np.int32,
    (3, 32): np.float32,
    (3, 64): np.float64,
}


def _read_tag_values(buf: bytes, entry: bytes, endian: str):
    """Decode one 12-byte IFD entry -> (tag, list_of_values)."""
    tag, typ, count = struct.unpack(endian + "HHI", entry[:8])
    size = _TYPE_SIZES.get(typ)
    fmt = _TYPE_FMT.get(typ)
    if size is None or fmt is None:
        return tag, None
    total = size * count
    if total <= 4:
        raw = entry[8 : 8 + total]
    else:
        (offset,) = struct.unpack(endian + "I", entry[8:12])
        if offset + total > len(buf):
            return tag, None  # out-of-line array past EOF — malformed
        raw = buf[offset : offset + total]
    if len(raw) != total:
        return tag, None
    # count-prefixed format, NOT fmt*count: count is an untrusted uint32 and
    # a repeated-char format string would allocate up to 4 GB for a corrupt tag
    values = struct.unpack(f"{endian}{count}{fmt}", raw)
    return tag, list(values)


def _parse_raw_tiff(buf: bytes) -> Optional[np.ndarray]:
    """Parse a baseline single-plane uncompressed TIFF. None if unsupported
    OR malformed — a truncated/corrupt file must reach the imageio fallback
    (which gives the authoritative error), not raise out of the cache build."""
    try:
        return _parse_raw_tiff_inner(buf)
    except (struct.error, IndexError, ValueError, OverflowError):
        return None


def _parse_raw_tiff_inner(buf: bytes) -> Optional[np.ndarray]:
    if len(buf) < 8:
        return None
    if buf[:2] == b"II":
        endian = "<"
    elif buf[:2] == b"MM":
        endian = ">"
    else:
        return None
    magic, ifd_off = struct.unpack(endian + "HI", buf[2:8])
    if magic != 42:
        return None

    (n_entries,) = struct.unpack(endian + "H", buf[ifd_off : ifd_off + 2])
    tags = {}
    for i in range(n_entries):
        start = ifd_off + 2 + 12 * i
        tag, values = _read_tag_values(buf, buf[start : start + 12], endian)
        if values is not None:
            tags[tag] = values

    if tags.get(_COMPRESSION, [1])[0] != 1:
        return None  # compressed — let imageio handle it
    if tags.get(_SAMPLES_PER_PIXEL, [1])[0] != 1:
        return None  # multi-sample — fallback
    width = tags.get(_IMAGE_WIDTH, [None])[0]
    height = tags.get(_IMAGE_LENGTH, [None])[0]
    offsets = tags.get(_STRIP_OFFSETS)
    counts = tags.get(_STRIP_BYTE_COUNTS)
    if width is None or height is None or offsets is None:
        return None
    bits = tags.get(_BITS_PER_SAMPLE, [1])[0]
    sample_format = tags.get(_SAMPLE_FORMAT, [1])[0]
    dtype = _DTYPES.get((sample_format, bits))
    if dtype is None:
        return None

    expected = width * height * np.dtype(dtype).itemsize
    if counts is None:
        # StripByteCounts missing (or its out-of-line array unreadable):
        # only a single-strip file can be decoded without it. A multi-strip
        # file must NOT zip-truncate to strip 0 — that reads inter-strip
        # bytes as pixels with the right total length; fall back instead.
        if len(offsets) != 1:
            return None
        counts = [expected]
    if len(counts) != len(offsets):
        return None
    if sum(counts) != expected:
        return None

    if len(offsets) == 1:
        data = buf[offsets[0] : offsets[0] + counts[0]]
    else:
        data = b"".join(
            buf[off : off + cnt] for off, cnt in zip(offsets, counts)
        )
    arr = np.frombuffer(data, dtype=np.dtype(dtype).newbyteorder(endian))
    if arr.size != width * height:
        return None
    return arr.reshape(height, width)


def read_tile(path: str, dtype=np.float32) -> np.ndarray:
    """Read a single-plane TIFF tile as ``dtype`` (default float32, matching
    the reference's ``.astype(np.float32)`` at train_model.py:166)."""
    with open(path, "rb") as f:
        buf = f.read()
    arr = _parse_raw_tiff(buf)
    if arr is None:  # exotic TIFF — plugin fallback
        import imageio.v3 as iio

        arr = iio.imread(path)
    return np.asarray(arr, dtype=dtype)


def write_tile(path: str, image: np.ndarray) -> None:
    """Write a single-plane little-endian uncompressed TIFF (the bundled
    dataset's flavor). Supports the dtypes in ``_DTYPES``."""
    image = np.ascontiguousarray(image)
    if image.ndim != 2:
        raise ValueError(f"expected a 2D tile, got shape {image.shape}")
    rev = {v: k for k, v in _DTYPES.items()}
    key = rev.get(image.dtype.type)
    if key is None:
        raise ValueError(f"unsupported dtype {image.dtype}")
    sample_format, bits = key
    height, width = image.shape
    data = image.astype(image.dtype.newbyteorder("<")).tobytes()

    # Layout: 8-byte header | pixel data | IFD.
    data_offset = 8
    ifd_offset = data_offset + len(data)
    entries = [
        (_IMAGE_WIDTH, 4, 1, width),
        (_IMAGE_LENGTH, 4, 1, height),
        (_BITS_PER_SAMPLE, 3, 1, bits),
        (_COMPRESSION, 3, 1, 1),
        (_PHOTOMETRIC, 3, 1, 1),
        (_STRIP_OFFSETS, 4, 1, data_offset),
        (_SAMPLES_PER_PIXEL, 3, 1, 1),
        (_ROWS_PER_STRIP, 4, 1, height),
        (_STRIP_BYTE_COUNTS, 4, 1, len(data)),
        (_SAMPLE_FORMAT, 3, 1, sample_format),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        if typ == 3:
            packed = struct.pack("<H2x", value)
        else:
            packed = struct.pack("<I", value)
        ifd += struct.pack("<HHI", tag, typ, count) + packed
    ifd += struct.pack("<I", 0)  # no next IFD

    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, ifd_offset))
        f.write(data)
        f.write(ifd)

"""ctypes binding for the native C++ tile decoder
(crosstalk_tpu/native/tile_loader.cpp — shipped as package data, so
installed wheels get the fast path too, not just repo checkouts).

Builds the shared library with g++ on first use (cached under
$CROSSTALK_CACHE_DIR or ~/.cache/crosstalk_tpu/native, keyed by a source
hash) and exposes :func:`load_pairs_native`. Anything that fails — no
compiler, exotic TIFF flavor, unexpected shape — falls back to the
pure-Python decoder in pipeline.py, so the native path is strictly an
accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

from crosstalk_tpu.native import SOURCE_PATH as _SOURCE

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _cache_dir() -> str:
    # site-packages is often read-only; a user cache works for installed
    # wheels and checkouts alike (override: CROSSTALK_CACHE_DIR)
    return os.environ.get("CROSSTALK_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "crosstalk_tpu", "native"
    )


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    try:
        with open(_SOURCE, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache_dir = _cache_dir()
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"libtileloader_{digest}.so")
        if not os.path.exists(so_path):
            # pid-unique tmp: two processes cold-building concurrently must
            # not interleave g++ output into one file and promote a corrupt
            # .so into the digest-keyed cache (each replace is then whole)
            tmp = so_path + f".tmp{os.getpid()}.so"
            subprocess.run(
                [
                    "g++", "-O3", "-march=native", "-std=c++17", "-shared",
                    "-fPIC", "-o", tmp, _SOURCE, "-lpthread",
                ],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.crosstalk_load_pairs.restype = ctypes.c_int
        lib.crosstalk_load_pairs.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.crosstalk_load_tile.restype = ctypes.c_int
        lib.crosstalk_load_tile.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        _lib = lib
        return lib
    except Exception:
        _lib_failed = True
        return None


def native_available() -> bool:
    return _build_and_load() is not None


def load_pairs_native(
    mixed_paths: Sequence[str],
    source_paths: Sequence[str],
    out: np.ndarray,
    threads: int = 8,
) -> bool:
    """Decode paired tiles into ``out`` (N, H, W, 2) float32 C-contiguous.
    Returns False (without touching semantics) when the native path can't
    serve this request — caller falls back to Python."""
    lib = _build_and_load()
    if lib is None:
        return False
    n = len(mixed_paths)
    if out.dtype != np.float32 or not out.flags["C_CONTIGUOUS"]:
        return False
    if out.shape[0] != n or out.ndim != 4 or out.shape[-1] != 2:
        return False
    height, width = int(out.shape[1]), int(out.shape[2])

    interleaved = []
    for m, s in zip(mixed_paths, source_paths):
        interleaved.append(m.encode())
        interleaved.append(s.encode())
    arr = (ctypes.c_char_p * (2 * n))(*interleaved)
    failed = ctypes.c_int64(-1)
    rc = lib.crosstalk_load_pairs(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        height,
        width,
        threads,
        ctypes.byref(failed),
    )
    return rc == 0

"""Persistent XLA compilation cache for the CLIs.

TPU compilation of the train/eval programs costs tens of seconds (more in
remote-compile environments); caching compiled executables on disk makes
repeat CLI invocations start in seconds. Safe to enable unconditionally —
the cache key covers program, flags, and compiler version.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "crosstalk_tpu", "xla"
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

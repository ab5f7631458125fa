"""Tracing / profiling / debug utilities (SURVEY.md §5).

The reference's only observability is tqdm bars and prints; here:
  * :func:`maybe_trace` captures a ``jax.profiler`` trace of a code region
    behind a flag (view with TensorBoard or xprof);
  * :func:`enable_debug_checks` turns on jax's NaN/Inf debugging — the
    idiomatic replacement for sanitizers in an XLA-compiled stack;
  * :class:`Throughput` is the tiles/sec counter used by the train loop.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None):
    """Capture a profiler trace of the enclosed region when a dir is given."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"Profiler trace written to {trace_dir}")


def enable_debug_checks() -> None:
    """Fail fast on NaN/Inf anywhere in jitted computations."""
    import jax

    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)


class Throughput:
    """Simple tiles/sec meter."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._tiles = 0

    def add(self, n: int):
        self._tiles += n

    @property
    def tiles_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._tiles / dt if dt > 0 else 0.0

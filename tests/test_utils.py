"""Aux-subsystem tests (SURVEY.md §5): profiler trace capture behind the
--profile flag, NaN fail-fast behind --debug_nans, throughput meter."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crosstalk_tpu.utils.profiling import Throughput, maybe_trace


def test_maybe_trace_writes_a_trace(tmp_path):
    trace_dir = str(tmp_path / "trace")
    with maybe_trace(trace_dir):
        jnp.square(jnp.arange(8.0)).block_until_ready()
    files = [os.path.join(r, f) for r, _, fs in os.walk(trace_dir) for f in fs]
    assert files, "profiler trace directory is empty"


def test_maybe_trace_none_is_noop(tmp_path):
    with maybe_trace(None):
        pass  # no profiler started, nothing written
    assert list(tmp_path.iterdir()) == []


def test_debug_nans_fails_fast():
    from crosstalk_tpu.utils.profiling import enable_debug_checks

    try:
        enable_debug_checks()
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    finally:
        jax.config.update("jax_debug_nans", False)
        jax.config.update("jax_debug_infs", False)


def test_throughput_meter():
    t = Throughput()
    t.add(100)
    assert t.tiles_per_sec > 0
    t.reset()
    assert t.tiles_per_sec == 0.0


def test_progress_wraps_and_preserves_items():
    """The tqdm wrapper (reference UX: train_model.py:416,439) must not
    alter the iterated items and must auto-disable on non-TTY stderr."""
    from crosstalk_tpu.utils.progress import progress

    items = list(progress(iter([1, 2, 3]), desc="Test Set Evaluation", total=3))
    assert items == [1, 2, 3]


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



def test_compilation_cache_writes_entries(tmp_path):
    """enable_compilation_cache (on by default in every CLI) must actually
    persist compiled executables — repeat CLI invocations skip the TPU
    compile. Run in a subprocess so this session's jax config is untouched."""
    import subprocess
    import sys

    cache = str(tmp_path / "xla-cache")
    code = f"""
import jax, jax.numpy as jnp
from crosstalk_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache({cache!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
print(float(jax.jit(lambda x: (jnp.tanh(x @ x) + 0.3211).sum())(jnp.ones((64, 64)))))
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert r.returncode == 0, r.stderr
    assert os.path.isdir(cache)
    entries = os.listdir(cache)
    assert entries, "compilation cache wrote no entries"


def test_compilation_cache_default_dir_under_home(tmp_path):
    import subprocess
    import sys

    code = """
import os, jax
from crosstalk_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
d = jax.config.jax_compilation_cache_dir
assert d and d.startswith(os.path.expanduser("~")), d
assert os.path.isdir(d)
print("ok", d)
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu", HOME=str(tmp_path))
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert r.returncode == 0, r.stderr
    assert "ok" in r.stdout

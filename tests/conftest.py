"""Test configuration.

Two environment quirks are handled here, both before anything imports jax:

1. The ambient environment routes EVERY XLA compilation — including for the
   CPU backend — through the axon remote-compile relay (~50x slower per
   program). Unit tests are CPU-only by design, so pytest re-execs itself
   once with the axon site hooks stripped from PYTHONPATH (the re-exec
   happens in pytest_configure, after stopping output capture so the child's
   output reaches the real stdout).

2. Tests run on CPU with 8 virtual XLA devices so the data-parallel mesh path
   is exercised exactly the way a v5e-8 slice would be, without TPU hardware
   (the standard JAX technique: --xla_force_host_platform_device_count).
"""

import os
import sys

import numpy as np
import pytest

from crosstalk_tpu.data.tiff import write_tile

REFERENCE_DATA = "/root/reference/Training_Data"


def _needs_reexec() -> bool:
    return "axon" in os.environ.get("PYTHONPATH", "") and not os.environ.get(
        "CROSSTALK_TEST_REEXEC"
    )


def pytest_configure(config):
    if _needs_reexec():
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()  # restore the real stdout fds
        env = dict(os.environ)
        # stash the ambient TPU environment before stripping it: the opt-in
        # perf-regression guard (tests/test_perf_guard.py) restores these to
        # run bench.py against the real chip from inside the CPU-only suite
        env.setdefault("CROSSTALK_TPU_PYTHONPATH", env.get("PYTHONPATH", ""))
        env.setdefault(
            "CROSSTALK_TPU_JAX_PLATFORMS", env.get("JAX_PLATFORMS", ""))
        env.setdefault("CROSSTALK_TPU_XLA_FLAGS", env.get("XLA_FLAGS", ""))
        env["PYTHONPATH"] = ":".join(
            p for p in env.get("PYTHONPATH", "").split(":") if p and "axon" not in p
        )
        env["JAX_PLATFORMS"] = "cpu"
        env["CROSSTALK_TEST_REEXEC"] = "1"
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        os.execve(
            sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env
        )

    # (re-exec'd or axon-free environment from here on)
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    # Persistent compilation cache keeps repeat runs fast.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture(scope="session")
def reference_data_dirs():
    """The reference repo's bundled 100-tile dataset, if present."""
    mixed = os.path.join(REFERENCE_DATA, "Mixed")
    source = os.path.join(REFERENCE_DATA, "Source")
    if not (os.path.isdir(mixed) and os.path.isdir(source)):
        pytest.skip("reference Training_Data not available")
    return mixed, source


def make_synthetic_dataset(root, n=12, size=32, seed=0):
    """Create a tiny synthetic paired-tile dataset in the reference's on-disk
    layout (float64 tiles, reference filename schema)."""
    mixed_dir = os.path.join(root, "Mixed")
    source_dir = os.path.join(root, "Source")
    os.makedirs(mixed_dir, exist_ok=True)
    os.makedirs(source_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        image_id = 1000 + i * 7
        alpha = round(float(rng.uniform(0.01, 0.5)), 2)
        source = rng.random((size, size))
        other = rng.random((size, size))
        mixed = other + alpha * source
        name = f"image_{image_id}_alpha_{alpha}"
        write_tile(os.path.join(mixed_dir, f"{name}_mixed.tif"), mixed)
        write_tile(os.path.join(source_dir, f"{name}_source.tif"), source)
    return mixed_dir, source_dir


@pytest.fixture()
def synthetic_data_dirs(tmp_path):
    return make_synthetic_dataset(str(tmp_path))


def torch_golden_by_id(tmodel, mixed_dir, source_dir):
    """{image_id: reference-model prediction} over a dataset dir, applying
    the reference's per-tile min-max normalization. Shared by the CLI tests
    that compare CSV rows against the torch twin."""
    import torch

    from crosstalk_tpu.data.index import PairIndex
    from crosstalk_tpu.data.pipeline import TileStore

    index = PairIndex(mixed_dir, source_dir)
    store = TileStore(index.samples, jobs=1)
    tiles = np.asarray(store.tiles)
    lo = tiles.min(axis=(1, 2), keepdims=True)
    hi = tiles.max(axis=(1, 2), keepdims=True)
    batch = (tiles - lo) / (hi - lo)
    with torch.no_grad():
        golden = tmodel(
            torch.from_numpy(batch.transpose(0, 3, 1, 2))
        ).numpy().ravel()
    return {int(s.image_id): g for s, g in zip(index.samples, golden)}

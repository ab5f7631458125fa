"""Unit tests for parallel/distributed.py helpers (single-process; the
cross-process behavior is covered by tests/test_multihost.py)."""

import numpy as np
import pytest

from crosstalk_tpu.parallel.distributed import (
    allgather_to_host,
    is_primary,
    process_row_slice,
)


def test_process_row_slice_single_process():
    assert is_primary()  # pytest runs as the only process
    assert process_row_slice(16) == slice(0, 16)


def test_process_row_slice_rejects_indivisible(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    with pytest.raises(ValueError, match="divide across 3 processes"):
        process_row_slice(16)
    assert process_row_slice(12) == slice(4, 8)


def test_allgather_to_host_passthrough():
    """Fully-addressable arrays (the single-process case) pass through as
    plain numpy, tree structure preserved."""
    import jax.numpy as jnp

    tree = {"a": jnp.arange(4), "b": (np.ones(2), jnp.zeros(3))}
    out = allgather_to_host(tree)
    np.testing.assert_array_equal(out["a"], np.arange(4))
    np.testing.assert_array_equal(out["b"][0], np.ones(2))
    assert isinstance(out["a"], np.ndarray)

"""Multi-host (multi-process) support.

One JAX process per host, all hosts in one global device mesh: ICI carries
the collectives inside a slice, DCN between slices, and XLA's GSPMD
partitioner addresses the global mesh uniformly — the shard_mapped train
step (train/steps.py) is unchanged. What multi-host adds operationally:

  * ``initialize()`` — join the cluster (jax.distributed). On TPU pods the
    coordinator/process topology comes from the TPU metadata and every
    argument can be None; elsewhere (tests, CPU clusters, GPU) pass
    coordinator/num_processes/process_id explicitly or via the
    ``CROSSTALK_COORDINATOR`` / ``CROSSTALK_NUM_PROCESSES`` /
    ``CROSSTALK_PROCESS_ID`` environment variables.
  * per-process batch assembly — every host copies only ITS rows of each
    global batch's pixels out of its tile cache (``process_row_slice``,
    honored by ``iterate_batches(assemble_rows=...)``) and wraps them as a
    global array (``make_global_batch``); per-batch assembly CPU and
    upload bytes scale with 1/num_processes. (The packed tile CACHE is
    still full-dataset per host — global shuffling draws any sample on any
    host each epoch; the cache is a memmap, so untouched rows cost disk,
    not RAM.)
  * rank gating — artifacts/logs are written by process 0 only
    (``is_primary``); losses returned by the train/val steps are psum/pmean
    reductions over the full mesh, so process 0's view is the global value.

The reference has no distributed code of any kind (SURVEY.md §5); this
subsystem is the TPU-native scaling story for >1 host.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-process cluster (idempotent for single-process runs).

    Must run before any other JAX call binds the backend. On TPU pods all
    three arguments may be None (auto-detected from the TPU metadata);
    explicit values or CROSSTALK_* env vars cover every other transport.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "CROSSTALK_COORDINATOR"
    )
    if num_processes is None and os.environ.get("CROSSTALK_NUM_PROCESSES"):
        num_processes = int(os.environ["CROSSTALK_NUM_PROCESSES"])
    if process_id is None and os.environ.get("CROSSTALK_PROCESS_ID"):
        process_id = int(os.environ["CROSSTALK_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the process that owns artifacts/logging (rank 0)."""
    return jax.process_index() == 0


def process_row_slice(global_batch_size: int) -> slice:
    """This process's contiguous row range of every global batch.

    Row order follows mesh device order: ``data_mesh`` builds the 1-axis
    mesh from ``jax.devices()``, which enumerates each process's devices as
    one contiguous block, so process p owns rows
    [p*local : (p+1)*local] of a batch sharded P('data').
    """
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch size {global_batch_size} must divide across "
            f"{n} processes"
        )
    local = global_batch_size // n
    p = jax.process_index()
    return slice(p * local, (p + 1) * local)


def make_global_batch(sharding, local_rows: np.ndarray, global_rows: int):
    """Wrap this process's rows as a global array sharded over the mesh."""
    return jax.make_array_from_process_local_data(
        sharding,
        np.ascontiguousarray(local_rows),
        (global_rows,) + tuple(local_rows.shape[1:]),
    )


def allgather_to_host(tree):
    """Gather possibly-multihost global arrays to host numpy on every
    process (identity for fully-addressable arrays)."""
    from jax.experimental import multihost_utils

    def _gather(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            return np.asarray(multihost_utils.process_allgather(a, tiled=True))
        return np.asarray(a)

    return jax.tree.map(_gather, tree)

"""Native training checkpoints + resume.

The reference's only durable training state is the best-val ``.pth``
(train_model.py:456-461) — a crash loses the optimizer state and there is no
resume path (SURVEY.md §5). Here every epoch writes a full native checkpoint
(params, batch_stats, optimizer state, step counter, scheduler state, RNG
seed, loss history) and ``--resume <run_dir>`` continues exactly where a run
stopped. The .pth artifacts are still written alongside for reference
interop (io/torch_convert.py).

Format: the TrainState pytree as flax msgpack, with a JSON sidecar for the
host-side scalars. Writes are atomic (tmp + rename) so a kill mid-save never
corrupts either file, and the sidecar carries a digest of the state bytes so
the one remaining window — dying between the two renames — yields a
loud ValueError at resume rather than a silently mismatched state/meta pair.

Why flax msgpack rather than Orbax (the usual TPU choice, SURVEY.md §5):
this workload is single-host with at most ~1.6 GB of state (the 137M-param
model + Adam moments); a synchronous atomic write costs ~1-2 s/epoch worst
case and `--checkpoint_every` amortizes it. Orbax's value — async multi-host
array gathering, sharded checkpoint layouts, version migration — buys
nothing at this scale, and one msgpack file + one JSON sidecar is easier to
inspect and to keep byte-stable. If multi-host training is ever added
(parallel/mesh.py notes the jax.distributed extension), switch to Orbax.
"""

from __future__ import annotations

import copy
import hashlib
import json
import os
import queue
import threading
from typing import Optional, Tuple

from flax import serialization

CKPT_DIR = "checkpoints"
STATE_FILE = "train_state.msgpack"
META_FILE = "train_meta.json"

_TREE_COPY = None  # lazily-built jitted pytree copy (one executable, reused)


def _device_tree_copy(tree):
    global _TREE_COPY
    if _TREE_COPY is None:
        import jax
        import jax.numpy as jnp

        _TREE_COPY = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
    return _TREE_COPY(tree)


def save_checkpoint(run_dir: str, state, meta: dict) -> str:
    """Persist (TrainState pytree, host metadata) atomically.

    Each file write is atomic (tmp + rename), and the pair is made
    tear-evident: ``meta`` records a digest of the state bytes, renamed
    LAST, so a kill between the two renames (new state + stale meta) is
    detected at load instead of silently resuming epoch N's arrays with
    epoch N-k's scheduler/loss history."""
    ckpt_dir = os.path.join(run_dir, CKPT_DIR)
    os.makedirs(ckpt_dir, exist_ok=True)

    state_path = os.path.join(ckpt_dir, STATE_FILE)
    data = serialization.to_bytes(state)
    tmp = state_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, state_path)

    meta = dict(meta)
    meta["state_sha256"] = hashlib.sha256(data).hexdigest()
    meta_path = os.path.join(ckpt_dir, META_FILE)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, meta_path)
    return ckpt_dir


class AsyncCheckpointWriter:
    """Overlap checkpoint D2H + serialization + disk writes with training.

    A synchronous ``save_checkpoint`` blocks the epoch loop for the whole
    device→host fetch + msgpack serialize + disk write (~1-2 s/epoch on a
    real TPU host for the 137M-param state; ~15-45 s/epoch through this dev
    environment's device relay — PERF_NOTES.md) — all of it dead time
    between epochs. This writer hides it: each ``submit_*`` snapshots the
    pytree on device (ONE jitted buffer-copy program — the live training
    buffers, which the next donated train step will overwrite in place, are
    never read again after submit returns) and a background thread performs
    the fetch + serialization + atomic file write while the next epoch
    trains.

    Backpressure: at most ``max_pending`` jobs queue (a snapshot holds at
    most one extra copy of the state in HBM each); a further submit blocks
    until the writer catches up. ``wait()`` blocks until everything
    submitted is durable — call it before reading a checkpoint back or
    returning from the training loop. Writer-thread exceptions re-raise on
    the next submit or wait. File formats and atomicity (tmp + rename) are
    identical to the synchronous functions.
    """

    def __init__(self, max_pending: int = 1):
        # escape hatch (debugging / A-B measurement): CROSSTALK_SYNC_CKPT=1
        # makes every submit_* block until its write is durable, restoring
        # the synchronous behavior with identical artifacts
        self._sync = os.environ.get("CROSSTALK_SYNC_CKPT", "") == "1"
        self._jobs: "queue.Queue" = queue.Queue(maxsize=max_pending)
        self._exc: Optional[BaseException] = None
        self._exc_lock = threading.Lock()
        self._thread = threading.Thread(
            target=self._run, name="ckpt-writer", daemon=True
        )
        self._thread.start()

    # -- worker ----------------------------------------------------------
    def _run(self):
        while True:
            job = self._jobs.get()
            try:
                if job is None:
                    return
                job()
            except BaseException as e:  # surfaced on next submit/wait
                with self._exc_lock:
                    self._exc = e
            finally:
                self._jobs.task_done()

    def _raise_pending(self):
        with self._exc_lock:
            exc, self._exc = self._exc, None
        if exc is not None:
            raise RuntimeError("async checkpoint write failed") from exc

    @staticmethod
    def _snapshot(tree):
        """Copy a pytree of device arrays into fresh device buffers.

        One jitted program (one dispatch, copies every leaf); outputs of a
        non-donated jit never alias its inputs, so the snapshot is immune to
        the train step's in-place (donated) buffer reuse.
        """
        return _device_tree_copy(tree)

    # -- API -------------------------------------------------------------
    def submit_checkpoint(self, run_dir: str, state, meta: dict) -> None:
        """Async ``save_checkpoint``; ``meta`` is deep-copied at call time."""
        self._raise_pending()
        snap = self._snapshot(state)
        meta = copy.deepcopy(meta)
        self._jobs.put(lambda: save_checkpoint(run_dir, snap, meta))
        if self._sync:
            self.wait()

    def submit_pth(self, path: str, variables: dict, variant: str) -> None:
        """Async ``torch_convert.save_pth`` (best-model .pth interop)."""
        from crosstalk_tpu.io.torch_convert import save_pth

        self._raise_pending()
        snap = self._snapshot(variables)
        self._jobs.put(lambda: save_pth(path, snap, variant))
        if self._sync:
            self.wait()

    def wait(self) -> None:
        """Block until every submitted write is durable; raise on failure."""
        self._jobs.join()
        self._raise_pending()

    def close(self, raise_errors: bool = True) -> None:
        """Drain outstanding writes and stop the worker thread."""
        if self._thread.is_alive():
            self._jobs.join()
            self._jobs.put(None)
            self._thread.join()
        if raise_errors:
            self._raise_pending()


def load_checkpoint(run_dir: str, state_template) -> Optional[Tuple[object, dict]]:
    """Restore (state, meta) from a run dir; None if no checkpoint exists.
    ``state_template`` supplies the pytree structure/shapes/dtypes.

    Raises ValueError on a TORN checkpoint (state file and meta from
    different saves — possible only if the process died between the two
    atomic renames in ``save_checkpoint``); resuming it silently would pair
    one epoch's arrays with another's scheduler/loss history."""
    ckpt_dir = os.path.join(run_dir, CKPT_DIR)
    state_path = os.path.join(ckpt_dir, STATE_FILE)
    meta_path = os.path.join(ckpt_dir, META_FILE)
    if not (os.path.exists(state_path) and os.path.exists(meta_path)):
        return None
    with open(state_path, "rb") as f:
        data = f.read()
    with open(meta_path) as f:
        meta = json.load(f)
    expect = meta.get("state_sha256")  # absent in pre-digest checkpoints
    if expect is not None and hashlib.sha256(data).hexdigest() != expect:
        raise ValueError(
            f"torn checkpoint in {ckpt_dir}: {STATE_FILE} does not match "
            f"the digest in {META_FILE} (the run died between the two "
            "checkpoint renames). Delete the checkpoints/ dir to restart "
            "from scratch, or restore a best_model .pth."
        )
    state = serialization.from_bytes(state_template, data)
    return state, meta

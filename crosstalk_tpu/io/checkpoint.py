"""Native training checkpoints + resume.

The reference's only durable training state is the best-val ``.pth``
(train_model.py:456-461) — a crash loses the optimizer state and there is no
resume path (SURVEY.md §5). Here every epoch writes a full native checkpoint
(params, batch_stats, optimizer state, step counter, scheduler state, RNG
seed, loss history) and ``--resume <run_dir>`` continues exactly where a run
stopped. The .pth artifacts are still written alongside for reference
interop (io/torch_convert.py).

Format: ONE file per checkpoint — a small header (magic + meta-JSON length),
the host-side meta as JSON (which embeds a sha256 of the state bytes), then
the TrainState pytree as flax msgpack. The whole unit lands with a single
``os.replace``, so a kill at ANY instant leaves either the old checkpoint or
the new one, never a mix (the round-3 two-file format had a window between
its two renames where resume hard-failed on a state/meta digest mismatch —
caught by the SIGKILL test, VERDICT r03 weak #1). As defense in depth the
previous generation is kept as ``train_ckpt.prev.bin`` and ``load_checkpoint``
falls back to it (with a warning) if the current file is missing or fails its
digest — so even on-disk corruption degrades to "resume from epoch N-1", not
"restart from scratch". The old two-file format is still readable.

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
import struct
import threading
import warnings
from typing import Optional, Tuple

from flax import serialization

CKPT_DIR = "checkpoints"
CKPT_FILE = "train_ckpt.bin"
PREV_FILE = "train_ckpt.prev.bin"
_MAGIC = b"CTPUCKPT1\n"
_LEN = struct.Struct("<Q")
# round-3 two-file format, read-only back-compat for old run dirs
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
    """Persist (TrainState pytree, host metadata) as ONE atomic unit.

    meta + state are written into a single temp file (fsync'd) and land
    with a single ``os.replace`` — a SIGKILL at any instant leaves either
    the previous complete checkpoint or the new complete checkpoint, never
    a torn pair. The generation being replaced is first rotated to
    ``train_ckpt.prev.bin`` (also atomically), giving ``load_checkpoint``
    a durable fallback if the current file is ever corrupted on disk."""
    ckpt_dir = os.path.join(run_dir, CKPT_DIR)
    os.makedirs(ckpt_dir, exist_ok=True)

    data = serialization.to_bytes(state)
    meta = dict(meta)
    meta["state_sha256"] = hashlib.sha256(data).hexdigest()
    meta_bytes = json.dumps(meta).encode("utf-8")

    path = os.path.join(ckpt_dir, CKPT_FILE)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(_LEN.pack(len(meta_bytes)))
        f.write(meta_bytes)
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    if os.path.exists(path):
        # atomic rotate; if we die between these two renames, the current
        # file is momentarily absent but prev holds the same bytes it held,
        # and load_checkpoint falls back to it
        os.replace(path, os.path.join(ckpt_dir, PREV_FILE))
    os.replace(tmp, path)
    return ckpt_dir


def _read_header(f, path: str) -> dict:
    """Parse magic + meta-length + JSON meta from an open file, leaving the
    position at the first state byte. O(KB) I/O regardless of state size."""
    if f.read(len(_MAGIC)) != _MAGIC:
        raise ValueError(f"{path}: not a crosstalk checkpoint (bad magic)")
    raw_len = f.read(_LEN.size)
    if len(raw_len) < _LEN.size:
        raise ValueError(f"{path}: truncated header")
    (meta_len,) = _LEN.unpack(raw_len)
    raw_meta = f.read(meta_len)
    if len(raw_meta) < meta_len:
        raise ValueError(f"{path}: truncated meta block")
    return json.loads(raw_meta.decode("utf-8"))


def _read_ckpt_file(path: str) -> Tuple[dict, bytes]:
    """Parse one single-file checkpoint -> (meta, state_bytes).

    The state is read into ONE buffer (no whole-file read + slice copy —
    that doubled peak host memory on every 1.6 GB two-branch resume).
    Raises ValueError on bad magic, truncation, or state-digest mismatch —
    all impossible via the atomic writer, so any of them means on-disk
    corruption (caller falls back to the previous generation). A file
    truncated inside the state region fails the digest check."""
    with open(path, "rb") as f:
        meta = _read_header(f, path)
        data = f.read()
    expect = meta.get("state_sha256")
    if expect is not None and hashlib.sha256(data).hexdigest() != expect:
        raise ValueError(f"{path}: state bytes do not match the embedded "
                         "digest (on-disk corruption)")
    return meta, data


def _read_ckpt_meta_only(path: str) -> dict:
    """Header + JSON meta only — does NOT read or digest-verify the state
    bytes (that work belongs to ``load_checkpoint``; a meta poll against
    the ~1.6 GB two-branch checkpoint must not read the whole file — the
    training-status watchers poll this every fraction of a second)."""
    with open(path, "rb") as f:
        return _read_header(f, path)


def read_checkpoint_meta(run_dir: str) -> Optional[dict]:
    """Read just the host-side meta of the latest durable checkpoint
    (header + JSON only — no state read, no pytree deserialization).
    None if absent."""
    ckpt_dir = os.path.join(run_dir, CKPT_DIR)
    for name in (CKPT_FILE, PREV_FILE):
        path = os.path.join(ckpt_dir, name)
        try:
            return _read_ckpt_meta_only(path)
        except (OSError, ValueError):
            continue
    meta_path = os.path.join(ckpt_dir, META_FILE)  # legacy two-file format
    try:
        # tolerant like the single-file branches: a corrupt/vanishing legacy
        # sidecar means "no readable meta" to a status poller, not a crash
        # (json.JSONDecodeError is a ValueError; the exists()/open() race
        # shows up as FileNotFoundError)
        with open(meta_path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


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

    Tear-TOLERANT: each checkpoint is one atomic file, so a kill at any
    instant leaves a loadable state; if the current file is missing or
    fails its digest (on-disk corruption — the atomic writer cannot produce
    it), resume falls back to the retained previous generation with a
    warning instead of failing. Raises ValueError only when every present
    generation is unreadable, or a LEGACY two-file checkpoint is torn."""
    ckpt_dir = os.path.join(run_dir, CKPT_DIR)

    errors = []
    for name in (CKPT_FILE, PREV_FILE):
        path = os.path.join(ckpt_dir, name)
        if not os.path.exists(path):
            continue
        try:
            meta, data = _read_ckpt_file(path)
        except (OSError, ValueError) as e:
            # OSError too: an EIO on the current file is exactly the
            # corruption case the previous generation exists for, and the
            # exists()/open() race against the saver's rotate rename shows
            # up as FileNotFoundError
            errors.append(str(e))
            continue
        if name == PREV_FILE:
            warnings.warn(
                f"current checkpoint in {ckpt_dir} is missing or corrupt"
                f"{': ' + errors[0] if errors else ''}; resuming from the "
                f"previous generation (epoch {meta.get('epoch', '?')})",
                stacklevel=2,
            )
        return serialization.from_bytes(state_template, data), meta
    if errors:
        raise ValueError(
            f"every checkpoint generation in {ckpt_dir} is unreadable "
            f"({'; '.join(errors)}). Delete the checkpoints/ dir to restart "
            "from scratch, or restore a best_model .pth."
        )

    # legacy round-3 two-file format (state msgpack + meta sidecar)
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
            f"torn legacy checkpoint in {ckpt_dir}: {STATE_FILE} does not "
            f"match the digest in {META_FILE} (the run died between that "
            "format's two renames). Delete the checkpoints/ dir to restart "
            "from scratch, or restore a best_model .pth."
        )
    state = serialization.from_bytes(state_template, data)
    return state, meta

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
corrupts the latest checkpoint.

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

import json
import os
from typing import Optional, Tuple

from flax import serialization

CKPT_DIR = "checkpoints"
STATE_FILE = "train_state.msgpack"
META_FILE = "train_meta.json"


def save_checkpoint(run_dir: str, state, meta: dict) -> str:
    """Persist (TrainState pytree, host metadata) atomically."""
    ckpt_dir = os.path.join(run_dir, CKPT_DIR)
    os.makedirs(ckpt_dir, exist_ok=True)

    state_path = os.path.join(ckpt_dir, STATE_FILE)
    data = serialization.to_bytes(state)
    tmp = state_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, state_path)

    meta_path = os.path.join(ckpt_dir, META_FILE)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, meta_path)
    return ckpt_dir


def load_checkpoint(run_dir: str, state_template) -> Optional[Tuple[object, dict]]:
    """Restore (state, meta) from a run dir; None if no checkpoint exists.
    ``state_template`` supplies the pytree structure/shapes/dtypes."""
    ckpt_dir = os.path.join(run_dir, CKPT_DIR)
    state_path = os.path.join(ckpt_dir, STATE_FILE)
    meta_path = os.path.join(ckpt_dir, META_FILE)
    if not (os.path.exists(state_path) and os.path.exists(meta_path)):
        return None
    with open(state_path, "rb") as f:
        state = serialization.from_bytes(state_template, f.read())
    with open(meta_path) as f:
        meta = json.load(f)
    return state, meta

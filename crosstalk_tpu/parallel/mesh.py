"""Device-mesh construction.

The workload's only profitable sharding axis is the batch (SURVEY.md §5:
models are 13M/137M params — trivially per-chip — and inputs are fixed
256x256 tiles, so TP/PP/SP are explicit non-goals). A v5e-8 slice is a
1-axis 'data' mesh; gradients/BN stats reduce over ICI via psum inside the
shard_mapped step (train/steps.py).

Multi-host (DCN) extends this via parallel/distributed.py: initialize()
joins the jax.distributed cluster before mesh construction, after which
``data_mesh()`` spans the GLOBAL device set — the shard_map code is
unchanged because GSPMD addresses global devices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def data_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} available"
            )
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def maybe_data_mesh(axis_name: str = "data") -> Optional[Mesh]:
    """A mesh when >1 device is visible, else None (plain single-chip jit)."""
    return data_mesh(axis_name=axis_name) if len(jax.devices()) > 1 else None

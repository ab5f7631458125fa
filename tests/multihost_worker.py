"""Worker process for the multi-host tests (tests/test_multihost.py).

Each worker joins a two-process JAX cluster over localhost (Gloo CPU
collectives), contributes 4 virtual CPU devices to the global 8-device
'data' mesh, and runs one deterministic (augment-free) data-parallel train
step on its half of a fixed global batch. The parent test runs the SAME
step single-process on its own 8-device mesh and asserts the losses and
updated parameters match — multi-host == single-host == (by the suite's
other equivalence test) single-device.

Usage: python multihost_worker.py <rank> <nproc> <port>
"""

import os
import sys

rank, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=rank)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from crosstalk_tpu.config import ModelConfig, OptimConfig  # noqa: E402
from crosstalk_tpu.models import build_model, init_model  # noqa: E402
from crosstalk_tpu.parallel.distributed import (  # noqa: E402
    make_global_batch,
    process_row_slice,
)
from crosstalk_tpu.parallel.mesh import data_mesh  # noqa: E402
from crosstalk_tpu.train.steps import (  # noqa: E402
    batch_sharding,
    init_train_state,
    make_optimizer,
    make_train_step,
    replicate_state,
)

GLOBAL_BATCH = 16

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

cfg = ModelConfig(variant="single", initial_filters=8, num_conv_blocks=3,
                  compute_dtype="f32")
model = build_model(cfg, axis_name="data")
variables = init_model(model, jax.random.key(0), image_size=32)
tx = make_optimizer(OptimConfig())
mesh = data_mesh()  # all 8 global devices
state = replicate_state(init_train_state(model, variables, tx), mesh)
step = make_train_step(model, tx, mesh=mesh, augment=False)

rng = np.random.default_rng(7)
inputs = rng.random((GLOBAL_BATCH, 32, 32, 2)).astype(np.float32)
labels = rng.random((GLOBAL_BATCH, 1)).astype(np.float32)
sharding = batch_sharding(mesh)
sl = process_row_slice(GLOBAL_BATCH)
g_inputs = make_global_batch(sharding, inputs[sl], GLOBAL_BATCH)
g_labels = make_global_batch(sharding, labels[sl], GLOBAL_BATCH)

state, loss = step(state, g_inputs, g_labels, np.float32(1e-3),
                   jax.random.key(1))
checksum = sum(
    float(jnp.sum(jnp.abs(leaf)))
    for leaf in jax.tree_util.tree_leaves(state.params)
)
print(f"RESULT rank={rank} loss={float(loss):.10f} checksum={checksum:.8f}",
      flush=True)

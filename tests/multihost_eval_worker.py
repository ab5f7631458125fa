"""Worker for the multi-host EVALUATION test (tests/test_multihost.py).

Joins a two-process cluster, evaluates a deterministically-initialized
tiny model over a shared on-disk dataset with the mesh-sharded eval path
(inference + classical metrics partitioned across processes, outputs
allgathered), and prints a digest of the full row list — which must be
identical on both ranks AND equal to the parent's single-process result.

Usage: python multihost_eval_worker.py <rank> <nproc> <port> <data_root>
"""

import os
import sys

rank, nproc, port, data_root = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=rank)

import numpy as np  # noqa: E402

from crosstalk_tpu.config import ModelConfig  # noqa: E402
from crosstalk_tpu.data.index import PairIndex  # noqa: E402
from crosstalk_tpu.data.pipeline import TileStore  # noqa: E402
from crosstalk_tpu.eval.engine import evaluate  # noqa: E402
from crosstalk_tpu.models import build_model, init_model  # noqa: E402
from crosstalk_tpu.parallel.mesh import data_mesh  # noqa: E402

cfg = ModelConfig(variant="single", initial_filters=8, num_conv_blocks=3,
                  compute_dtype="f32")
model = build_model(cfg)
variables = init_model(model, jax.random.key(3), image_size=64)

index = PairIndex(os.path.join(data_root, "Mixed"),
                  os.path.join(data_root, "Source"))
store = TileStore(index.samples, jobs=1)
rows, loss = evaluate(model, variables, store, batch_size=8,
                      with_metrics=True, mesh=data_mesh())

digest = np.array(
    [[r["Actual_Label"], r["Predicted_Label"], r["Pearsons Correlation"]]
     for r in rows], np.float64,
).sum(axis=0)
print(f"RESULT rank={rank} n={len(rows)} loss={loss:.10f} "
      f"d0={digest[0]:.8f} d1={digest[1]:.8f} d2={digest[2]:.8f}",
      flush=True)

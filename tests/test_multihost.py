"""Multi-host (multi-process) data parallelism.

Two real OS processes form a JAX cluster over localhost (Gloo CPU
collectives), each contributing 4 virtual devices to one global 8-device
'data' mesh — the CPU-faithful analogue of a 2-host TPU pod slice. The
equivalence chain these tests close: multi-host step == single-process
8-device step (here) == single-device step (test_training.py).
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # the workers provision their own 4-device CPU platform
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return env


# XLA's CPU Gloo transport has a hardcoded ~30s rendezvous timeout; under
# full-suite CPU load a slow-starting rank can miss it. Retry the whole
# pair (with a fresh coordinator port) on that specific signature.
_GLOO_FLAKE = "Gloo context initialization failed"


def _run_pair(make_args, env_for=None, timeout=420, retries=2):
    """Run rank 0 + rank 1 to completion -> (returncodes, stdouts).

    ``make_args(rank, port)`` builds each rank's argv (after the
    interpreter); a fresh port is drawn per attempt."""
    for attempt in range(retries + 1):
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, *make_args(rank, port)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                env=(env_for(rank) if env_for else _worker_env()), cwd=REPO,
            )
            for rank in (0, 1)
        ]
        rcs, outs = [], []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            rcs.append(p.returncode)
            outs.append(out)
        if any(_GLOO_FLAKE in o for o in outs) and attempt < retries:
            continue
        return rcs, outs
    raise AssertionError("unreachable")


def _launch_pair(make_args, env_for=None, timeout=420):
    """_run_pair + assert both ranks succeeded -> list of stdout."""
    rcs, outs = _run_pair(make_args, env_for=env_for, timeout=timeout)
    for rank, (rc, out) in enumerate(zip(rcs, outs)):
        assert rc == 0, f"rank {rank} failed:\n{out}"
    return outs


def test_two_process_step_matches_single_process():
    """The cross-process train step produces the same loss and updated
    params as the identical step on this process's own 8-device mesh."""
    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    outs = _launch_pair(lambda rank, port: [worker, str(rank), "2", str(port)])

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                parts = dict(kv.split("=") for kv in line.split()[1:])
                results[int(parts["rank"])] = (
                    float(parts["loss"]), float(parts["checksum"])
                )
    assert set(results) == {0, 1}, f"missing ranks in outputs: {outs}"
    # both ranks see the same global reduction
    np.testing.assert_allclose(results[0], results[1], rtol=1e-7)

    # golden: the same deterministic step on THIS process's 8-device mesh
    import jax
    import jax.numpy as jnp

    from crosstalk_tpu.config import ModelConfig, OptimConfig
    from crosstalk_tpu.models import build_model, init_model
    from crosstalk_tpu.parallel.mesh import data_mesh
    from crosstalk_tpu.train.steps import (
        batch_sharding,
        init_train_state,
        make_optimizer,
        make_train_step,
        replicate_state,
    )

    cfg = ModelConfig(variant="single", initial_filters=8, num_conv_blocks=3,
                      compute_dtype="f32")
    model = build_model(cfg, axis_name="data")
    variables = init_model(model, jax.random.key(0), image_size=32)
    tx = make_optimizer(OptimConfig())
    mesh = data_mesh(8)
    state = replicate_state(init_train_state(model, variables, tx), mesh)
    step = make_train_step(model, tx, mesh=mesh, augment=False)

    rng = np.random.default_rng(7)
    inputs = rng.random((16, 32, 32, 2)).astype(np.float32)
    labels = rng.random((16, 1)).astype(np.float32)
    sharding = batch_sharding(mesh)
    state, loss = step(
        state, jax.device_put(inputs, sharding), jax.device_put(labels, sharding),
        np.float32(1e-3), jax.random.key(1),
    )
    checksum = sum(
        float(jnp.sum(jnp.abs(leaf)))
        for leaf in jax.tree_util.tree_leaves(state.params)
    )
    np.testing.assert_allclose(results[0][0], float(loss), rtol=1e-6)
    np.testing.assert_allclose(results[0][1], checksum, rtol=1e-6)


def test_two_process_eval_matches_single_process(tmp_path):
    """Mesh-sharded evaluation across 2 processes produces the identical
    row list (predictions + metrics) as single-process evaluation."""
    from tests.conftest import make_synthetic_dataset

    make_synthetic_dataset(str(tmp_path), n=10, size=64, seed=13)
    worker = os.path.join(REPO, "tests", "multihost_eval_worker.py")
    outs = _launch_pair(
        lambda rank, port: [worker, str(rank), "2", str(port), str(tmp_path)]
    )
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                parts = dict(kv.split("=") for kv in line.split()[1:])
                results[int(parts["rank"])] = [
                    float(parts[k]) for k in ("n", "loss", "d0", "d1", "d2")
                ]
    assert set(results) == {0, 1}, f"missing ranks in outputs: {outs}"
    np.testing.assert_allclose(results[0], results[1], rtol=1e-7)

    # golden: single-process eval (padded tail included: 10 rows, batch 8)
    import jax

    from crosstalk_tpu.config import ModelConfig
    from crosstalk_tpu.data.index import PairIndex
    from crosstalk_tpu.data.pipeline import TileStore
    from crosstalk_tpu.eval.engine import evaluate
    from crosstalk_tpu.models import build_model, init_model

    cfg = ModelConfig(variant="single", initial_filters=8, num_conv_blocks=3,
                      compute_dtype="f32")
    model = build_model(cfg)
    variables = init_model(model, jax.random.key(3), image_size=64)
    index = PairIndex(os.path.join(str(tmp_path), "Mixed"),
                      os.path.join(str(tmp_path), "Source"))
    rows, loss = evaluate(model, variables, TileStore(index.samples, jobs=1),
                          batch_size=8, with_metrics=True)
    digest = np.array(
        [[r["Actual_Label"], r["Predicted_Label"], r["Pearsons Correlation"]]
         for r in rows], np.float64,
    ).sum(axis=0)
    np.testing.assert_allclose(
        results[0], [len(rows), loss, *digest], rtol=1e-5
    )


def test_train_cli_two_process(tmp_path):
    """End-to-end: the train CLI run as a 2-process cluster. Rank 0 writes
    the full artifact set; rank 1 writes nothing."""
    from tests.conftest import make_synthetic_dataset

    mixed_dir, source_dir = make_synthetic_dataset(str(tmp_path), n=16,
                                                   size=64, seed=11)
    out0 = tmp_path / "rank0"
    out1 = tmp_path / "rank1"
    out0.mkdir()
    out1.mkdir()

    def env_for(rank):
        env = _worker_env()
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        return env

    def args_for(rank, port):
        return [
            "-m", "crosstalk_tpu.cli.train",
            "-m", mixed_dir, "-s", source_dir, "-b", "8", "-l", "1e-3",
            "-n", "1", "-j", "2", "-o", "single", "-r", "aggressive_plateau",
            # tiny model: cluster formation, rank-0 artifact ownership, and
            # the resume-desync guard are model-size-independent
            "--initial_filters", "8", "--num_conv_blocks", "3",
            "--compute_dtype", "f32", "--seed", "5",
            "--output_base", str(out0 if rank == 0 else out1),
            "--multihost", "--coordinator_address", f"localhost:{port}",
            "--num_processes", "2", "--process_id", str(rank),
        ]

    outs = _launch_pair(args_for, env_for=env_for)
    assert "2 processes" in outs[0]

    run_dirs = list(out0.glob("training_run_*"))
    assert len(run_dirs) == 1, "rank 0 must create exactly one run dir"
    run_dir = run_dirs[0]
    for artifact in ("params.txt", "model_architecture.txt",
                     "best_model_plateau.pth"):
        assert (run_dir / artifact).exists(), f"missing {artifact}"
    assert list(run_dir.glob("training_log_*.csv"))
    assert list(run_dir.glob("crosstalk_regression_model_trained_*.pth"))
    assert list(out1.iterdir()) == [], "rank 1 must write no artifacts"

    # ---- resume-desync guard: rank 1 resumes from a dir with NO checkpoint
    # (simulating a non-shared filesystem) -> both ranks must fail loudly
    # instead of silently training from mismatched states
    empty_dir = out1 / "training_run_fake"
    empty_dir.mkdir()

    def resume_args(rank, port):
        return [
            "-m", "crosstalk_tpu.cli.train",
            "-m", mixed_dir, "-s", source_dir, "-n", "2",
            "-j", "2", "-o", "single",
            "--output_base", str(out0 if rank == 0 else out1),
            "--resume", str(run_dir if rank == 0 else empty_dir),
            "--multihost", "--coordinator_address", f"localhost:{port}",
            "--num_processes", "2", "--process_id", str(rank),
        ]

    rcs, outs = _run_pair(resume_args, env_for=env_for)
    assert all(rc != 0 for rc in rcs), (
        f"desynced resume must fail on every rank: {list(zip(rcs, outs))}"
    )
    assert any("resume desync" in out for out in outs), outs

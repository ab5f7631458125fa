"""Training-engine tests: optimizer parity with torch Adam, single- and
multi-device steps, and the end-to-end train CLI with its artifact contract
(the reference's implicit round-trip + our smoke-train strategy, SURVEY.md §4).
"""

import csv
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from crosstalk_tpu.config import ModelConfig, OptimConfig
from crosstalk_tpu.models import build_model, init_model
from crosstalk_tpu.train.steps import (
    init_train_state,
    make_optimizer,
    make_train_step,
    make_val_step,
)
from tests.conftest import make_synthetic_dataset

SMALL = ModelConfig(variant="single", initial_filters=8, num_conv_blocks=3,
                    compute_dtype="f32")


def test_optimizer_matches_torch_adam():
    """optax chain(add_decayed_weights, scale_by_adam) applied as
    p -= lr*u must track torch.optim.Adam(lr, weight_decay) exactly."""
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]
    lr, wd = 1e-3, 1e-4

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g.copy())
        topt.step()

    cfg = OptimConfig(learning_rate=lr, weight_decay=wd)
    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray(p0)}
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree.map(lambda p, u: p - lr * u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), atol=1e-6
    )


def _make_state(model, seed=0, image=32):
    variables = init_model(model, jax.random.key(seed), image_size=image)
    tx = make_optimizer(OptimConfig())
    return init_train_state(model, variables, tx), tx


def test_single_device_train_step_learns():
    model = build_model(SMALL)
    state, tx = _make_state(model)
    step = make_train_step(model, tx)
    rng = np.random.default_rng(1)
    base = rng.random((8, 32, 32, 1)).astype(np.float32)
    alpha = rng.uniform(0.0, 0.5, size=(8, 1)).astype(np.float32)
    mixed = rng.random((8, 32, 32, 1)).astype(np.float32) + alpha[:, :, None, None] * base
    inputs = np.concatenate([mixed, base], axis=-1)

    losses = []
    for i in range(30):
        state, loss = step(state, jnp.asarray(inputs), jnp.asarray(alpha),
                           np.float32(1e-3), jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5  # it learns the toy mapping
    assert int(state.step) == 30


def test_multi_device_train_step():
    """The shard_mapped 8-device step runs, reduces, and keeps the state
    replicated and consistent."""
    from crosstalk_tpu.parallel.mesh import data_mesh
    from crosstalk_tpu.train.steps import batch_sharding, replicate_state

    mesh = data_mesh(8)
    model = build_model(SMALL, axis_name="data")
    state, tx = _make_state(build_model(SMALL))  # init without collectives
    state = replicate_state(state, mesh)
    step = make_train_step(model, tx, mesh=mesh)

    rng = np.random.default_rng(2)
    inputs = rng.random((16, 32, 32, 2)).astype(np.float32)
    labels = rng.uniform(0, 0.5, (16, 1)).astype(np.float32)
    sharding = batch_sharding(mesh)
    inputs_d = jax.device_put(jnp.asarray(inputs), sharding)
    labels_d = jax.device_put(jnp.asarray(labels), sharding)

    p_before = np.asarray(jax.tree.leaves(state.params)[0])
    state, loss = step(state, inputs_d, labels_d, np.float32(1e-3), jax.random.key(0))
    assert np.isfinite(float(loss))
    p_after = np.asarray(jax.tree.leaves(state.params)[0])
    assert not np.allclose(p_before, p_after)

    # replicated output: every device shard of a param is identical
    leaf = jax.tree.leaves(state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

    # val step reduces over the mesh
    val = make_val_step(model, mesh=mesh)
    sq, n = val(state.params, state.batch_stats, inputs_d, labels_d,
                jax.device_put(jnp.ones((16,)), sharding))
    assert float(n) == 16.0 and np.isfinite(float(sq))


def test_bf16_train_step_is_finite():
    """Regression: the bf16 (default-dtype) train step must produce finite
    losses. BatchNorm's E[x^2]-E[x]^2 used to square in bf16 before the f32
    accumulation; the ~0.4% per-element squaring error exceeded the true
    batch variance for post-LeakyReLU (mostly-positive) activations, the
    computed variance went negative, and rsqrt returned NaN on step 0."""
    # the full-width model is required to reproduce: narrow test configs
    # don't push E[x]^2 high enough relative to the batch variance
    cfg = ModelConfig(variant="single", compute_dtype="bf16")
    model = build_model(cfg)
    state, tx = _make_state(model, seed=0, image=64)
    step = make_train_step(model, tx)
    rng = np.random.default_rng(0)
    x = rng.random((4, 64, 64, 2)).astype(np.float32)
    y = rng.uniform(0, 0.5, (4, 1)).astype(np.float32)
    for i in range(3):
        state, loss = step(state, jnp.asarray(x), jnp.asarray(y),
                           np.float32(1e-4), jax.random.key(i))
        assert np.isfinite(float(loss)), f"non-finite bf16 loss at step {i}"


def test_multi_device_step_numerically_matches_single_device():
    """The 8-device shard_mapped step (psum-synced BN, pmean grads/loss)
    matches a 1-device step on the identical global batch — the
    'single-device-equivalent semantics' claim in steps.py made numeric.

    Augmentation is off (augment=False) and dropout is 0 so both paths are
    deterministic functions of the batch. The optimizer is an identity
    transform, so new_params = p - lr*grad and the param diff IS the
    gradient diff scaled by lr: this pins gradient equality through the
    real step code. (Adam itself is excluded on purpose: its first-step
    g/(|g|+eps) direction flips sign under f32 reduction-order noise
    wherever the true gradient is ~0, e.g. BN-shift-invariant biases —
    that ill-conditioning is inherent, not a sharding bug.)"""
    import optax

    from crosstalk_tpu.parallel.mesh import data_mesh
    from crosstalk_tpu.train.steps import (
        batch_sharding,
        init_train_state,
        replicate_state,
    )

    cfg = ModelConfig(variant="single", initial_filters=8, num_conv_blocks=3,
                      compute_dtype="f32", dropout_single=0.0)
    mesh = data_mesh(8)
    model1 = build_model(cfg)
    modelN = build_model(cfg, axis_name="data")
    tx = optax.identity()
    variables = init_model(model1, jax.random.key(4), image_size=32)
    state = init_train_state(model1, variables, tx)
    # the step donates its state argument — give each path its own copy
    state1 = jax.tree.map(lambda x: jnp.array(x, copy=True), state)
    stateN = replicate_state(
        jax.tree.map(lambda x: jnp.array(x, copy=True), state), mesh)

    step1 = make_train_step(model1, tx, augment=False)
    stepN = make_train_step(modelN, tx, mesh=mesh, augment=False)
    sharding = batch_sharding(mesh)

    rng = np.random.default_rng(5)
    for i in range(2):
        inputs = rng.random((16, 32, 32, 2)).astype(np.float32)
        labels = rng.uniform(0, 0.5, (16, 1)).astype(np.float32)
        state1, loss1 = step1(state1, jnp.asarray(inputs), jnp.asarray(labels),
                              np.float32(1e-3), jax.random.key(i))
        stateN, lossN = stepN(
            stateN, jax.device_put(jnp.asarray(inputs), sharding),
            jax.device_put(jnp.asarray(labels), sharding),
            np.float32(1e-3), jax.random.key(i),
        )
        # f32 reduction-order noise only (shard-mean + pmean vs global mean)
        np.testing.assert_allclose(float(loss1), float(lossN), rtol=1e-4)

    # params: |diff| = lr * |grad_1 - grad_N| -> gradient agreement to ~1e-4
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-7),
        state1.params, stateN.params,
    )
    # psum-synced BN running stats == global-batch running stats
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        state1.batch_stats, stateN.batch_stats,
    )
    assert int(state1.step) == int(stateN.step) == 2


def test_multi_device_train_step_two_branch():
    """The two-branch model's shard_mapped step: psum-synced BN in both
    branches + the big fused head run and keep the state replicated.
    (Exact 1-vs-8-device equality is not expected: augmentation RNG is
    deliberately decorrelated per shard via fold_in(axis_index).)"""
    from crosstalk_tpu.parallel.mesh import data_mesh
    from crosstalk_tpu.train.steps import batch_sharding, replicate_state

    tiny = ModelConfig(variant="double", initial_filters_per_branch=4,
                       compute_dtype="f32")
    mesh = data_mesh(8)
    model = build_model(tiny, axis_name="data")
    state, tx = _make_state(build_model(tiny))
    rng = np.random.default_rng(3)
    inputs = rng.random((16, 32, 32, 2)).astype(np.float32)
    labels = rng.uniform(0, 0.5, (16, 1)).astype(np.float32)

    # snapshot before the step: donation may consume the aliased buffers
    init_stats = np.asarray(jax.tree.leaves(state.batch_stats)[0]).copy()
    stateN = replicate_state(state, mesh)
    stepN = make_train_step(model, tx, mesh=mesh)
    sharding = batch_sharding(mesh)
    stateN, lossN = stepN(
        stateN, jax.device_put(jnp.asarray(inputs), sharding),
        jax.device_put(jnp.asarray(labels), sharding),
        np.float32(1e-3), jax.random.key(0),
    )
    assert np.isfinite(float(lossN))
    # params and psum-synced batch stats stay replicated across all shards
    for leaf in (jax.tree.leaves(stateN.params)[0],
                 jax.tree.leaves(stateN.batch_stats)[0]):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)
    # batch stats actually moved off their init values
    bn_mean = np.asarray(jax.tree.leaves(stateN.batch_stats)[0])
    assert not np.allclose(bn_mean, init_stats)


def test_val_step_masked_math():
    """Padded (mask=0) samples must not contribute to the val sum/count, and
    the masked result over a ragged tail must equal the plain mean."""
    model = build_model(SMALL)
    state, _ = _make_state(model)
    val = make_val_step(model)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((6, 32, 32, 2)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 0.5, (6, 1)).astype(np.float32))

    full = np.asarray(
        val(state.params, state.batch_stats, x, y, jnp.ones((6,)))
    )
    # pad 2 garbage samples with mask 0: identical (sq_sum, count)
    xp = jnp.concatenate([x, jnp.full((2, 32, 32, 2), 1e6, jnp.float32)])
    yp = jnp.concatenate([y, jnp.full((2, 1), -9.0, jnp.float32)])
    mask = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], jnp.float32)
    padded = np.asarray(val(state.params, state.batch_stats, xp, yp, mask))
    assert padded[1] == 6.0
    np.testing.assert_allclose(padded[0], full[0], rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    """save_checkpoint/load_checkpoint restore the exact pytree + metadata."""
    from crosstalk_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    model = build_model(SMALL)
    state, _ = _make_state(model)
    meta = {"epoch": 3, "global_step": 12, "best_val_loss": 0.5,
            "epochs_without_improvement": 1, "train_losses": [1.0, 0.9],
            "val_losses": [1.1, 0.8], "lr_history": [1e-4, 1e-4],
            "schedule": {"epoch": 2, "plateau": {"lr": 1e-4, "best": 0.8,
                                                 "num_bad_epochs": 0}}}
    save_checkpoint(str(tmp_path), state, meta)

    template, _ = _make_state(model, seed=1)  # different values, same tree
    restored = load_checkpoint(str(tmp_path), template)
    assert restored is not None
    rstate, rmeta = restored
    rmeta.pop("state_sha256")  # added by save_checkpoint (tear detection)
    assert rmeta == meta
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(rstate.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(rstate.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert load_checkpoint(str(tmp_path / "nope"), template) is None


def test_async_checkpoint_writer_matches_sync(tmp_path):
    """AsyncCheckpointWriter writes the identical artifacts to the sync
    functions, snapshots decouple from later state mutation, and writer
    errors surface on wait()."""
    from crosstalk_tpu.io.checkpoint import (
        AsyncCheckpointWriter, load_checkpoint, save_checkpoint,
    )

    model = build_model(SMALL)
    state, _ = _make_state(model)
    meta = {"epoch": 1, "global_step": 4, "best_val_loss": 0.7,
            "epochs_without_improvement": 0, "train_losses": [1.0],
            "val_losses": [1.1], "lr_history": [1e-4],
            "schedule": {"epoch": 1}}

    sync_dir, async_dir = tmp_path / "sync", tmp_path / "async"
    sync_dir.mkdir(), async_dir.mkdir()
    save_checkpoint(str(sync_dir), state, meta)

    writer = AsyncCheckpointWriter()
    try:
        writer.submit_checkpoint(str(async_dir), state, meta)
        # the snapshot must be a fresh buffer, not an alias of the live
        # state (the next donated train step overwrites the live one); and
        # mutating the submitted meta after the call must not leak in
        meta["train_losses"].append(999.0)
        writer.wait()
    finally:
        writer.close(raise_errors=False)

    sync_bytes = (sync_dir / "checkpoints" / "train_ckpt.bin").read_bytes()
    async_bytes = (async_dir / "checkpoints" / "train_ckpt.bin").read_bytes()
    assert sync_bytes == async_bytes
    template, _ = _make_state(model, seed=1)
    _, rmeta = load_checkpoint(str(async_dir), template)
    assert rmeta["train_losses"] == [1.0]  # deep-copied at submit time

    # snapshot leaves live in distinct buffers from the source state
    from crosstalk_tpu.io.checkpoint import _device_tree_copy
    snap = _device_tree_copy(state)
    src = jax.tree.leaves(state.params)[0]
    dst = jax.tree.leaves(snap.params)[0]
    assert src.unsafe_buffer_pointer() != dst.unsafe_buffer_pointer()

    # error propagation: run_dir path collides with an existing FILE
    bad = tmp_path / "not_a_dir"
    bad.write_text("x")
    writer2 = AsyncCheckpointWriter()
    try:
        writer2.submit_checkpoint(str(bad), state, meta)
        with pytest.raises(RuntimeError, match="async checkpoint write failed"):
            writer2.wait()
    finally:
        writer2.close(raise_errors=False)


def test_async_writer_sync_escape_hatch(tmp_path, monkeypatch):
    """CROSSTALK_SYNC_CKPT=1 makes submit_* durable before returning."""
    from crosstalk_tpu.io.checkpoint import (
        AsyncCheckpointWriter, load_checkpoint,
    )

    monkeypatch.setenv("CROSSTALK_SYNC_CKPT", "1")
    model = build_model(SMALL)
    state, _ = _make_state(model)
    meta = {"epoch": 1, "global_step": 1, "best_val_loss": 1.0,
            "epochs_without_improvement": 0, "train_losses": [1.0],
            "val_losses": [1.0], "lr_history": [1e-4], "schedule": {}}
    writer = AsyncCheckpointWriter()
    try:
        writer.submit_checkpoint(str(tmp_path), state, meta)
        # durable NOW, with no wait() call
        template, _ = _make_state(model, seed=1)
        assert load_checkpoint(str(tmp_path), template) is not None
    finally:
        writer.close(raise_errors=False)


def test_async_checkpoint_writer_pth(tmp_path):
    """submit_pth produces a .pth byte-loadable by torch with the submitted
    (not later-mutated) parameter values."""
    import torch

    from crosstalk_tpu.io.checkpoint import AsyncCheckpointWriter

    model = build_model(SMALL)
    state, _ = _make_state(model)
    expect = np.asarray(jax.tree.leaves(state.params)[0])

    writer = AsyncCheckpointWriter()
    try:
        writer.submit_pth(
            str(tmp_path / "best.pth"),
            {"params": state.params, "batch_stats": state.batch_stats},
            "single",
        )
        writer.wait()
    finally:
        writer.close(raise_errors=False)

    sd = torch.load(str(tmp_path / "best.pth"), map_location="cpu")
    assert any(k.endswith("weight") for k in sd)
    # at least one tensor carries the submitted values (conv kernel, OIHW
    # in torch vs HWIO here — compare via sorted bytes to stay layout-proof)
    flat = np.sort(expect, axis=None)
    match = any(
        v.numel() == flat.size
        and np.allclose(np.sort(v.numpy(), axis=None), flat)
        for v in sd.values()
    )
    assert match


def test_training_log_resume_trims_crashed_rows(tmp_path):
    """Resume keeps rows <= the restored epoch and drops later (pre-crash)
    rows; a fresh log still writes the 4 metadata rows + header."""
    from crosstalk_tpu.io.artifacts import TrainingLog

    log = TrainingLog(str(tmp_path), "ts1", 8, 1e-3, "onecycle", {"a": 1})
    for e in range(1, 5):  # epochs 1-4 logged; pretend checkpoint is at 2
        log.log_epoch(e, 1.0 / e, 2.0 / e, 1e-3)
    log.close()

    log2 = TrainingLog(str(tmp_path), "ts1", 8, 1e-3, "onecycle", {"a": 1},
                       resume_from_epoch=2)
    log2.log_epoch(3, 0.3, 0.4, 1e-3)
    log2.close()
    with open(log2.path) as f:
        rows = list(csv.reader(f))
    assert rows[4] == ["epoch", "train_loss", "val_loss", "learning_rate"]
    assert [r[0] for r in rows[5:]] == ["1", "2", "3"]
    assert rows[7][1] == "0.3"  # the re-trained epoch 3 row, not the old one


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    """One small end-to-end CLI training run shared by the contract tests."""
    from crosstalk_tpu.cli.train import main as train_main

    root = tmp_path_factory.mktemp("train_cli")
    mixed_dir, source_dir = make_synthetic_dataset(str(root), n=24, size=64, seed=5)
    out_base = str(root / "runs")
    os.makedirs(out_base, exist_ok=True)
    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-b", "8", "-l", "1e-3", "-n", "3",
        "-j", "2", "-o", "single", "-r", "onecycle",
        "--compute_dtype", "f32", "--output_base", out_base, "--num_devices", "1",
    ])
    assert rc == 0
    (run_dir,) = glob.glob(os.path.join(out_base, "training_run_*"))
    return root, mixed_dir, source_dir, out_base, run_dir


def test_train_cli_artifact_contract(trained_run):
    _, _, _, _, run_dir = trained_run
    base = os.path.basename(run_dir)
    assert base.startswith("training_run_") and "_B8_LR0.001" in base

    assert os.path.exists(os.path.join(run_dir, "params.txt"))
    assert os.path.exists(os.path.join(run_dir, "model_architecture.txt"))
    assert os.path.exists(os.path.join(run_dir, "best_model_onecycle.pth"))
    assert os.path.exists(os.path.join(run_dir, "lr_schedule_onecycle.png"))
    assert glob.glob(os.path.join(run_dir, "crosstalk_regression_model_trained_*_8_0.001.pth"))
    assert glob.glob(os.path.join(run_dir, "training_validation_loss_*_8_0.001.png"))

    logs = glob.glob(os.path.join(run_dir, "training_log_*_8_0.001_onecycle.csv"))
    assert len(logs) == 1
    with open(logs[0]) as f:
        rows = list(csv.reader(f))
    assert rows[0][0] == "Learning Rate"
    assert rows[4] == ["epoch", "train_loss", "val_loss", "learning_rate"]
    assert len(rows) == 5 + 3  # 3 epochs

    for split in ("test", "train", "val"):
        (pred,) = glob.glob(os.path.join(run_dir, f"{split}_predictions_*_8_0.001.csv"))
        with open(pred) as f:
            r = list(csv.DictReader(f))
        assert list(r[0].keys()) == ["Actual_Label", "Predicted_Label"]
        assert glob.glob(os.path.join(run_dir, f"{split}_predictions_plot_*.png"))


def test_trained_pth_loads_in_torch(trained_run):
    """The final checkpoint is genuinely consumable by the reference stack."""
    from tests.torch_ref import TorchSingle

    _, _, _, _, run_dir = trained_run
    (path,) = glob.glob(
        os.path.join(run_dir, "crosstalk_regression_model_trained_*.pth")
    )
    sd = torch.load(path, map_location="cpu", weights_only=True)
    tmodel = TorchSingle(image_size=64)
    tmodel.load_state_dict(sd)  # strict
    tmodel.eval()
    with torch.no_grad():
        out = tmodel(torch.zeros(2, 2, 64, 64))
    assert out.shape == (2, 1)


def test_resume_without_checkpoints_fails_cleanly(trained_run, tmp_path,
                                                  capsys):
    """--resume on a dir with params.txt but no checkpoints must fail with
    a clean error, NOT silently retrain from epoch 0 (which would truncate
    the original log CSV and overwrite the run's artifacts)."""
    from crosstalk_tpu.cli.train import main as train_main

    import shutil

    _, mixed_dir, source_dir, _, run_dir = trained_run
    fake = tmp_path / "training_run_fake_B8_LR0.001"
    fake.mkdir()
    shutil.copy(os.path.join(run_dir, "params.txt"), fake / "params.txt")
    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-n", "5",
        "-j", "2", "-o", "single", "--output_base", str(tmp_path),
        "--num_devices", "1", "--resume", str(fake),
    ])
    assert rc == 1
    assert "no checkpoints under" in capsys.readouterr().out


def test_resume_continues(trained_run):
    from crosstalk_tpu.cli.train import main as train_main

    _, mixed_dir, source_dir, out_base, run_dir = trained_run
    with open(os.path.join(run_dir, "params.txt")) as f:
        original_params = f.read()
    # deliberately OMIT -b/-l/-r (and pass a different dtype default target):
    # resume must adopt the original run's hyperparameters from params.txt —
    # otherwise the log filename forks and the schedule silently changes
    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-n", "5",
        "-j", "2", "-o", "single",
        "--output_base", out_base,
        "--num_devices", "1", "--resume", run_dir,
    ])
    assert rc == 0
    # params.txt is the original run's hyperparameter record — resume must
    # not overwrite it; the resume invocation goes to params_resume.txt
    with open(os.path.join(run_dir, "params.txt")) as f:
        assert f.read() == original_params
    assert os.path.exists(os.path.join(run_dir, "params_resume.txt"))
    # the resumed run continues the SAME log: epochs 1-3 from the original
    # run are preserved and 4-5 appended (a truncating resume would break
    # analyse_training_results' min-loss computation)
    logs = sorted(glob.glob(os.path.join(run_dir, "training_log_*.csv")),
                  key=os.path.getmtime)
    with open(logs[-1]) as f:
        rows = list(csv.reader(f))
    assert rows[4] == ["epoch", "train_loss", "val_loss", "learning_rate"]
    epochs = [int(r[0]) for r in rows[5:]]
    assert epochs == [1, 2, 3, 4, 5]


def test_train_cli_multi_device_smoke(tmp_path):
    """Full CLI on the virtual 8-device CPU mesh: data-parallel end to end."""
    from crosstalk_tpu.cli.train import main as train_main

    mixed_dir, source_dir = make_synthetic_dataset(str(tmp_path), n=16, size=64, seed=6)
    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-b", "8", "-l", "1e-3", "-n", "1",
        "-j", "2", "-o", "single", "-r", "aggressive_plateau",
        "--compute_dtype", "f32", "--output_base", str(tmp_path), "--num_devices", "8",
    ])
    assert rc == 0
    (run_dir,) = glob.glob(os.path.join(str(tmp_path), "training_run_*"))
    assert os.path.exists(os.path.join(run_dir, "best_model_plateau.pth"))


@pytest.mark.parametrize("variant", ["single", "double"])
def test_train_cli_multi_device_epoch_scale_matches_single_device(
        tmp_path, variant):
    """Epoch-scale DP equivalence: the FULL train CLI on the virtual
    8-device mesh vs 1 device — same seed, f32, `--dropout 0`, augmentation
    ON (flips are layout-invariant by construction: per-global-example RNG,
    see paired_random_flips; dropout masks are the one irreducibly
    layout-bound draw, hence pinned to 0 here — dropout-ON DP training is
    validated statistically by
    test_train_cli_dropout_on_dp_equivalence_statistical). Asserts the
    COMPOSED
    multi-device training semantics over 6 epochs — psum-synced BN running
    stats + per-example augmentation + masked val + Adam + onecycle —
    not just the step-t=1 equivalence of
    test_multi_device_step_numerically_matches_single_device: per-epoch
    train/val CSV losses track within f32 reduction-order tolerance and
    the final .pths agree.

    Tolerances, measured and explained: per-epoch CSV losses agree to
    ~1e-4 relative (asserted at 2e-3). Final-model *predictions* agree to
    ~1e-3 (asserted at 3e-3). Individual parameters carry one inherent
    looseness: Adam's bias-corrected first-step update is g/|g| — a full
    ±lr regardless of |g| — so any component whose true gradient sits
    below f32 reduction-order noise gets a layout-dependent coin-flip
    sign and the two runs random-walk that component apart, bounded by
    2·Σ_t lr_t (~2.4e-2 for this schedule; such components barely affect
    the function, which is exactly why their gradients are ~0 — hence the
    tight prediction agreement). Verified non-Adam: the identical 12-step
    run under optax.identity keeps every parameter within 6e-6
    (test_multi_device_step_numerically_matches_single_device pins the
    gradient agreement itself).

    Matches /root/reference/train_model.py:415-461 (the loop whose
    semantics data parallelism must preserve)."""
    import csv

    import torch

    from crosstalk_tpu.cli.train import main as train_main

    mixed_dir, source_dir = make_synthetic_dataset(str(tmp_path), n=64, size=32, seed=12)
    size_flags = (["--initial_filters", "8", "--num_conv_blocks", "3"]
                  if variant == "single" else ["--initial_filters", "4"])
    n_epochs = 6 if variant == "single" else 4
    run_dirs = {}
    for n_dev in (1, 8):
        base = os.path.join(str(tmp_path), f"d{n_dev}")
        rc = train_main([
            "-m", mixed_dir, "-s", source_dir, "-b", "16", "-l", "1e-3",
            "-n", str(n_epochs), "-j", "2", "-o", variant, "-r", "onecycle",
            "--compute_dtype", "f32", "--dropout", "0",
            *size_flags,
            "--output_base", base, "--num_devices", str(n_dev),
        ])
        assert rc == 0
        (run_dirs[n_dev],) = glob.glob(os.path.join(base, "training_run_*"))

    def epochs(run_dir):
        (log,) = glob.glob(os.path.join(run_dir, "training_log_*.csv"))
        with open(log, newline="") as f:
            rows = list(csv.reader(f))
        head = rows.index(["epoch", "train_loss", "val_loss", "learning_rate"])
        return [(float(r[1]), float(r[2])) for r in rows[head + 1:]]

    e1, e8 = epochs(run_dirs[1]), epochs(run_dirs[8])
    assert len(e1) == len(e8) == n_epochs
    for (t1, v1), (t8, v8) in zip(e1, e8):
        # f32 reduction-order noise only (shard-mean+pmean vs global mean),
        # compounded through 6 epochs of Adam
        np.testing.assert_allclose(t1, t8, rtol=2e-3)
        np.testing.assert_allclose(v1, v8, rtol=2e-3)

    def final_sd(run_dir):
        (pth,) = glob.glob(
            os.path.join(run_dir, "crosstalk_regression_model_trained_*.pth"))
        return torch.load(pth, map_location="cpu", weights_only=True)

    sd1, sd8 = final_sd(run_dirs[1]), final_sd(run_dirs[8])
    assert sd1.keys() == sd8.keys()
    for k in sd1:
        if not sd1[k].dtype.is_floating_point:
            np.testing.assert_array_equal(sd1[k].numpy(), sd8[k].numpy())
            continue
        np.testing.assert_allclose(
            sd1[k].numpy(), sd8[k].numpy(), atol=5e-2,
            err_msg=f"final .pth disagrees at {k} beyond the 2*sum(lr) "
                    "Adam sign-flip random-walk bound (see docstring)")

    # the sharp functional pin: the final models are the same function
    for split in ("train", "val", "test"):
        preds = {}
        for n_dev, run_dir in run_dirs.items():
            (f,) = glob.glob(
                os.path.join(run_dir, f"{split}_predictions_*.csv"))
            with open(f, newline="") as fh:
                rows = list(csv.DictReader(fh))
            preds[n_dev] = np.array(
                [float(r["Predicted_Label"]) for r in rows])
        np.testing.assert_allclose(preds[1], preds[8], atol=3e-3,
                                   err_msg=f"{split} predictions diverged")


@pytest.mark.skipif(
    not os.environ.get("CROSSTALK_RUN_SLOW"),
    reason="12 short CLI trainings (~minutes of CPU conv); "
           "set CROSSTALK_RUN_SLOW=1 to run",
)
def test_train_cli_dropout_on_dp_equivalence_statistical(tmp_path):
    """Dropout-ON DP equivalence, statistically — the deliberate
    complement to test_train_cli_multi_device_epoch_scale_matches_single_device,
    which pins `--dropout 0` because dropout masks are the one irreducibly
    layout-bound draw (whole-activation shapes depend on the shard batch;
    shards fold their axis index into the key — train/steps.py
    rngs_and_offset). With dropout at the reference default (0.1,
    regression_model.py:39,44, ON in the reference's training
    train_model.py:419-424) the 1-device and 8-device runs are therefore
    DIFFERENT random draws of the same training distribution — bitwise
    comparison is meaningless, so the claim is statistical: over K seeds,
    the final-val-loss populations of the two layouts must be
    indistinguishable (Mann-Whitney rank-sum), and their seed-paired
    differences must sit inside the population spread. A real DP-semantics
    bug (dropout applied per-replica at the wrong rate, unsynced BN,
    mis-scaled grads) shifts every 8-device run systematically and fails
    both checks."""
    import csv

    from scipy.stats import mannwhitneyu

    from crosstalk_tpu.cli.train import main as train_main

    mixed_dir, source_dir = make_synthetic_dataset(
        str(tmp_path), n=64, size=32, seed=12)
    seeds = [43, 101, 211, 307, 401, 503]
    finals = {1: [], 8: []}
    for seed in seeds:
        for n_dev in (1, 8):
            base = os.path.join(str(tmp_path), f"s{seed}_d{n_dev}")
            rc = train_main([
                "-m", mixed_dir, "-s", source_dir, "-b", "16", "-l", "1e-3",
                "-n", "3", "-j", "2", "-o", "single", "-r", "onecycle",
                "--compute_dtype", "f32", "--seed", str(seed),
                "--initial_filters", "8", "--num_conv_blocks", "3",
                "--output_base", base, "--num_devices", str(n_dev),
            ])
            assert rc == 0
            (run_dir,) = glob.glob(os.path.join(base, "training_run_*"))
            (log,) = glob.glob(os.path.join(run_dir, "training_log_*.csv"))
            with open(log, newline="") as f:
                rows = list(csv.reader(f))
            head = rows.index(
                ["epoch", "train_loss", "val_loss", "learning_rate"])
            finals[n_dev].append(float(rows[head + 1:][-1][2]))

    a, b = np.array(finals[1]), np.array(finals[8])
    # population check: the layouts draw from one distribution. 6-vs-6
    # complete separation gives p=0.002; a systematic shift fails this.
    p = mannwhitneyu(a, b, alternative="two-sided").pvalue
    assert p > 0.02, (
        f"1-dev vs 8-dev dropout-on val losses separate (p={p:.4f}): "
        f"{a} vs {b}")
    # paired check: per-seed layout differences stay inside the seed-to-
    # seed spread (dropout-draw noise, not a layout offset)
    spread = max(a.std(), b.std(), 1e-9)
    assert abs((a - b).mean()) < 2.0 * spread, (
        f"systematic layout offset {np.mean(a - b):.3e} vs seed spread "
        f"{spread:.3e}")


def test_train_cli_custom_model_size_roundtrip(tmp_path):
    """--initial_filters/--num_conv_blocks (extension flags): train a
    custom-width/depth model end to end, strict-load the final .pth into
    the same-sized torch twin (the converter is structure-derived, so any
    size round-trips), and score it with the eval CLI given matching
    flags."""
    import torch

    from tests.conftest import make_synthetic_dataset
    from tests.torch_ref import TorchSingle
    from crosstalk_tpu.cli.evaluate import main as eval_main
    from crosstalk_tpu.cli.train import main as train_main

    mixed_dir, source_dir = make_synthetic_dataset(str(tmp_path), n=10,
                                                   size=32, seed=17)
    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-b", "4", "-l", "1e-3",
        "-n", "1", "-j", "2", "-o", "single", "-r", "aggressive_plateau",
        "--compute_dtype", "f32", "--output_base", str(tmp_path),
        "--num_devices", "1",
        "--initial_filters", "8", "--num_conv_blocks", "3",
    ])
    assert rc == 0
    (run_dir,) = glob.glob(os.path.join(str(tmp_path), "training_run_*"))
    (pth,) = glob.glob(os.path.join(
        run_dir, "crosstalk_regression_model_trained_*.pth"))

    # strict-load into the same-sized torch architecture
    tmodel = TorchSingle(initial_filters=8, num_blocks=3, image_size=32)
    sd = torch.load(pth, map_location="cpu", weights_only=True)
    tmodel.load_state_dict(sd, strict=True)

    # eval CLI auto-detects the custom size from the checkpoint (no flags)
    rc = eval_main([
        "-m", mixed_dir, "-s", source_dir, "-p", pth, "-o", "single",
        "--batch_size", "4", "--num_devices", "1",
        "--output_base", str(tmp_path),
    ])
    assert rc == 0
    # a mismatched size flag is a clear error, not a jit shape traceback
    rc = eval_main([
        "-m", mixed_dir, "-s", source_dir, "-p", pth, "-o", "single",
        "--initial_filters", "16", "--batch_size", "4",
        "--num_devices", "1", "--output_base", str(tmp_path),
    ])
    assert rc == 1
    # depth override rejected outright for the double model
    assert eval_main(["-p", pth, "-o", "double", "--num_conv_blocks", "3"]) == 1


def test_train_cli_small_batch_rounds_up_to_mesh(tmp_path):
    """-b smaller than the device count must round UP to one sample per
    device, not down to zero (which divided by zero in the loop)."""
    from crosstalk_tpu.cli.train import main as train_main

    mixed_dir, source_dir = make_synthetic_dataset(str(tmp_path), n=16, size=64, seed=9)
    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-b", "4", "-l", "1e-3", "-n", "1",
        "-j", "2", "-o", "single", "-r", "aggressive_plateau",
        "--compute_dtype", "f32", "--output_base", str(tmp_path),
        "--num_devices", "8",
        # tiny model: batch-rounding vs the mesh is size-independent
        "--initial_filters", "8", "--num_conv_blocks", "3",
    ])
    assert rc == 0


def test_sigkill_mid_training_then_resume(tmp_path):
    """Failure recovery proof: SIGKILL the training process mid-run (no
    cleanup, no atexit), then --resume must continue from the last durable
    checkpoint and finish with the complete artifact set and a gapless log.
    Each checkpoint is one atomic file (single os.replace) with the previous
    generation retained, so a kill at ANY instant leaves a loadable state —
    the random-instant stress proof is test_checkpoint_kill_any_instant."""
    import signal
    import subprocess
    import sys
    import time

    from tests.conftest import make_synthetic_dataset

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mixed_dir, source_dir = make_synthetic_dataset(str(tmp_path), n=16,
                                                   size=64, seed=21)
    argv = [
        sys.executable, "-m", "crosstalk_tpu.cli.train",
        "-m", mixed_dir, "-s", source_dir, "-b", "8", "-l", "1e-3",
        "-n", "6", "-j", "2", "-o", "single", "-r", "aggressive_plateau",
        "--compute_dtype", "f32", "--output_base", str(tmp_path),
        "--num_devices", "1",
        # small model: recovery semantics (atomic checkpoints, resume,
        # gapless log) are size-independent, and the resume below omits
        # these flags on purpose — adoption from params.txt must restore
        # them or the checkpoint cannot load
        "--initial_filters", "8", "--num_conv_blocks", "3",
    ]
    proc = subprocess.Popen(argv, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, cwd=repo)
    # wait for a durable checkpoint at epoch >= 2, then kill -9
    from crosstalk_tpu.io.checkpoint import read_checkpoint_meta

    run_dir_watch = None
    deadline = time.monotonic() + 300
    killed_at = None
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            raise AssertionError(
                f"training exited before it could be killed:\n"
                f"{proc.stdout.read()}"
            )
        if run_dir_watch is None:
            runs = glob.glob(os.path.join(str(tmp_path), "training_run_*"))
            run_dir_watch = runs[0] if runs else None
        if run_dir_watch:
            meta = read_checkpoint_meta(run_dir_watch)
            if meta is not None and meta.get("epoch", 0) >= 2:
                proc.send_signal(signal.SIGKILL)
                killed_at = meta["epoch"]
                break
        time.sleep(0.5)
    assert killed_at is not None, "never saw an epoch-2 checkpoint"
    proc.wait(timeout=60)
    assert proc.returncode != 0  # SIGKILL, nothing graceful

    (run_dir,) = glob.glob(os.path.join(str(tmp_path), "training_run_*"))
    from crosstalk_tpu.cli.train import main as train_main

    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-n", "6", "-j", "2",
        "-o", "single", "--output_base", str(tmp_path),
        "--num_devices", "1", "--resume", run_dir,
    ])
    assert rc == 0
    # complete artifact set from the resumed run
    assert glob.glob(os.path.join(run_dir,
                                  "crosstalk_regression_model_trained_*.pth"))
    assert os.path.exists(os.path.join(run_dir, "best_model_plateau.pth"))
    # the training log is gapless: epochs 1..6 exactly once each
    (log_csv,) = glob.glob(os.path.join(run_dir, "training_log_*.csv"))
    with open(log_csv) as f:
        lines = f.read().splitlines()
    epochs = [int(line.split(",")[0]) for line in lines[5:] if line]
    assert epochs == list(range(1, 7)), epochs


def test_train_cli_double_cosine_warmup_e2e(tmp_path):
    """BASELINE config 4's exact shape at CLI level: `-o double -r
    cosine_warmup` (reference train_model.py:534-535 with the scheduler at
    :356-365). Asserts the full artifact contract under the reference's
    'custom_warmup' scheduler-type naming, and strict-loads the final .pth
    into the reference's real SimplifiedTwoBranchRegressionModel
    (two_branch_regression.py:59-100). Small data (64px) keeps the 137M-param
    shape family testable; the architecture path is identical to config 4.
    """
    import importlib.util

    from crosstalk_tpu.cli.train import main as train_main

    mixed_dir, source_dir = make_synthetic_dataset(
        str(tmp_path), n=12, size=64, seed=9)
    out_base = str(tmp_path / "runs")
    os.makedirs(out_base)
    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-b", "4", "-l", "1e-3", "-n", "2",
        "-j", "2", "-o", "double", "-r", "cosine_warmup",
        "--compute_dtype", "f32", "--output_base", out_base,
        "--num_devices", "1",
    ])
    assert rc == 0
    (run_dir,) = glob.glob(os.path.join(out_base, "training_run_*"))

    # artifact contract under the reference's 'custom_warmup' type naming
    assert os.path.exists(
        os.path.join(run_dir, "best_model_custom_warmup.pth"))
    assert os.path.exists(
        os.path.join(run_dir, "lr_schedule_custom_warmup.png"))
    (log,) = glob.glob(
        os.path.join(run_dir, "training_log_*_4_0.001_custom_warmup.csv"))
    with open(log) as f:
        rows = list(csv.reader(f))
    assert rows[4] == ["epoch", "train_loss", "val_loss", "learning_rate"]
    assert len(rows) == 5 + 2

    # the final checkpoint strict-loads into the reference's REAL module
    ref_path = "/root/reference/two_branch_regression.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference snapshot not mounted")
    spec = importlib.util.spec_from_file_location("ref_two_branch", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    (final,) = glob.glob(
        os.path.join(run_dir, "crosstalk_regression_model_trained_*.pth"))
    sd = torch.load(final, map_location="cpu", weights_only=True)
    tmodel = ref.SimplifiedTwoBranchRegressionModel(
        initial_filters_per_branch=64, input_image_size=(64, 64))
    tmodel.load_state_dict(sd)  # strict
    tmodel.eval()
    with torch.no_grad():
        out = tmodel(torch.rand(2, 2, 64, 64)).numpy()
    assert out.shape == (2, 1)
    assert (out >= 0).all() and (out <= 0.5).all()  # sigmoid * 0.5 head


def test_train_cli_rejects_nonpositive_numeric_flags(capsys):
    """-b 0 / -n 0 / -l <= 0 / --checkpoint_every 0 are clear startup
    errors, not ZeroDivisionError tracebacks deep in the run (found by
    adversarial CLI probing)."""
    from crosstalk_tpu.cli.train import main as train_main

    for flags, name in (
        (["-b", "0"], "--batch_size"),
        (["-n", "0"], "--num_epochs"),
        (["-l", "-0.1"], "--learning_rate"),
        (["--checkpoint_every", "0"], "--checkpoint_every"),
    ):
        assert train_main(["-m", "M", "-s", "S"] + flags) == 1
        assert f"{name} must be positive" in capsys.readouterr().out


def test_eval_cli_rejects_nonpositive_batch(capsys):
    from crosstalk_tpu.cli.evaluate import main as eval_main

    assert eval_main(["-m", "M", "-s", "S", "-p", "x.pth",
                      "--batch_size", "0"]) == 1
    assert "--batch_size must be positive" in capsys.readouterr().out


def test_train_cli_quickstart_bootstraps_sample_dataset(tmp_path, monkeypatch):
    """A fresh clone's zero-flag `python train_model.py` must work: when both
    data flags are at their defaults and ./Training_Data is absent, the CLI
    generates the 100-pair sample set (the reference's bundled Training_Data
    equivalent) and trains on it. Shrunk generation (12 pairs, 32px) keeps
    the test fast; the trigger logic and the train-on-generated-data path are
    the real thing."""
    import crosstalk_tpu.data.synthetic as synthetic
    from crosstalk_tpu.cli.train import main as train_main

    real_generate = synthetic.generate_dataset
    calls = {}

    def small_generate(out_dir, num_pairs=100, size=256, seed=0, **kw):
        calls["args"] = (num_pairs, size, seed)
        return real_generate(out_dir, num_pairs=12, size=64, seed=seed,
                             progress_every=0)

    monkeypatch.setattr(synthetic, "generate_dataset", small_generate)
    monkeypatch.chdir(tmp_path)
    rc = train_main([
        "-b", "4", "-n", "1", "-o", "single", "-r", "aggressive_plateau",
        "--compute_dtype", "f32", "--num_devices", "1",
    ])
    assert rc == 0
    assert calls["args"] == (100, 256, 0)  # the real quickstart parameters
    assert len(list((tmp_path / "Training_Data" / "Mixed").glob("*.tif"))) == 12
    assert len(list((tmp_path / "Training_Data" / "Source").glob("*.tif"))) == 12
    assert list(tmp_path.glob("training_run_*"))

    # a second zero-flag run reuses the dataset (no regeneration)
    def fail_generate(*a, **kw):
        raise AssertionError("dataset regenerated despite existing")

    monkeypatch.setattr(synthetic, "generate_dataset", fail_generate)
    rc = train_main([
        "-b", "4", "-n", "1", "-o", "single", "-r", "aggressive_plateau",
        "--compute_dtype", "f32", "--num_devices", "1",
    ])
    assert rc == 0


@pytest.mark.skipif(
    not os.environ.get("CROSSTALK_RUN_SLOW"),
    reason="minutes of CPU conv compute; set CROSSTALK_RUN_SLOW=1 to run",
)
def test_convergence_beats_predict_the_mean_baseline():
    """The framework fits the REAL task — alpha regression on paired tiles
    through the full pipeline semantics (per-tile min-max normalization,
    MSE + coupled-L2 Adam, onecycle schedule) — to far below the
    predict-the-mean baseline: test MSE must land under 0.3x the label
    variance (measured profile reaches ~0.07x by epoch 30; see
    TRAINING_RESULTS.md for the full-config receipts on TPU). 64px tiles
    with block=2 blob granularity give the same analytic identifiability
    floor (~1.5e-3) as the 256px production shape while staying CPU-sized.
    Receipt for SURVEY §4's 'statistical sanity' strategy at test level.
    """
    import time

    import jax.numpy as jnp

    from crosstalk_tpu.data.index import PairIndex
    from crosstalk_tpu.data.pipeline import TileStore
    from crosstalk_tpu.data.synthetic import generate_dataset
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.train.schedules import Schedule

    import tempfile

    root = tempfile.mkdtemp(prefix="crosstalk_conv_")
    generate_dataset(root, num_pairs=600, size=64, seed=11, block=2,
                     progress_every=0)
    store = TileStore(
        PairIndex(os.path.join(root, "Mixed"),
                  os.path.join(root, "Source")).samples, jobs=1)
    tiles, labels = store.tiles, store.labels
    n = len(store)
    n_train = int(0.8 * n)
    perm = np.random.default_rng(0).permutation(n)
    tr, te = perm[:n_train], perm[n_train:]
    label_var = float(np.var(labels[te]))

    cfg = ModelConfig(variant="single", initial_filters=16,
                      num_conv_blocks=4, compute_dtype="f32",
                      dropout_single=0.0)
    model = build_model(cfg)
    variables = init_model(model, jax.random.key(0), image_size=64)
    optim_cfg = OptimConfig(learning_rate=5e-4, scheduler="onecycle")
    tx = make_optimizer(optim_cfg)
    state = init_train_state(model, variables, tx)
    step = make_train_step(model, tx)

    bs, epochs = 32, 30
    steps_per_epoch = n_train // bs
    sched = Schedule(optim_cfg, epochs, steps_per_epoch)
    g = 0
    rng = np.random.default_rng(1)
    for _ in range(epochs):
        order = rng.permutation(n_train)
        for s in range(steps_per_epoch):
            b = np.sort(tr[order[s * bs:(s + 1) * bs]])
            state, _ = step(
                state, jnp.asarray(tiles[b]), jnp.asarray(labels[b]),
                np.float32(sched.lr_for_step(g)),
                jax.random.fold_in(jax.random.key(2), g))
            g += 1

    preds = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        normalize_batch_nhwc(jnp.asarray(tiles[te])), train=False)
    test_mse = float(np.mean((np.asarray(preds) - labels[te]) ** 2))
    assert test_mse < 0.3 * label_var, (
        f"test MSE {test_mse:.4f} does not beat predict-the-mean "
        f"(label variance {label_var:.4f}) by the required margin")


def test_corrupt_checkpoint_falls_back_to_previous_generation(tmp_path):
    """Checkpoints are tear-TOLERANT (round-3 verdict weak #1): each save is
    one atomic file and the previous generation is retained, so a corrupted
    or missing current file degrades to 'resume from epoch N-1 with a
    warning' — never a hard failure while any durable generation exists."""
    import warnings as warnings_mod

    import jax.numpy as jnp

    from crosstalk_tpu.io.checkpoint import (
        CKPT_DIR, CKPT_FILE, PREV_FILE, load_checkpoint,
        read_checkpoint_meta, save_checkpoint,
    )

    run_dir = str(tmp_path)
    template = {"w": jnp.zeros(4)}
    save_checkpoint(run_dir, {"w": jnp.arange(4.0)}, {"epoch": 1})
    save_checkpoint(run_dir, {"w": jnp.arange(4.0) + 1}, {"epoch": 2})
    got, meta = load_checkpoint(run_dir, template)
    assert meta["epoch"] == 2 and "state_sha256" in meta
    assert read_checkpoint_meta(run_dir)["epoch"] == 2

    ckpt = os.path.join(run_dir, CKPT_DIR, CKPT_FILE)
    prev = os.path.join(run_dir, CKPT_DIR, PREV_FILE)
    assert os.path.exists(prev)

    # corrupt the current file in place -> fall back to epoch 1, loudly
    blob = bytearray(open(ckpt, "rb").read())
    blob[-1] ^= 0xFF
    with open(ckpt, "wb") as f:
        f.write(bytes(blob))
    with pytest.warns(UserWarning, match="previous generation"):
        got, meta = load_checkpoint(run_dir, template)
    assert meta["epoch"] == 1
    np.testing.assert_array_equal(np.asarray(got["w"]), np.arange(4.0))

    # current file missing entirely (the rotate-then-replace window)
    os.remove(ckpt)
    with warnings_mod.catch_warnings():
        warnings_mod.simplefilter("ignore")
        got, meta = load_checkpoint(run_dir, template)
    assert meta["epoch"] == 1

    # every generation unreadable -> a loud, actionable error
    with open(ckpt, "wb") as f:
        f.write(b"garbage")
    with open(prev, "wb") as f:
        f.write(b"garbage")
    with pytest.raises(ValueError, match="unreadable"):
        load_checkpoint(run_dir, template)


def test_checkpoint_reader_corruption_fuzz(tmp_path):
    """Exhaustive-ish corruption fuzz of the checkpoint read path: for
    truncations at boundaries and random offsets, plus random bit flips in
    every region (magic, length, meta JSON, state bytes), the contract is
    - load_checkpoint: previous-generation fallback while one generation is
      readable, ValueError when none is — NEVER any other exception type;
    - read_checkpoint_meta: a dict or None — NEVER an exception."""
    import jax.numpy as jnp

    from crosstalk_tpu.io.checkpoint import (
        CKPT_DIR, CKPT_FILE, PREV_FILE, load_checkpoint,
        read_checkpoint_meta, save_checkpoint,
    )

    run_dir = str(tmp_path)
    template = {"w": jnp.zeros(64)}
    save_checkpoint(run_dir, {"w": jnp.arange(64.0)}, {"epoch": 1})
    save_checkpoint(run_dir, {"w": jnp.arange(64.0) + 1}, {"epoch": 2})
    ckpt = os.path.join(run_dir, CKPT_DIR, CKPT_FILE)
    prev = os.path.join(run_dir, CKPT_DIR, PREV_FILE)
    good = open(ckpt, "rb").read()
    good_prev = open(prev, "rb").read()

    def restore():
        with open(ckpt, "wb") as f:
            f.write(good)
        with open(prev, "wb") as f:
            f.write(good_prev)

    rng = np.random.default_rng(4)
    # boundary truncations (empty, mid-magic, mid-length, meta edge) plus
    # random cut points, and bit flips at random offsets
    cuts = [0, 3, len(b"CTPUCKPT1\n"), len(b"CTPUCKPT1\n") + 4,
            len(good) - 1] + sorted(rng.integers(1, len(good), 12).tolist())
    for cut in cuts:
        restore()
        with open(ckpt, "wb") as f:
            f.write(good[:cut])
        meta = read_checkpoint_meta(run_dir)
        assert meta is None or isinstance(meta, dict)
        got, meta = load_checkpoint(run_dir, template)  # prev still good
        assert meta["epoch"] == 1
    for off in rng.integers(0, len(good), 16).tolist():
        restore()
        blob = bytearray(good)
        blob[off] ^= 0xFF
        with open(ckpt, "wb") as f:
            f.write(bytes(blob))
        meta = read_checkpoint_meta(run_dir)
        assert meta is None or isinstance(meta, dict)
        try:
            got, meta = load_checkpoint(run_dir, template)
        except ValueError:
            # possible only when the flip lands in prev too — it can't here
            raise AssertionError("fallback generation was not used")
        # a flip inside the meta JSON may corrupt recorded fields while the
        # digest (of state bytes only) still passes — epoch is then arbitrary,
        # but the STATE must deserialize; flips elsewhere fall back to prev
        assert np.asarray(got["w"]).shape == (64,)
    # both generations corrupted in the state region -> loud ValueError
    restore()
    for path, blob in ((ckpt, good), (prev, good_prev)):
        b = bytearray(blob)
        b[-1] ^= 0xFF
        with open(path, "wb") as f:
            f.write(bytes(b))
    with pytest.raises(ValueError, match="unreadable"):
        load_checkpoint(run_dir, template)
    assert read_checkpoint_meta(run_dir) is not None  # meta itself is intact


def test_checkpoint_kill_any_instant(tmp_path):
    """Random-instant SIGKILL stress: a writer process saves checkpoints in
    a tight loop; the parent kills it at a random moment, repeatedly. After
    EVERY kill, load_checkpoint must return a consistent (state, meta) pair
    — the state array's value equals the meta epoch — proving the docstring
    claim 'a kill at ANY instant leaves a loadable state'. Set
    CROSSTALK_RUN_SLOW=1 for the 12-kill tier."""
    import random
    import signal
    import subprocess
    import sys
    import time
    import warnings as warnings_mod

    import numpy as np

    from crosstalk_tpu.io.checkpoint import (
        load_checkpoint, read_checkpoint_meta,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    writer_src = (
        "import sys, numpy as np\n"
        "from crosstalk_tpu.io.checkpoint import save_checkpoint\n"
        "run_dir, epoch = sys.argv[1], 0\n"
        "while True:\n"
        "    epoch += 1\n"
        "    state = {'w': np.full((4096,), float(epoch), np.float32)}\n"
        "    save_checkpoint(run_dir, state, {'epoch': epoch})\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"

    kills = 12 if os.environ.get("CROSSTALK_RUN_SLOW") else 4
    rng = random.Random(1234)
    template = {"w": np.zeros((4096,), np.float32)}
    for i in range(kills):
        run_dir = str(tmp_path / f"run{i}")
        os.makedirs(run_dir)
        proc = subprocess.Popen(
            [sys.executable, "-c", writer_src, run_dir],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env,
        )
        try:
            deadline = time.monotonic() + 120
            while read_checkpoint_meta(run_dir) is None:
                assert proc.poll() is None, "writer died before first save"
                assert time.monotonic() < deadline, "no checkpoint in 120 s"
                time.sleep(0.02)
            # let it churn through saves, then kill at a random instant
            time.sleep(rng.uniform(0.01, 0.8))
            proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=30)
        finally:
            if proc.poll() is None:
                proc.kill()
        with warnings_mod.catch_warnings():
            # falling back to generation N-1 is an allowed outcome
            warnings_mod.simplefilter("ignore")
            restored = load_checkpoint(run_dir, template)
        assert restored is not None, f"kill {i}: no loadable checkpoint"
        state, meta = restored
        w = np.asarray(state["w"])
        assert np.all(w == float(meta["epoch"])), (
            f"kill {i}: state (epoch {w[0]}) and meta (epoch "
            f"{meta['epoch']}) are from different saves"
        )


# ---------------------------------------------------------------------------
# Gradient accumulation (--grad_accum, extension — the reference's loop
# train_model.py:419-424 has no equivalent)
# ---------------------------------------------------------------------------

def test_grad_accum_step_matches_manual_microbatch_loop():
    """The grad_accum=2 compiled step is bitwise the semantics it documents:
    N sequential microbatch forward/backward passes (each normalized by its
    OWN BatchNorm batch stats, running stats threaded through), the mean
    gradient applied in ONE optimizer step, and layout-invariant
    augmentation (each example's flip drawn from its global batch index).

    Identity optimizer so the param diff IS lr x the gradient diff — with
    Adam, elements whose true gradient is ~0 (BN-shadowed biases) flip
    their unit-magnitude first-step direction under f32 scan-vs-eager
    reduction-order noise (same rationale as the 8-device equivalence
    test above); Adam itself is pinned by the torch-accumulation
    trajectory test below."""
    import optax

    from crosstalk_tpu.data.transforms import prepare_train_batch

    cfg = ModelConfig(variant="single", initial_filters=8, num_conv_blocks=3,
                      compute_dtype="f32", dropout_single=0.0)
    model = build_model(cfg)
    tx = optax.identity()
    variables = init_model(model, jax.random.key(11), image_size=32)
    state = init_train_state(model, variables, tx)
    state_manual = jax.tree.map(lambda x: jnp.array(x, copy=True), state)

    rng = np.random.default_rng(12)
    inputs = (rng.random((8, 32, 32, 2)) * 1800 + 100).astype(np.float32)
    labels = rng.uniform(0, 0.5, (8, 1)).astype(np.float32)
    lr = np.float32(1e-3)
    step_rng = jax.random.key(9)

    accum_step = make_train_step(model, tx, grad_accum=2)
    new_state, loss = accum_step(
        state, jnp.asarray(inputs), jnp.asarray(labels), lr, step_rng)

    # manual loop: same rng derivation as the step (split -> aug/dropout)
    aug_rng, dropout_rng = jax.random.split(step_rng)
    micro = 4
    stats = state_manual.batch_stats
    grad_sum = jax.tree.map(jnp.zeros_like, state_manual.params)
    loss_sum = 0.0
    for i in range(2):
        xb = jnp.asarray(inputs[i * micro:(i + 1) * micro])
        yb = jnp.asarray(labels[i * micro:(i + 1) * micro])
        batch = prepare_train_batch(aug_rng, xb, augment=True,
                                    index_offset=i * micro)

        def loss_fn(params, stats=stats, batch=batch, yb=yb, i=i):
            preds, mut = model.apply(
                {"params": params, "batch_stats": stats}, batch,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(dropout_rng, i)})
            return jnp.mean(jnp.square(preds - yb)), mut["batch_stats"]

        (l, stats), g = jax.value_and_grad(loss_fn, has_aux=True)(
            state_manual.params)
        grad_sum = jax.tree.map(jnp.add, grad_sum, g)
        loss_sum += float(l)
    grads = jax.tree.map(lambda g: g / 2, grad_sum)
    updates, _ = tx.update(grads, state_manual.opt_state, state_manual.params)
    manual_params = jax.tree.map(
        lambda p, u: p - lr * u, state_manual.params, updates)

    np.testing.assert_allclose(float(loss), loss_sum / 2, rtol=1e-4)
    for jp, mp in zip(jax.tree.leaves(new_state.params),
                      jax.tree.leaves(manual_params)):
        np.testing.assert_allclose(np.asarray(jp), np.asarray(mp), atol=2e-6)
    for js, ms in zip(jax.tree.leaves(new_state.batch_stats),
                      jax.tree.leaves(stats)):
        np.testing.assert_allclose(np.asarray(js), np.asarray(ms), atol=1e-6)
    assert int(new_state.step) == 1  # one optimizer step, not grad_accum


def test_grad_accum_multi_device_matches_single_device():
    """grad_accum composes with the DP mesh: the 8-device grad_accum=2 step
    equals a 1-device grad_accum=2 step whose batch rows are reordered to
    the sharded microbatch grouping (microbatch j on the mesh is the union
    over shards s of rows s*S + [j*m, (j+1)*m) — psum-synced BN makes each
    scan iteration one global microbatch). Identity optimizer so the param
    diff pins gradient equality; augment off so both paths are
    deterministic functions of the rows."""
    import optax

    from crosstalk_tpu.parallel.mesh import data_mesh
    from crosstalk_tpu.train.steps import batch_sharding, replicate_state

    cfg = ModelConfig(variant="single", initial_filters=8, num_conv_blocks=3,
                      compute_dtype="f32", dropout_single=0.0)
    mesh = data_mesh(8)
    model1 = build_model(cfg)
    modelN = build_model(cfg, axis_name="data")
    tx = optax.identity()
    variables = init_model(model1, jax.random.key(4), image_size=32)
    state = init_train_state(model1, variables, tx)
    state1 = jax.tree.map(lambda x: jnp.array(x, copy=True), state)
    stateN = replicate_state(
        jax.tree.map(lambda x: jnp.array(x, copy=True), state), mesh)

    rng = np.random.default_rng(13)
    inputs = (rng.random((16, 32, 32, 2)) * 1800 + 100).astype(np.float32)
    labels = rng.uniform(0, 0.5, (16, 1)).astype(np.float32)
    lr = np.float32(1e-3)
    key = jax.random.key(3)

    stepN = make_train_step(modelN, tx, mesh=mesh, augment=False,
                            grad_accum=2)
    sharding = batch_sharding(mesh)
    stateN, lossN = stepN(
        stateN, jax.device_put(jnp.asarray(inputs), sharding),
        jax.device_put(jnp.asarray(labels), sharding), lr, key)

    # single device on the union-reordered batch: micro j = rows
    # {s*2 + j for s in range(8)} (S=2 rows/shard, m=1 row/microbatch)
    order = np.array([s * 2 + j for j in range(2) for s in range(8)])
    step1 = make_train_step(model1, tx, augment=False, grad_accum=2)
    state1, loss1 = step1(
        state1, jnp.asarray(inputs[order]), jnp.asarray(labels[order]),
        lr, key)

    np.testing.assert_allclose(float(lossN), float(loss1), rtol=1e-4)
    for pN, p1 in zip(jax.tree.leaves(stateN.params),
                      jax.tree.leaves(state1.params)):
        np.testing.assert_allclose(
            np.asarray(pN), np.asarray(p1), atol=2e-6)
    for sN, s1 in zip(jax.tree.leaves(stateN.batch_stats),
                      jax.tree.leaves(state1.batch_stats)):
        # atol: psum-tree vs single-device reduction order, f32 noise
        np.testing.assert_allclose(
            np.asarray(sN), np.asarray(s1), atol=5e-6)


def test_grad_accum_trajectory_matches_torch_accumulation_loop():
    """4 optimizer steps of grad_accum=2 track the torch accumulation loop
    every torch user writes — per microbatch: forward, (loss/N).backward();
    then one optimizer.step() — on identical init and batch sequence
    (augment and dropout off). Pins that BN running stats update per
    MICRObatch and the mean gradient lands in one Adam step."""
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from tests.test_torch_parity import (
        SMALL_SINGLE,
        TorchSingle,
        _flax_eval,
        _torch_eval,
        torch_to_flax,
    )

    torch.manual_seed(41)
    tmodel = TorchSingle(**SMALL_SINGLE)
    tmodel.train()
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout):
            m.eval()
    opt = torch.optim.Adam(tmodel.parameters(), lr=1e-3, weight_decay=1e-4)

    variables = torch_to_flax(tmodel.state_dict(), "single")
    cfg = ModelConfig(variant="single", initial_filters=8, num_conv_blocks=3,
                      compute_dtype="f32", dropout_single=0.0)
    model = build_model(cfg)
    tx = make_optimizer(OptimConfig(weight_decay=1e-4))
    state = init_train_state(model, variables, tx)
    step = make_train_step(model, tx, augment=False, grad_accum=2)

    rng = np.random.default_rng(42)
    key = jax.random.key(0)
    for i in range(4):
        raw = (rng.random((8, 32, 32, 2)) * 1800 + 100).astype(np.float32)
        y = rng.uniform(0, 0.5, (8, 1)).astype(np.float32)
        norm = np.asarray(normalize_batch_nhwc(jnp.asarray(raw)))

        state, loss_j = step(state, jnp.asarray(raw), jnp.asarray(y),
                             np.float32(1e-3), key)

        opt.zero_grad()
        losses_t = []
        for j in range(2):
            xt = torch.from_numpy(np.ascontiguousarray(
                norm[j * 4:(j + 1) * 4].transpose(0, 3, 1, 2)))
            yt = torch.from_numpy(y[j * 4:(j + 1) * 4])
            loss_t = torch.nn.MSELoss()(tmodel(xt), yt)
            (loss_t / 2).backward()
            losses_t.append(float(loss_t.detach()))
        opt.step()
        np.testing.assert_allclose(
            float(loss_j), np.mean(losses_t), rtol=2e-3,
            err_msg=f"accumulated loss diverged at optimizer step {i}")

    tmodel.eval()
    x_eval = (rng.random((4, 32, 32, 2)) * 1800 + 100).astype(np.float32)
    norm_eval = np.asarray(normalize_batch_nhwc(jnp.asarray(x_eval)))
    ours = _flax_eval(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        norm_eval)
    np.testing.assert_allclose(
        ours, _torch_eval(tmodel, norm_eval), atol=1e-4)


def test_train_cli_grad_accum_e2e(tmp_path, capsys):
    """--grad_accum 2 through the full CLI: trains, writes the artifact
    contract, and a resume WITHOUT the flag re-adopts it (accumulation
    changes the BN/dropout trajectory, so it is run identity)."""
    from crosstalk_tpu.cli.train import main as train_main

    mixed_dir, source_dir = make_synthetic_dataset(
        str(tmp_path), n=12, size=64, seed=14)
    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-b", "8", "-l", "1e-3", "-n", "2",
        "-j", "2", "-o", "single", "-r", "onecycle",
        "--compute_dtype", "f32", "--output_base", str(tmp_path),
        "--num_devices", "1", "--grad_accum", "2",
    ])
    assert rc == 0
    (run_dir,) = glob.glob(os.path.join(str(tmp_path), "training_run_*"))
    assert os.path.exists(os.path.join(run_dir, "best_model_onecycle.pth"))
    logs = glob.glob(os.path.join(run_dir, "training_log_*_8_0.001_onecycle.csv"))
    assert len(logs) == 1
    with open(logs[0]) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 5 + 2  # schedule header + 2 epochs

    # resume with --grad_accum left at its default: the original run's
    # accumulation is adopted from params.txt, not silently reset to 1
    capsys.readouterr()
    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-n", "3",
        "-j", "2", "-o", "single", "--output_base", str(tmp_path),
        "--num_devices", "1", "--resume", run_dir,
    ])
    assert rc == 0
    assert "grad_accum=2" in capsys.readouterr().out
    with open(logs[0]) as f:
        epochs = [int(r[0]) for r in list(csv.reader(f))[5:]]
    assert epochs == [1, 2, 3]


def test_resume_prefeature_run_defaults_grad_accum_to_one(tmp_path, capsys):
    """A run dir whose params.txt predates --grad_accum (no key recorded)
    trained with effective accumulation 1 — resuming it with --grad_accum 4
    must adopt 1, not silently switch the trajectory semantics mid-run."""
    from crosstalk_tpu.cli.train import main as train_main

    mixed_dir, source_dir = make_synthetic_dataset(
        str(tmp_path), n=12, size=64, seed=16)
    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-b", "8", "-l", "1e-3", "-n", "1",
        "-j", "2", "-o", "single", "--output_base", str(tmp_path),
        "--num_devices", "1",
    ])
    assert rc == 0
    (run_dir,) = glob.glob(os.path.join(str(tmp_path), "training_run_*"))
    params_path = os.path.join(run_dir, "params.txt")
    with open(params_path) as f:
        lines = [l for l in f if not l.startswith("grad_accum: ")]
    with open(params_path, "w") as f:
        f.writelines(lines)

    capsys.readouterr()
    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-n", "2",
        "-j", "2", "-o", "single", "--output_base", str(tmp_path),
        "--num_devices", "1", "--resume", run_dir, "--grad_accum", "4",
    ])
    assert rc == 0
    assert "grad_accum=1" in capsys.readouterr().out


def test_train_cli_grad_accum_rejects_nondividing_batch(tmp_path, capsys):
    from crosstalk_tpu.cli.train import main as train_main

    mixed_dir, source_dir = make_synthetic_dataset(
        str(tmp_path), n=12, size=64, seed=15)
    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-b", "6", "-n", "1",
        "-o", "single", "--output_base", str(tmp_path),
        "--num_devices", "1", "--grad_accum", "4",
    ])
    assert rc == 1
    assert "must divide by --grad_accum" in capsys.readouterr().out

    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-b", "8", "-n", "1",
        "-o", "single", "--output_base", str(tmp_path), "--grad_accum", "0",
    ])
    assert rc == 1

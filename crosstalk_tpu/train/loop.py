"""Training loop.

Capability match for the reference's ``train_model()`` (train_model.py:
325-491): scheduler registry, per-epoch train/val passes, best-val .pth
checkpointing, early stopping, CSV logging, LR plotting — rebuilt around a
single donated jitted step (train/steps.py) with async dispatch: the host
enqueues every step of an epoch without blocking (losses stay on device and
are materialized once per epoch), so host latency never gates the chip.

Documented divergences from the reference:
  * train/val losses are divided by the number of samples actually evaluated;
    the reference divides by the full split size even when drop_last discarded
    a tail batch (train_model.py:432,445) or — for small datasets — entire
    eval splits (SURVEY.md §2 "known defects").
  * validation evaluates every sample via pad-and-mask instead of
    drop_last=True.
  * every epoch writes a full native resume checkpoint (params + optimizer +
    scheduler + RNG), which the reference lacks entirely. Checkpoint and
    best-model writes are asynchronous (io/checkpoint.AsyncCheckpointWriter):
    the state is snapshotted on device and fetched/serialized/written by a
    background thread while the next epoch trains, so checkpoint I/O costs
    ~zero epoch wall time; everything is durable before train_model returns.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import numpy as np

from crosstalk_tpu.config import OptimConfig, TrainConfig
from crosstalk_tpu.data.pipeline import (
    DeviceDataset,
    TileStore,
    device_prefetch,
    iterate_batches,
    num_batches,
)
from crosstalk_tpu.io import artifacts, checkpoint
from crosstalk_tpu.train.schedules import Schedule
from crosstalk_tpu.utils.profiling import Throughput
from crosstalk_tpu.utils.progress import progress
from crosstalk_tpu.train.steps import (
    TrainState,
    batch_sharding,
    make_train_step,
    make_val_step,
    replicate_state,
)


def train_model(
    model,
    state: TrainState,
    train_store: TileStore,
    val_store: TileStore,
    optim_cfg: OptimConfig,
    train_cfg: TrainConfig,
    run_dir: str,
    ts: str,
    model_variant: str,
    tx,
    mesh=None,
    seed: int = 43,
    resume: bool = False,
    naming_batch_size: Optional[int] = None,
    device_data: bool = False,
) -> Tuple[TrainState, List[float], List[float]]:
    """Run the full training schedule; returns (state, train_losses, val_losses).

    ``naming_batch_size`` keeps artifact filenames on the CLI-requested batch
    size when the effective batch was clamped (the run-directory name already
    used the requested value — the contract the analysis tool parses).

    ``device_data`` places both splits HBM-resident (pipeline.DeviceDataset):
    one upload, zero per-step H2D traffic. Identical batch sequence and
    numerics to the host path (same shuffle permutation; gathers are exact).
    Single-device only — with a mesh the sharded host pipeline is used.
    Pass an already-built ``(train DeviceDataset, val DeviceDataset)`` tuple
    instead of ``True`` to reuse existing device-resident copies (the train
    CLI does, so its post-training evaluation doesn't re-upload the splits
    train_model already placed in HBM)."""
    batch_size = train_cfg.batch_size
    naming_bs = naming_batch_size if naming_batch_size is not None else batch_size
    if batch_size <= 0:
        raise ValueError(f"batch size must be positive, got {batch_size}")
    steps_per_epoch = len(train_store) // batch_size
    if steps_per_epoch == 0:
        raise ValueError(
            f"training split ({len(train_store)} samples) is smaller than the "
            f"batch size ({batch_size}); lower -b"
        )
    if len(val_store) == 0:
        raise ValueError("SplitCrosstalkDataset received no samples.")

    grad_accum = getattr(train_cfg, "grad_accum", 1)
    schedule = Schedule(optim_cfg, train_cfg.num_epochs, steps_per_epoch)
    train_step = make_train_step(model, tx, mesh=mesh, grad_accum=grad_accum)
    val_step = make_val_step(model, mesh=mesh)
    sharding = batch_sharding(mesh)
    state = replicate_state(state, mesh)

    if device_data and mesh is not None:
        raise ValueError(
            "device_data is single-device only; sharded training streams "
            "each process's shard through the host pipeline"
        )
    if device_data:
        if isinstance(device_data, tuple):
            train_data, val_data = device_data
        else:
            train_data = DeviceDataset(train_store)
            val_data = DeviceDataset(val_store)

        def train_batches(epoch):
            return train_data.batches(
                batch_size, shuffle=True, drop_last=True,
                seed=seed, epoch=epoch,
            )

        def val_batches():
            return val_data.batches(batch_size)
    else:
        # multi-host: assemble only this process's row range of each batch
        # (device_prefetch uploads exactly that slice)
        assemble = None
        if mesh is not None and jax.process_count() > 1:
            from crosstalk_tpu.parallel.distributed import process_row_slice

            assemble = process_row_slice(batch_size)

        def train_batches(epoch):
            return device_prefetch(
                iterate_batches(
                    train_store, batch_size, shuffle=True,
                    drop_last=True, seed=seed, epoch=epoch,
                    assemble_rows=assemble,
                ),
                sharding=sharding,
            )

        def val_batches():
            return device_prefetch(
                iterate_batches(val_store, batch_size,
                                assemble_rows=assemble),
                sharding=sharding,
            )

    # Multi-host: every process runs the identical loop (the losses are
    # mesh-global reductions, so control flow — best-model, early stop,
    # schedule — stays in lockstep), but artifacts/logs/prints belong to
    # process 0 alone (parallel/distributed.py).
    primary = jax.process_index() == 0

    train_losses: List[float] = []
    val_losses: List[float] = []
    lr_history: List[float] = []
    best_val_loss = float("inf")
    epochs_without_improvement = 0
    start_epoch = 0
    global_step = 0
    root_key = jax.random.key(seed)

    if resume:
        restored = checkpoint.load_checkpoint(run_dir, state)
        if jax.process_count() > 1:
            # Checkpoints are written by rank 0 only; every rank loads them
            # independently from run_dir. If the ranks don't see the same
            # checkpoint (non-shared filesystem, partial copy), they restore
            # different states — fail with a clear message BEFORE the
            # restored arrays hit collective device_put (whose own
            # cross-process equality assertion is loud but cryptic).
            from jax.experimental import multihost_utils

            local = np.array(
                [restored[1]["epoch"] if restored is not None else -1,
                 restored[1]["global_step"] if restored is not None else -1],
                np.int64,
            )
            agreed = np.asarray(multihost_utils.process_allgather(local))
            if not (agreed == agreed[0]).all():
                raise RuntimeError(
                    "multi-host resume desync: per-rank (epoch, step) = "
                    f"{agreed.tolist()} — the --resume run directory must "
                    "be on a filesystem shared by every host"
                )
        if restored is None:
            # A --resume with nothing restorable must not fall through to a
            # fresh run: TrainingLog(resume_from_epoch=0) would truncate the
            # original CSV history and the epilogue would overwrite the
            # run's artifacts — destroying the run it claimed to continue.
            raise ValueError(
                f"--resume: no restorable checkpoint under "
                f"{run_dir}/checkpoints — wrong directory, cleaned "
                f"checkpoints, or a partial copy. Start a fresh run instead."
            )
        if restored is not None:
            state, meta = restored
            state = replicate_state(state, mesh)
            start_epoch = meta["epoch"]
            global_step = meta["global_step"]
            best_val_loss = meta["best_val_loss"]
            epochs_without_improvement = meta["epochs_without_improvement"]
            train_losses = list(meta["train_losses"])
            val_losses = list(meta["val_losses"])
            lr_history = list(meta["lr_history"])
            schedule.load_state_dict(meta["schedule"])
            if primary:
                print(f"Resumed from epoch {start_epoch} "
                      f"(best val {best_val_loss:.6f})")

    log = artifacts.TrainingLog(
        run_dir, ts, naming_bs, optim_cfg.learning_rate,
        schedule.scheduler_type, schedule.params_dict,
        resume_from_epoch=start_epoch if resume else None,
    ) if primary else artifacts.NullTrainingLog()

    # Checkpoint writes (native resume + best-model .pth) overlap the next
    # epoch's compute: submit_* snapshots the state on device (safe against
    # the donated train step's in-place buffer reuse) and a background
    # thread does the D2H fetch + serialize + atomic write.
    writer = checkpoint.AsyncCheckpointWriter() if primary else None

    meter = Throughput()
    for epoch in range(start_epoch, train_cfg.num_epochs):
        lr_history.append(schedule.lr_for_step(global_step))
        meter.reset()

        # ---- train pass: dispatch every step async, block once at the end
        step_losses = []
        for batch in progress(
            train_batches(epoch),
            desc=(f"Epoch {epoch + 1}/{train_cfg.num_epochs} [Train]"
                  if primary else None),
            total=steps_per_epoch,
        ):
            lr = schedule.lr_for_step(global_step)
            rng = jax.random.fold_in(root_key, global_step)
            state, loss = train_step(
                state, batch.inputs, batch.labels,
                np.float32(lr), rng,
            )
            step_losses.append(loss)
            global_step += 1
        train_loss = float(np.mean([np.asarray(l) for l in step_losses]))
        train_losses.append(train_loss)
        # the np.mean above blocked on the last step: close the train-pass
        # timing window HERE so the printed tiles/s is train throughput, not
        # train+val (the reference's per-epoch print has no such meter)
        meter.add(steps_per_epoch * batch_size)
        tiles_per_sec = meter.tiles_per_sec

        # ---- validation pass (pad-and-mask, every sample)
        sq_sum, count = 0.0, 0.0
        # same batch size as training: iterate_batches pads the tail (and
        # small splits) with masked samples, keeping mesh divisibility
        for batch in progress(
            val_batches(),
            desc=(f"Epoch {epoch + 1}/{train_cfg.num_epochs} [Val]"
                  if primary else None),
            total=num_batches(len(val_store), batch_size),
        ):
            s, c = val_step(
                state.params, state.batch_stats,
                batch.inputs, batch.labels, batch.mask,
            )
            sq_sum += float(s)
            count += float(c)
        val_loss = sq_sum / max(count, 1.0)
        val_losses.append(val_loss)

        schedule.on_epoch_end(val_loss)

        # ---- best-model checkpoint (.pth for reference interop,
        #      train_model.py:456-461)
        if val_loss < best_val_loss:
            best_val_loss = val_loss
            epochs_without_improvement = 0
            if primary:
                best_path = f"{run_dir}/best_model_{schedule.scheduler_type}.pth"
                writer.submit_pth(
                    best_path,
                    {"params": state.params, "batch_stats": state.batch_stats},
                    model_variant,
                )
        else:
            epochs_without_improvement += 1

        current_lr = schedule.lr_for_step(global_step)
        if primary:
            print(
                f"Epoch [{epoch + 1}/{train_cfg.num_epochs}] | "
                f"Train Loss: {train_loss:.6f} | Val Loss: {val_loss:.6f} | "
                f"LR: {current_lr:.2e} | {tiles_per_sec:,.0f} tiles/s"
            )
        log.log_epoch(epoch + 1, train_loss, val_loss, current_lr)

        # ---- native resume checkpoint (every checkpoint_every epochs and on
        #      the final epoch; a 137M-param state is ~1.6 GB per write).
        #      Early stop makes THIS epoch final too — without the write a
        #      later --resume would restart from the last cadence epoch and
        #      silently re-train the tail.
        ckpt_every = getattr(train_cfg, "checkpoint_every", 1)
        stopping = epochs_without_improvement >= schedule.early_stop_patience
        if primary and (
            (epoch + 1) % ckpt_every == 0
            or epoch + 1 == train_cfg.num_epochs
            or stopping
        ):
            writer.submit_checkpoint(
                run_dir,
                state,
                {
                    "epoch": epoch + 1,
                    "global_step": global_step,
                    "best_val_loss": best_val_loss,
                    "epochs_without_improvement": epochs_without_improvement,
                    "train_losses": train_losses,
                    "val_losses": val_losses,
                    "lr_history": lr_history,
                    "schedule": schedule.state_dict(),
                },
            )

        if stopping:
            if primary:
                print(
                    f"Early stopping triggered after {epoch + 1} epochs "
                    f"(no improvement for {schedule.early_stop_patience} epochs)"
                )
            break

    if writer is not None:
        # every submitted write durable (and any writer error raised) before
        # the caller reloads/evaluates artifacts
        writer.close()
    log.close()
    if primary:
        artifacts.plot_lr_schedule(run_dir, lr_history, schedule.scheduler_type)
        print(
            f"Learning rate schedule plot saved to "
            f"{run_dir}/lr_schedule_{schedule.scheduler_type}.png"
        )
    return state, train_losses, val_losses


def finish_training_run(
    eval_model,
    state: TrainState,
    variant: str,
    run_dir: str,
    naming_batch_size,
    learning_rate,
    store_for,
    eval_batch_size: int,
    train_losses,
    val_losses,
):
    """The post-training epilogue shared by the train CLI and distill tool:
    final .pth under the reference's exact naming (train_model.py:644-648),
    loss-curve plot, reload-from-disk round trip (the reference's implicit
    serialization check, train_model.py:666-673), and the three per-split
    prediction CSVs/plots. This is run-dir contract surface that
    analyse/eval tooling parses back by name — one implementation so it
    cannot drift between entry points.

    ``store_for(split)`` -> the TileStore/DeviceDataset to evaluate for
    'test'/'train'/'val'. Returns (final_path, {split: mse}).
    """
    from crosstalk_tpu.eval.engine import evaluate_and_save
    from crosstalk_tpu.io.torch_convert import load_pth, save_pth

    ts2 = artifacts.timestamp()
    final_path = (
        f"{run_dir}/crosstalk_regression_model_trained_{ts2}_"
        f"{naming_batch_size}_{learning_rate}.pth"
    )
    save_pth(
        final_path,
        {"params": state.params, "batch_stats": state.batch_stats},
        variant,
    )
    print(f"Trained model weights saved to {final_path}")

    artifacts.plot_loss_curves(
        run_dir, train_losses, val_losses, ts2, naming_batch_size,
        learning_rate,
    )
    print("Training and validation loss plot saved")

    print("\n--- Evaluating Model ---")
    loaded = load_pth(final_path, variant)
    suffix = f"{ts2}_{naming_batch_size}_{learning_rate}"
    split_mse = {}
    for split in ("test", "train", "val"):
        print(f"\n--- Evaluating Model on {split.capitalize()} Set ---")
        split_mse[split] = evaluate_and_save(
            eval_model, loaded, store_for(split),
            dataset_name=split, output_dir=run_dir, ts=ts2,
            batch_size=eval_batch_size, with_metrics=False,
            train_suffix=suffix,
        )
    return final_path, split_mse

"""Training CLI — the reference's ``train_model.py`` surface (flags and
defaults: train_model.py:495-513; behavior: 515-677).

Discovers paired tiles, splits 70/15/15 with the reference's exact seeded
permutation, trains with the selected scheduler, and writes the complete
``training_run_{ts}_B{bs}_LR{lr}/`` artifact set: params.txt,
model_architecture.txt, training_log CSV, best_model .pth (torch-loadable),
final .pth, loss/LR plots, per-split prediction CSVs + scatter plots —
`analyse_training_results.py` consumes these unchanged.

TPU-native extensions beyond the reference surface: --compute_dtype,
--output_base, --resume (full native checkpoint resume), --num_devices
(data-parallel mesh; default = all visible devices), --multihost +
--coordinator_address/--num_processes/--process_id (multi-process cluster
over DCN; see parallel/distributed.py).
"""

from __future__ import annotations

import argparse
import sys

import jax


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Script for training with various parameters."
    )
    parser.add_argument("-m", "--mixed_channel_data_dir", type=str,
                        default="./Training_Data/Mixed",
                        help="Directory for mixed channel data")
    parser.add_argument("-s", "--pure_source_data_dir", type=str,
                        default="./Training_Data/Source",
                        help="Directory for pure source data")
    parser.add_argument("-b", "--batch_size", type=int, default=256,
                        help="Batch size for training")
    parser.add_argument("-l", "--learning_rate", type=float, default=1e-4,
                        help="Learning rate for training")
    parser.add_argument("-n", "--num_epochs", type=int, default=50,
                        help="Number of epochs for training")
    parser.add_argument("-t", "--train_ratio", type=float, default=0.7,
                        help="Training data ratio")
    parser.add_argument("-v", "--val_ratio", type=float, default=0.15,
                        help="Validation data ratio")
    parser.add_argument("-j", "--cpu_jobs", type=int, default=1,
                        help="Number of CPUs to use")
    parser.add_argument("-o", "--model_options", type=str, default="single",
                        help="Use single- or double-branch model",
                        choices=["single", "double"])
    parser.add_argument("-r", "--learning_scheduler", type=str,
                        default="aggressive_plateau",
                        help="Use aggressive_plateau, onecycle or cosine_warmup "
                             "learning scheduler",
                        choices=["aggressive_plateau", "onecycle", "cosine_warmup"])
    # Extensions beyond the reference surface:
    parser.add_argument("--initial_filters", type=int, default=None,
                        help="Model width override (reference config: 128 "
                             "for single, 64 per branch for double). "
                             "Smaller is faster / fewer params; the .pth "
                             "converter and eval CLI handle any width")
    parser.add_argument("--num_conv_blocks", type=int, default=None,
                        help="Single-branch depth override (reference: 6). "
                             "Input tiles must be at least 2^depth pixels. "
                             "The two-branch trunk is fixed at 4 blocks by "
                             "its architecture")
    parser.add_argument("--compute_dtype", type=str, default="bf16",
                        choices=["bf16", "f32"],
                        help="Conv/matmul compute dtype (bf16 = MXU-native)")
    parser.add_argument("--dropout", type=float, default=None,
                        help="Dropout rate override (reference hardcodes "
                             "0.1 single / 0.5 double — regression_model.py:"
                             "39,44, two_branch_regression.py:45,50). 0 "
                             "makes training a deterministic function of "
                             "the seed across device layouts")
    parser.add_argument("--output_base", type=str, default=".",
                        help="Where to create the training_run_* directory")
    parser.add_argument("--resume", type=str, default=None,
                        help="Existing training_run_* directory to resume from")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="Data-parallel device count (default: all)")
    parser.add_argument("--seed", type=int, default=43,
                        help="Split/augmentation seed (reference: 43)")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="Capture a jax.profiler trace of training to DIR")
    parser.add_argument("--checkpoint_every", type=int, default=1,
                        help="Native-resume checkpoint cadence in epochs "
                             "(the final epoch always checkpoints)")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="Microbatches per optimizer step (extension; "
                             "default 1 = reference semantics). N splits "
                             "each batch into N sequential forward/backward "
                             "passes inside one compiled step — peak "
                             "activation memory drops ~N-fold while the "
                             "optimizer sees the full-batch mean gradient. "
                             "Matches a torch accumulation loop exactly "
                             "(per-microbatch BatchNorm stats); batch size "
                             "must divide by N (and by N x devices when "
                             "sharded)")
    parser.add_argument("--data_placement", type=str, default="auto",
                        choices=["auto", "host", "device"],
                        help="'device' keeps both training splits HBM-"
                             "resident (one upload, zero per-step H2D "
                             "traffic; single-device only); 'host' streams "
                             "batches through the memmap+prefetch pipeline; "
                             "'auto' picks device when training is single-"
                             "device and the splits fit comfortably in HBM")
    parser.add_argument("--cache_dir", type=str, default=None,
                        help="Directory for the packed decoded-tile cache "
                             "(memory-mapped; repeat runs skip TIFF decode)")
    parser.add_argument("--debug_nans", action="store_true",
                        help="Fail fast on NaN/Inf in compiled computations "
                             "(note: a genuinely constant tile yields NaN "
                             "correlation metrics by reference semantics and "
                             "will trip this during post-training eval)")
    # Multi-host (one process per host; see parallel/distributed.py). On TPU
    # pods all three are auto-detected — pass --multihost alone. The CROSSTALK_
    # COORDINATOR/NUM_PROCESSES/PROCESS_ID env vars are an alternative to flags.
    parser.add_argument("--multihost", action="store_true",
                        help="Join a multi-process cluster "
                             "(jax.distributed.initialize)")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 (TPU pods: auto)")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="Total process count (TPU pods: auto)")
    parser.add_argument("--process_id", type=int, default=None,
                        help="This process's rank (TPU pods: auto)")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    # Guard the flags that would otherwise surface as ZeroDivisionError /
    # scheduler tracebacks deep in the run (found by adversarial probing).
    for name, value in (("--batch_size", args.batch_size),
                        ("--num_epochs", args.num_epochs),
                        ("--learning_rate", args.learning_rate),
                        ("--checkpoint_every", args.checkpoint_every),
                        ("--grad_accum", args.grad_accum)):
        if value <= 0:
            print(f"Error: {name} must be positive, got {value}")
            return 1

    from crosstalk_tpu.config import ModelConfig, OptimConfig, TrainConfig
    from crosstalk_tpu.data.index import PairIndex, split_samples
    from crosstalk_tpu.data.pipeline import TileStore
    from crosstalk_tpu.io import artifacts
    from crosstalk_tpu.models import build_model, init_model, torch_style_repr
    from crosstalk_tpu.parallel.mesh import data_mesh
    from crosstalk_tpu.train.loop import finish_training_run, train_model
    from crosstalk_tpu.train.steps import init_train_state, make_optimizer
    from crosstalk_tpu.utils.profiling import enable_debug_checks, maybe_trace

    if args.debug_nans:
        enable_debug_checks()

    from crosstalk_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import os

    if (args.multihost or args.coordinator_address
            or os.environ.get("CROSSTALK_COORDINATOR")):
        from crosstalk_tpu.parallel.distributed import initialize

        initialize(args.coordinator_address, args.num_processes,
                   args.process_id)
    primary = jax.process_index() == 0
    if not primary:
        # rank 0 owns stdout + artifacts; other ranks run the identical
        # compute silently (losses are mesh-global, so control flow agrees).
        # Error/Warning lines still surface on stderr — a rank failing
        # silently would leave the cluster hanging with no diagnostic.
        import io as _io

        class _NonPrimaryStdout(_io.TextIOBase):
            # TextIOBase supplies the full file API (isatty, fileno,
            # writelines, readable/seekable, ...) so libraries probing the
            # stream don't crash on a missing attribute.
            def __init__(self, rank):
                super().__init__()
                self._rank = rank

            def writable(self):
                return True

            def write(self, s):
                if "Error" in s or "Warning" in s:
                    sys.stderr.write(f"[rank {self._rank}] {s}")
                return len(s)

        sys.stdout = _NonPrimaryStdout(jax.process_index())

    devices = jax.devices()
    n_dev = len(devices) if args.num_devices is None else args.num_devices
    if n_dev <= 0 or n_dev > len(devices):
        print(f"Error: --num_devices {n_dev} requested but only "
              f"{len(devices)} device(s) are visible.")
        return 1
    print(f"Using device: {devices[0].platform} x{n_dev} "
          f"({devices[0].device_kind})"
          + (f", {jax.process_count()} processes"
             if jax.process_count() > 1 else ""))

    if args.resume:
        # A resumed run continues the SAME run: the hyperparameters that
        # define its identity (naming, split, schedule, model) come from the
        # original params.txt, not this invocation's flags/defaults —
        # otherwise the log filename forks (dropping epoch history from the
        # continued CSV) and the schedule silently changes. -n stays from
        # the invocation: it is the (extendable) total-epoch target.
        original = artifacts.read_params_txt(args.resume)
        # Single-process: fail cleanly up front when there is nothing to
        # restore (train/loop.py's guard also catches this for every
        # caller, but with a traceback). Multi-host skips the pre-check —
        # per-rank early returns would desync the collective digest check
        # below, which owns that failure mode.
        import glob

        if jax.process_count() == 1 and not glob.glob(
                os.path.join(args.resume, "checkpoints", "*")):
            print(f"Error: no checkpoints under {args.resume}/checkpoints — "
                  "nothing to resume (wrong directory, cleaned checkpoints, "
                  "or a partial copy). Start a fresh run instead.")
            return 1
        # run dirs that predate an identity flag recorded no key for it;
        # their effective value was the flag's default — adopt that like
        # any recorded hyperparameter, so resuming an old run with
        # --grad_accum N / --dropout X can't silently switch the run's
        # training semantics
        if original:
            original.setdefault("grad_accum", "1")
            original.setdefault("dropout", "None")
            original.setdefault("initial_filters", "None")
            original.setdefault("num_conv_blocks", "None")
        adopted = artifacts.adopt_run_identity(original, args, (
            ("batch_size", int), ("learning_rate", float),
            ("learning_scheduler", str), ("model_options", str),
            ("compute_dtype", str), ("seed", int),
            ("train_ratio", float), ("val_ratio", float),
            ("initial_filters", artifacts.opt_int),
            ("num_conv_blocks", artifacts.opt_int),
            ("dropout", lambda v: None if v in (None, "None", "") else float(v)),
            # grad_accum changes the step's BN/dropout trajectory (one
            # microbatch-stat update per microbatch) — run identity, so a
            # resumed run must not silently switch accumulation semantics
            ("grad_accum", int),
        ))
        if adopted:
            print("Resume: adopting the original run's hyperparameters: "
                  + ", ".join(adopted))

        if jax.process_count() > 1:
            # Every rank must see the SAME resume directory contents
            # (params.txt + checkpoint files): on a non-shared filesystem
            # the ranks would adopt different hyperparameters / restore
            # different states — fail here with a clear message instead of
            # the cryptic cross-process device_put assertion downstream.
            # Complementary to train/loop.py's restored-(epoch, step)
            # allgather: this one catches params.txt/filename divergence
            # before any state is built; that one catches divergent
            # checkpoint CONTENT the filenames can't reveal.
            import glob as _glob
            import hashlib

            import numpy as np
            from jax.experimental import multihost_utils

            ckpt_files = sorted(
                os.path.basename(p)
                for p in _glob.glob(os.path.join(args.resume,
                                                 "checkpoints", "*"))
            )
            src = repr(sorted(original.items())) + repr(ckpt_files)
            digest = int.from_bytes(
                hashlib.sha256(src.encode()).digest()[:7], "little"
            )
            agreed = np.asarray(
                multihost_utils.process_allgather(np.int64(digest))
            )
            if not (agreed == agreed[0]).all():
                print("Error: multi-host resume desync — the ranks see "
                      "different --resume directory contents "
                      "(params.txt/checkpoints). The run directory must be "
                      "on a filesystem shared by every host.")
                return 1

    if not (abs(args.train_ratio + args.val_ratio) < 1.0):
        print("Warning: Sum of TRAIN_RATIO, VAL_RATIO, TEST_RATIO does not equal 1.0.")

    mesh = data_mesh(n_dev) if n_dev > 1 else None
    if args.num_conv_blocks is not None and args.model_options == "double":
        print("Error: --num_conv_blocks applies to the single-branch model "
              "only (the two-branch trunk is fixed at 4 blocks per branch).")
        return 1
    model_kw = {}
    if args.initial_filters is not None:
        if args.model_options == "single":
            model_kw["initial_filters"] = args.initial_filters
        else:
            model_kw["initial_filters_per_branch"] = args.initial_filters
    if args.num_conv_blocks is not None:
        model_kw["num_conv_blocks"] = args.num_conv_blocks
    if args.dropout is not None:
        if not (0.0 <= args.dropout < 1.0):
            print("Error: --dropout must be in [0, 1).")
            return 1
        if args.model_options == "single":
            model_kw["dropout_single"] = args.dropout
        else:
            model_kw["dropout_double"] = args.dropout
    model_cfg = ModelConfig(variant=args.model_options,
                            compute_dtype=args.compute_dtype, **model_kw)
    model = build_model(model_cfg, axis_name="data" if mesh else None)
    # Evaluation (BN in eval mode, no collectives) uses an axis-free twin so
    # it can run outside the shard_mapped step.
    eval_model = build_model(model_cfg)
    print(f"Using {args.cpu_jobs} cpu workers.")

    if args.resume:
        run_dir = args.resume
        import re

        m = re.search(r"training_run_(.*)_B\d+_LR", run_dir)
        ts = m.group(1) if m else artifacts.timestamp()
        print(f"Resuming run in: {run_dir}")
    elif primary:
        ts = artifacts.timestamp()
        run_dir = artifacts.make_training_run_dir(
            args.output_base, ts, args.batch_size, args.learning_rate
        )
    else:  # non-primary ranks never create or write the run dir
        ts = artifacts.timestamp()
        run_dir = f"{args.output_base}/training_run_rank{jax.process_index()}"
    print(f"Saving all outputs to: {run_dir}")

    # On resume, params.txt is the ORIGINAL run's hyperparameter record —
    # preserve it and log the resume invocation separately.
    if primary:
        if args.resume:
            artifacts.write_params_txt(run_dir, vars(args),
                                       filename="params_resume.txt")
            print(f"Resume parameters saved to {run_dir}/params_resume.txt")
        else:
            artifacts.write_params_txt(run_dir, vars(args))
            print(f"Parameters saved to {run_dir}/params.txt")

    # Quickstart bootstrap: the reference bundles Training_Data/ (100 paired
    # tiles) so its zero-flag `python train_model.py` just works. This repo
    # doesn't vendor ~100 MB of TIFFs; instead, when both data flags are at
    # their defaults and the default directory is absent, generate an
    # equivalent 100-pair sample set there once (known-alpha synthetic
    # mixtures — data/synthetic.py), so a fresh clone runs end to end.
    if (args.mixed_channel_data_dir == "./Training_Data/Mixed"
            and args.pure_source_data_dir == "./Training_Data/Source"
            and not os.path.isdir(args.mixed_channel_data_dir)
            and jax.process_count() == 1):
        from crosstalk_tpu.data.synthetic import generate_dataset

        print("\nDefault data directory ./Training_Data is missing — "
              "generating the 100-pair sample dataset (the reference's "
              "bundled Training_Data equivalent)...")
        generate_dataset("./Training_Data", num_pairs=100, size=256, seed=0,
                         progress_every=0)
        print("Sample dataset written to ./Training_Data/{Mixed,Source}.")

    print("\nCreating dataset instances for initial file listing...")
    try:
        index = PairIndex(args.mixed_channel_data_dir, args.pure_source_data_dir)
        print(f"Found {len(index)} matching samples.")
        print(f"Total samples found in directories: {len(index)}")
    except (ValueError, FileNotFoundError) as e:
        print(f"Error initializing temporary dataset: {e}")
        return 1

    print("\nSplitting data using filename lists for correct augmentation application...")
    train_samples, val_samples, test_samples = split_samples(
        index.samples, args.train_ratio, args.val_ratio, seed=args.seed
    )
    print(
        f"Split sizes: Train = {len(train_samples)}, "
        f"Validation = {len(val_samples)}, Test = {len(test_samples)}"
    )

    batch_size = args.batch_size
    # the effective batch must stay positive — and a multiple of the mesh
    # size when sharding — or the loop divides by zero (-b 4 on 8 devices
    # must become 8, not (4//8)*8 = 0)
    floor = n_dev if mesh is not None else 1
    if batch_size > len(train_samples):
        batch_size = max((len(train_samples) // max(n_dev, 1)) * max(n_dev, 1), floor)
        print(
            f"Warning: batch size {args.batch_size} exceeds the training split "
            f"({len(train_samples)} samples); clamping to {batch_size}."
        )
    if mesh is not None and batch_size % n_dev != 0:
        batch_size = max((batch_size // n_dev) * n_dev, n_dev)
        print(f"Warning: batch size rounded to {batch_size} "
              f"(must divide across {n_dev} devices).")
    if args.grad_accum > 1:
        # each device's per-step batch is scanned in grad_accum microbatches
        per_dev = batch_size // n_dev if mesh is not None else batch_size
        if per_dev % args.grad_accum != 0:
            print(f"Error: per-device batch {per_dev} must divide by "
                  f"--grad_accum {args.grad_accum}")
            return 1

    stores = {}
    for name, samples in (
        ("train", train_samples), ("val", val_samples), ("test", test_samples)
    ):
        if not samples:
            print("Error: SplitCrosstalkDataset received no samples.")
            return 1
        stores[name] = TileStore(samples, jobs=args.cpu_jobs,
                                 cache_dir=args.cache_dir)
        print(f"SplitCrosstalkDataset created with {len(samples)} samples.")
    print("Dataloaders created for training, validation, and testing.")

    optim_cfg = OptimConfig(
        learning_rate=args.learning_rate, scheduler=args.learning_scheduler
    )
    train_cfg = TrainConfig(
        batch_size=batch_size, num_epochs=args.num_epochs,
        output_base=args.output_base, resume=args.resume,
        checkpoint_every=max(args.checkpoint_every, 1),
        grad_accum=args.grad_accum,
    )

    tx = make_optimizer(optim_cfg)
    image_size = int(stores["train"].tiles.shape[1])  # size the head from data
    variables = init_model(model, jax.random.key(args.seed), image_size=image_size)
    if primary:
        artifacts.write_architecture_txt(
            run_dir, torch_style_repr(model_cfg, image_size=image_size)
        )
        print(f"Model architecture summary saved to "
              f"{run_dir}/model_architecture.txt")
    state = init_train_state(model, variables, tx)

    from crosstalk_tpu.data.pipeline import DeviceDataset

    if args.data_placement == "device":
        if mesh is not None:
            print("Error: --data_placement device is single-device only "
                  "(sharded training streams each process's shard).")
            return 1
        device_data = True
    elif args.data_placement == "auto":
        # resident when single-device and ALL splits fit well inside one
        # chip's HBM next to params/activations (v5e: 16 GB). The test split
        # counts too: post-training eval uploads it while the train/val
        # copies are still resident, so budgeting only train+val could pass
        # training and then die with RESOURCE_EXHAUSTED at evaluation.
        split_bytes = sum(
            DeviceDataset.nbytes(stores[s]) for s in ("train", "val", "test")
        )
        device_data = mesh is None and split_bytes <= 8 << 30
    else:
        device_data = False
    device_datasets = {}
    if device_data:
        print("Data placement: HBM-resident (one upload, on-device batching)")
        device_datasets = {
            "train": DeviceDataset(stores["train"]),
            "val": DeviceDataset(stores["val"]),
        }

    print("\nStarting training with validation...")
    with maybe_trace(args.profile):
        state, train_losses, val_losses = train_model(
            model, state, stores["train"], stores["val"],
            optim_cfg, train_cfg, run_dir, ts, args.model_options, tx,
            mesh=mesh, seed=args.seed, resume=bool(args.resume),
            naming_batch_size=args.batch_size,
            device_data=(
                (device_datasets["train"], device_datasets["val"])
                if device_data else False
            ),
        )
    print("Training finished!")

    if not primary:
        # training collectives are done; the final artifacts + the (local,
        # meshless) post-training evaluation belong to rank 0
        return 0

    def store_for(split):
        # device-resident runs evaluate from HBM too, reusing the train/val
        # copies train_model already uploaded (test needs its one upload)
        if device_data:
            return device_datasets.get(split) or DeviceDataset(stores[split])
        return stores[split]

    finish_training_run(
        eval_model, state, args.model_options, run_dir,
        args.batch_size, args.learning_rate, store_for,
        eval_batch_size=min(batch_size, 256),
        train_losses=train_losses, val_losses=val_losses,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

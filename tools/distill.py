#!/usr/bin/env python
"""Teacher->student distillation onto a smaller serving config.

The reference hardcodes one model size per family (train_model.py:534-537);
this repo's --initial_filters extension exposes the width axis, and round 3
measured the speed-quality frontier point that motivates this tool: width-32
single-branch serves at 23,810 tiles/s (4.6x the flagship width-128) but
costs 1.17x test MSE when trained from scratch (TRAINING_RESULTS "Capacity/
speed tradeoff"). Distillation trains the small student against the
flagship teacher's predictions instead of (or blended with, --blend) the
raw labels. NOTE the measured round-5 finding (TRAINING_RESULTS
"Distillation onto the width-32 serving config"): on corpora with EXACT
labels (synthetic drawn alphas) the teacher's own error is pure noise
added to the target and plain training (--blend 1) wins — the student
faithfully inherited the teacher's errors (residual corr 0.825).
Distillation's value case is noisy-label corpora, where the teacher is a
denoised target.

Protocol (mirrors the train CLI so every artifact lands in the standard
run-dir contract and the student .pth serves through the standard stack):

  * the corpus splits 70/15/15 with the reference's seed-43 permutation;
  * the TEACHER (-p, any trained checkpoint) labels the train split:
    distill target = blend*true + (1-blend)*teacher (the MSE-equivalent of
    the blended two-term distillation loss, since
    w*(s-y)^2 + (1-w)*(s-t)^2 = (s - (w*y+(1-w)*t))^2 + const);
  * validation/best-model selection and the final test evaluation use the
    TRUE labels (the deployment objective — teacher labels steer training,
    never the scoreboard);
  * the student trains with the standard loop (onecycle defaults matching
    the width-32 receipt) and the run dir gets the full artifact set
    (params.txt, training log CSV, best/final .pth, loss plot, per-split
    prediction CSVs), so analyse/eval/serve tooling works unchanged.

Usage:
  python tools/distill.py -m DATA/Mixed -s DATA/Source -p teacher.pth \\
      [--initial_filters 32] [-b 256 -l 5e-4 -n 50 -r onecycle] [--blend 0.1]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Distill a trained teacher into a smaller student")
    p.add_argument("-m", "--mixed_channel_data_dir", required=True)
    p.add_argument("-s", "--pure_source_data_dir", required=True)
    p.add_argument("-p", "--teacher_path", required=True,
                   help="trained teacher checkpoint (.pth)")
    p.add_argument("-o", "--model_options", default="single",
                   choices=["single", "double"],
                   help="teacher/student family (the student is the same "
                        "family at a smaller width)")
    p.add_argument("--initial_filters", type=int, default=32,
                   help="student width (teacher's width comes from -p)")
    p.add_argument("--num_conv_blocks", type=int, default=None,
                   help="student depth (default: the family's standard)")
    p.add_argument("-b", "--batch_size", type=int, default=256)
    p.add_argument("-l", "--learning_rate", type=float, default=5e-4)
    p.add_argument("-n", "--num_epochs", type=int, default=50)
    p.add_argument("-r", "--learning_scheduler", default="onecycle")
    p.add_argument("-j", "--cpu_jobs", type=int, default=4)
    p.add_argument("--blend", type=float, default=0.0,
                   help="weight on the TRUE labels in the distill target "
                        "(0 = pure teacher, 1 = plain training)")
    p.add_argument("--seed", type=int, default=43)
    p.add_argument("--output_base", default=".")
    p.add_argument("--cache_dir", default=None)
    p.add_argument("--resume", default=None, metavar="RUN_DIR",
                   help="existing distillation training_run_* directory to "
                        "resume from its last native checkpoint (identity "
                        "hyperparameters are re-adopted from its params.txt; "
                        "-n stays from this invocation as the extendable "
                        "total-epoch target, like the train CLI)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not (0.0 <= args.blend <= 1.0):
        print("Error: --blend must be in [0, 1].")
        return 1

    import jax

    from crosstalk_tpu.config import ModelConfig, OptimConfig, TrainConfig
    from crosstalk_tpu.data.index import PairIndex, split_samples
    from crosstalk_tpu.data.pipeline import TileStore
    from crosstalk_tpu.eval.engine import evaluate
    from crosstalk_tpu.io import artifacts
    from crosstalk_tpu.io.torch_convert import (
        load_pth,
        model_config_for_checkpoint,
    )
    from crosstalk_tpu.models import build_model, init_model, torch_style_repr
    from crosstalk_tpu.train.loop import finish_training_run, train_model
    from crosstalk_tpu.train.steps import init_train_state, make_optimizer

    if args.resume:
        # A resumed distillation continues the SAME run: the hyperparameters
        # that define its identity (teacher, student shape, distill target,
        # split seed, schedule, artifact naming) come from the original
        # params.txt, not this invocation's flags/defaults — the same
        # contract as the train CLI's --resume (cli/train.py, shared
        # artifacts.adopt_run_identity). -n stays from the invocation: it is
        # the (extendable) total-epoch target. The -m/-s/-p PATHS are NOT
        # adopted (they may legitimately move, or be relative to a new cwd)
        # — the invocation's paths are used, with a note when they differ
        # from the record.
        original = artifacts.read_params_txt(args.resume)
        if not original or "distilled_from" not in original:
            print(f"Error: {args.resume} is not a distillation run "
                  "directory (no params.txt with a distilled_from record) — "
                  "--resume needs the directory tools/distill.py created.")
            return 1
        import glob as _glob
        if not _glob.glob(os.path.join(args.resume, "checkpoints", "*")):
            print(f"Error: no checkpoints under {args.resume}/checkpoints — "
                  "nothing to resume (cleaned directory or partial copy). "
                  "Start a fresh run instead.")
            return 1
        adopted = artifacts.adopt_run_identity(original, args, (
            ("model_options", str),
            ("initial_filters", artifacts.opt_int),
            ("num_conv_blocks", artifacts.opt_int),
            ("blend", float),
            ("batch_size", int),
            ("learning_rate", float),
            ("learning_scheduler", str),
            ("seed", int),
        ))
        if adopted:
            print("Resume: adopting the original run's hyperparameters: "
                  + ", ".join(adopted))
        for key in ("mixed_channel_data_dir", "pure_source_data_dir",
                    "teacher_path"):
            if key in original and getattr(args, key) != original[key]:
                print(f"Resume: note — {key} differs from the original "
                      f"record ({original[key]}); using this invocation's "
                      f"{getattr(args, key)}")

    # ---- data: reference split protocol ------------------------------
    try:
        index = PairIndex(args.mixed_channel_data_dir,
                          args.pure_source_data_dir)
    except (ValueError, FileNotFoundError) as e:
        print(f"Error: {e}")
        return 1
    train_samples, val_samples, test_samples = split_samples(
        index.samples, 0.7, 0.15, seed=args.seed)
    print(f"Split sizes: Train = {len(train_samples)}, "
          f"Validation = {len(val_samples)}, Test = {len(test_samples)}")
    stores = {
        name: TileStore(samples, jobs=args.cpu_jobs,
                        cache_dir=args.cache_dir)
        for name, samples in (("train", train_samples), ("val", val_samples),
                              ("test", test_samples))
    }
    image_size = int(stores["train"].tiles.shape[1])

    # ---- teacher: label the train split ------------------------------
    try:
        teacher_vars = load_pth(args.teacher_path, args.model_options)
    except Exception as e:
        print(f"Error loading teacher checkpoint: {e}")
        return 1
    teacher_cfg = model_config_for_checkpoint(args.model_options, teacher_vars)
    teacher = build_model(teacher_cfg)
    print(f"Teacher: {args.teacher_path} ({teacher_cfg})")

    def teacher_predict(store):
        rows, _ = evaluate(teacher, teacher_vars, store,
                           batch_size=min(args.batch_size, 256),
                           with_metrics=False, desc="teacher labels")
        return np.array([[r["Predicted_Label"]] for r in rows],
                        dtype=np.float32)

    t_train = teacher_predict(stores["train"])
    teacher_test = teacher_predict(stores["test"])
    teacher_test_mse = float(
        np.mean((teacher_test - stores["test"].labels) ** 2))
    true_train = stores["train"].labels.copy()
    stores["train"].labels = (
        args.blend * true_train + (1.0 - args.blend) * t_train)
    print(f"Distill target: {args.blend:.2f}*true + "
          f"{1 - args.blend:.2f}*teacher "
          f"(teacher-vs-true train MAE "
          f"{float(np.abs(t_train - true_train).mean()):.4f})")

    # ---- student: standard training loop, standard artifacts ---------
    model_kw = {}
    if args.model_options == "single":
        model_kw["initial_filters"] = args.initial_filters
    else:
        model_kw["initial_filters_per_branch"] = args.initial_filters
    if args.num_conv_blocks is not None:
        model_kw["num_conv_blocks"] = args.num_conv_blocks
    student_cfg = ModelConfig(variant=args.model_options, **model_kw)
    student = build_model(student_cfg)

    if args.resume:
        run_dir = args.resume
        m = re.search(r"training_run_(.*)_B\d+_LR", run_dir)
        ts = m.group(1) if m else artifacts.timestamp()
        print(f"Resuming distillation run in: {run_dir}")
        # params.txt stays the ORIGINAL run's record; log this invocation
        # separately (same convention as the train CLI).
        artifacts.write_params_txt(run_dir, dict(vars(args)),
                                   filename="params_resume.txt")
    else:
        ts = artifacts.timestamp()
        run_dir = artifacts.make_training_run_dir(
            args.output_base, ts, args.batch_size, args.learning_rate)
        print(f"Saving all outputs to: {run_dir}")
        params = dict(vars(args))
        params["distilled_from"] = args.teacher_path
        artifacts.write_params_txt(run_dir, params)
        artifacts.write_architecture_txt(
            run_dir, torch_style_repr(student_cfg, image_size=image_size))

    optim_cfg = OptimConfig(learning_rate=args.learning_rate,
                            scheduler=args.learning_scheduler)
    batch_size = min(args.batch_size, len(train_samples))
    train_cfg = TrainConfig(batch_size=batch_size,
                            num_epochs=args.num_epochs,
                            output_base=args.output_base)
    tx = make_optimizer(optim_cfg)
    variables = init_model(student, jax.random.key(args.seed),
                           image_size=image_size)
    state = init_train_state(student, variables, tx)

    state, train_losses, val_losses = train_model(
        student, state, stores["train"], stores["val"],
        optim_cfg, train_cfg, run_dir, ts, args.model_options, tx,
        seed=args.seed, resume=args.resume is not None,
        naming_batch_size=args.batch_size)
    print("Distillation training finished!")

    # ---- scoreboard: TRUE labels, the shared finishing path ----------
    stores["train"].labels = true_train
    final_path, split_mse = finish_training_run(
        student, state, args.model_options, run_dir,
        args.batch_size, args.learning_rate, lambda split: stores[split],
        eval_batch_size=min(batch_size, 256),
        train_losses=train_losses, val_losses=val_losses)
    print(f"\nDistillation summary: student test MSE {split_mse['test']:.6f}"
          f" vs teacher test MSE {teacher_test_mse:.6f} "
          f"(ratio {split_mse['test'] / max(teacher_test_mse, 1e-12):.3f}; "
          f"student width {args.initial_filters}; student .pth {final_path})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Evaluation CLI — the reference's ``test-cross-talk-model.py`` surface
(flags and defaults: test-cross-talk-model.py:228-242; behavior: 255-324).

Runs single- or double-branch inference on every paired tile in the given
directories using a ``.pth`` checkpoint, computes the five classical
comparison metrics, and writes the ``eval_run_{ts}/`` artifact set
(params.txt, model_architecture.txt, test_predictions_{ts}.csv, one scatter
PNG per metric).

TPU-native differences (documented, not silent):
  * inference + metrics run as one jitted batched program on the accelerator
    (the reference loops per-sample on CPU at batch size 1);
  * every sample is evaluated — the reference's DataLoader(drop_last=True)
    quirk is not reproduced (with its default batch 1 it never drops anyway);
  * computation defaults to float32 with full MXU precision for checkpoint
    parity; pass --compute_dtype bf16 for speed.
"""

from __future__ import annotations

import argparse
import sys

import jax


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Script for training with various parameters."
    )
    parser.add_argument(
        "-m", "--mixed_channel_data_dir", type=str,
        default="/nemo/stp/lm/working/barryd/IDR/crosstalk_training_data/bleed",
        help="Directory for mixed channel data",
    )
    parser.add_argument(
        "-s", "--pure_source_data_dir", type=str,
        default="/nemo/stp/lm/working/barryd/IDR/crosstalk_training_data/source",
        help="Directory for pure source data",
    )
    parser.add_argument(
        "-p", "--model_path", type=str,
        default=(
            "/nemo/stp/lm/working/barryd/hpc/python/Torch-Unet/"
            "training_run_2025-12-15_16-02-16_B256_LR0.0005/"
            "crosstalk_regression_model_trained_2025-12-15_18-22-01_256_0.0005.pth"
        ),
        help="Path to pytorch model",
    )
    parser.add_argument("-j", "--cpu_jobs", type=int, default=20,
                        help="Number of CPUs to use")
    parser.add_argument("-o", "--model_options", type=str, default="single",
                        help="Use single- or double-branch model",
                        choices=["single", "double"])
    # Extensions beyond the reference surface:
    parser.add_argument("--initial_filters", type=int, default=None,
                        help="Model width override — must match the "
                             "checkpoint (reference config: 128 single / "
                             "64 per branch double)")
    parser.add_argument("--num_conv_blocks", type=int, default=None,
                        help="Single-branch depth override — must match "
                             "the checkpoint (reference: 6)")
    parser.add_argument("--compute_dtype", type=str, default="f32",
                        choices=["f32", "bf16"],
                        help="f32 = checkpoint-parity mode (default); "
                             "bf16 = MXU-native fast mode")
    parser.add_argument("--batch_size", type=int, default=64,
                        help="Device batch size for inference")
    parser.add_argument("--output_base", type=str, default=".",
                        help="Where to create the eval_run_* directory")
    parser.add_argument("--fast", action="store_true",
                        help="Use the bf16 serving path (folded-BN forward, "
                             "~6x faster; predictions within ~1e-4 of f32)")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="Data-parallel device count for inference "
                             "(default: all visible devices)")
    parser.add_argument("--cache_dir", type=str, default=None,
                        help="Directory for the packed decoded-tile cache "
                             "(memory-mapped; repeat runs skip TIFF decode)")
    parser.add_argument("--debug_nans", action="store_true",
                        help="Fail fast on NaN/Inf in compiled computations "
                             "(note: a genuinely constant tile yields NaN "
                             "correlation metrics by reference semantics and "
                             "will trip this)")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="Capture a jax.profiler trace of the "
                             "evaluation to DIR")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from crosstalk_tpu.config import ModelConfig
    from crosstalk_tpu.data.index import PairIndex
    from crosstalk_tpu.data.pipeline import TileStore
    from crosstalk_tpu.eval.engine import evaluate_and_save
    from crosstalk_tpu.io import artifacts
    from crosstalk_tpu.io.torch_convert import load_pth
    from crosstalk_tpu.models import build_model, torch_style_repr
    from crosstalk_tpu.utils.profiling import enable_debug_checks, maybe_trace

    if args.batch_size <= 0:
        print(f"Error: --batch_size must be positive, got {args.batch_size}")
        return 1
    if args.debug_nans:
        enable_debug_checks()

    from crosstalk_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    device = jax.devices()[0]
    n_dev = (len(jax.devices()) if args.num_devices is None
             else args.num_devices)
    if n_dev <= 0 or n_dev > len(jax.devices()):
        print(f"Error: --num_devices {n_dev} requested but only "
              f"{len(jax.devices())} device(s) are visible.")
        return 1
    print(f"Using device: {device.platform}:{device.device_kind} x{n_dev}")

    if args.num_conv_blocks is not None and args.model_options == "double":
        print("Error: --num_conv_blocks applies to the single-branch model "
              "only (the two-branch trunk is fixed at 4 blocks per branch).")
        return 1
    ts = artifacts.timestamp()
    output_dir = artifacts.make_eval_run_dir(args.output_base, ts)
    print(f"Saving all outputs to: {output_dir}")

    artifacts.write_params_txt(output_dir, vars(args))
    print(f"Parameters saved to {output_dir}/params.txt")

    print("\nCreating dataset instances for initial file listing...")
    try:
        index = PairIndex(args.mixed_channel_data_dir, args.pure_source_data_dir)
        print(f"Found {len(index)} matching samples.")
    except (ValueError, FileNotFoundError) as e:
        print(f"Error initializing temporary dataset: {e}")
        return 1

    print("\n--- Loading model weights ---")
    try:
        variables = load_pth(args.model_path, args.model_options)
    except (FileNotFoundError, KeyError, ValueError) as e:
        print(f"Error loading model from {args.model_path}: {e}")
        return 1
    # Size the model from the checkpoint itself (flags, when given, are
    # validated against it) — a non-default-width .pth needs no flags.
    from crosstalk_tpu.io.torch_convert import model_config_for_checkpoint

    try:
        model_cfg = model_config_for_checkpoint(
            args.model_options, variables,
            initial_filters=args.initial_filters,
            num_conv_blocks=args.num_conv_blocks,
            compute_dtype=args.compute_dtype,
        )
    except ValueError as e:
        print(f"Error: {e}")
        return 1
    if model_cfg != ModelConfig(variant=args.model_options,
                                compute_dtype=args.compute_dtype):
        print(f"Detected non-default model size from the checkpoint: "
              f"{model_cfg}")
    model = build_model(model_cfg)
    # size the printed head from the data (the repr defaults to 256; a run
    # on other tile sizes must not misdescribe the model's Linear layer)
    from crosstalk_tpu.data.tiff import read_tile

    image_size = int(read_tile(index.samples[0].mixed_path).shape[0])
    artifacts.write_architecture_txt(
        output_dir, torch_style_repr(model_cfg, image_size=image_size)
    )
    print(f"Model architecture summary saved to {output_dir}/model_architecture.txt")

    store = TileStore(index.samples, jobs=args.cpu_jobs,
                      cache_dir=args.cache_dir)

    forward_fn = None
    if args.fast:
        from crosstalk_tpu.eval.fast_forward import make_fast_forward

        # The Pallas input-block kernel is TPU-only (Mosaic) and has no GSPMD
        # partitioning rule, so it is used only for single-device inference;
        # on other backends / sharded meshes the serving path still runs
        # (folded-BN bf16 XLA forward, which GSPMD shards cleanly).
        on_tpu = device.platform in ("tpu", "axon")
        forward_fn = make_fast_forward(model_cfg, use_pallas=on_tpu and n_dev == 1)

    from crosstalk_tpu.parallel.mesh import data_mesh

    mesh = data_mesh(n_dev) if n_dev > 1 else None

    print("\n--- Evaluating Model ---")
    with maybe_trace(args.profile):
        evaluate_and_save(
            model, variables, store,
            dataset_name="test", output_dir=output_dir, ts=ts,
            batch_size=args.batch_size, with_metrics=True,
            forward_fn=forward_fn, mesh=mesh,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

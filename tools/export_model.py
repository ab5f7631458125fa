#!/usr/bin/env python
"""Export a .pth checkpoint as a self-contained StableHLO serving artifact.

    python tools/export_model.py -p model.pth [-o single] [--out model.ctkx]
    [--batch_size 256] [--platforms tpu cpu] [--parity]

The artifact (io/export.py format) carries the lowered program + weights +
normalization — a symbolic batch dimension by default (any batch size;
--batch_size pins one static shape) — and loads with jax alone:

    from crosstalk_tpu.io.export import load_exported
    fn, meta = load_exported("model.ctkx")
    alphas = fn(tiles)          # (batch, 256, 256, 2) float32 -> (batch,)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--model_path", required=True,
                    help=".pth checkpoint to export")
    ap.add_argument("-o", "--model_options", default="single",
                    choices=["single", "double"])
    ap.add_argument("--initial_filters", type=int, default=None,
                    help="Model width override — must match the checkpoint "
                         "(reference config: 128 single / 64 per branch)")
    ap.add_argument("--num_conv_blocks", type=int, default=None,
                    help="Single-branch depth override — must match the "
                         "checkpoint (reference: 6)")
    ap.add_argument("--out", default=None,
                    help="Output path (default: <model_path>.ctkx)")
    ap.add_argument("--batch_size", type=int, default=None,
                    help="Pin one static batch shape (default: dynamic — "
                         "the artifact accepts any batch size)")
    ap.add_argument("--image_size", type=int, default=None,
                    help="Tile height/width (default: auto-detected from "
                         "the checkpoint's head dimensions)")
    ap.add_argument("--platforms", nargs="+", default=["tpu", "cpu"],
                    help="Target platforms to lower for")
    ap.add_argument("--parity", action="store_true",
                    help="Export the f32 parity forward instead of the "
                         "bf16 serving path")
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="Lower the opt-in int8 MXU tier instead of bf16 "
                         "(prediction error OUTSIDE the 1e-4 parity budget "
                         "— DEPLOY.md parity map). Calibrated activation "
                         "scales bake into the artifact, so the deployment "
                         "site needs no calibration data. Requires "
                         "--calibration_* dirs; incompatible with --parity")
    ap.add_argument("--calibration_mixed_dir", default=None,
                    help="--quantize int8: directory of mixed-channel tiles "
                         "from the serving distribution (paired with "
                         "--calibration_source_dir by filename)")
    ap.add_argument("--calibration_source_dir", default=None,
                    help="--quantize int8: directory of pure-source tiles "
                         "paired with --calibration_mixed_dir")
    ap.add_argument("--calibration_tiles", type=int, default=256,
                    help="--quantize int8: max tile pairs used for "
                         "activation-range calibration")
    args = ap.parse_args(argv)
    if args.batch_size is not None and args.batch_size <= 0:
        print(f"Error: --batch_size must be positive, got {args.batch_size}")
        return 1
    if args.quantize is not None:
        if args.parity:
            print("Error: --quantize int8 and --parity are mutually "
                  "exclusive (int8 is far outside the parity budget).")
            return 1
        if args.model_options == "double":
            print("Error: --quantize int8 is gated to the single-branch "
                  "family: on the two-branch model the tier is a measured "
                  "wash (no throughput win over bf16 — PERF_NOTES \"int8 "
                  "serving\") while still adding quantization error. Export "
                  "the default bf16 tier instead.")
            return 1
        if not (args.calibration_mixed_dir and args.calibration_source_dir):
            print("Error: --quantize int8 requires --calibration_mixed_dir "
                  "and --calibration_source_dir (tiles from the serving "
                  "distribution to calibrate activation ranges on).")
            return 1
        if args.calibration_tiles <= 0:
            print(f"Error: --calibration_tiles must be positive, got "
                  f"{args.calibration_tiles}")
            return 1
    elif args.calibration_mixed_dir or args.calibration_source_dir:
        print("Error: --calibration_* dirs only apply with --quantize int8.")
        return 1

    from crosstalk_tpu.config import ModelConfig
    from crosstalk_tpu.io.export import export_serving_model, save_exported
    from crosstalk_tpu.io.torch_convert import load_pth

    if args.num_conv_blocks is not None and args.model_options == "double":
        print("Error: --num_conv_blocks applies to the single-branch model "
              "only.")
        return 1
    try:
        variables = load_pth(args.model_path, args.model_options)
    except (FileNotFoundError, KeyError, ValueError) as e:
        print(f"Error loading model from {args.model_path}: {e}")
        return 1
    # Size the model from the checkpoint itself (flags, when given, are
    # validated against it)
    from crosstalk_tpu.io.torch_convert import model_config_for_checkpoint

    try:
        cfg = model_config_for_checkpoint(
            args.model_options, variables,
            initial_filters=args.initial_filters,
            num_conv_blocks=args.num_conv_blocks,
            compute_dtype="f32" if args.parity else "bf16",
        )
    except ValueError as e:
        print(f"Error: {e}")
        return 1
    if cfg != ModelConfig(variant=args.model_options,
                          compute_dtype="f32" if args.parity else "bf16"):
        print(f"Detected non-default model size from the checkpoint: {cfg}")
    from crosstalk_tpu.io.torch_convert import (
        _compatible_px_range,
        image_size_compatible,
        infer_image_size,
    )

    try:
        detected_px = infer_image_size(variables, args.model_options)
    except (KeyError, ValueError) as e:
        print(f"Error: {e}")
        return 1
    if args.image_size is None:
        args.image_size = detected_px
        if detected_px != 256:
            print(f"Detected tile size from the checkpoint: {detected_px}px")
    elif not image_size_compatible(variables, args.model_options,
                                   args.image_size):
        lo, hi = _compatible_px_range(variables, args.model_options)
        print(f"Error: --image_size {args.image_size} does not match the "
              f"checkpoint's head (compatible tile sizes: {lo}-{hi}px).")
        return 1
    int8_scales = None
    if args.quantize == "int8":
        from crosstalk_tpu.eval.int8_forward import (
            calibrate_int8,
            load_calibration_tiles,
        )

        try:
            calib = load_calibration_tiles(
                args.calibration_mixed_dir, args.calibration_source_dir,
                args.image_size, max_tiles=args.calibration_tiles)
        except (ValueError, FileNotFoundError, OSError) as e:
            print(f"Error loading calibration tiles: {e}")
            return 1
        print(f"Calibrating int8 activation ranges on "
              f"{calib.shape[0]} tile pairs...")
        # exported programs never use the Pallas kernel (see io/export.py)
        int8_scales = calibrate_int8(cfg, variables, calib, use_pallas=False)

    path_name = ("f32 parity" if args.parity
                 else "int8 serving" if args.quantize
                 else "bf16 serving")
    print(f"Lowering for {args.platforms} "
          f"(batch {'dynamic' if args.batch_size is None else args.batch_size}, "
          f"{args.image_size}px, {path_name})...")
    blob, weights = export_serving_model(
        variables, cfg, args.batch_size, image_size=args.image_size,
        fast=not args.parity, platforms=args.platforms,
        int8_scales=int8_scales,
    )
    out = args.out or args.model_path + ".ctkx"
    from crosstalk_tpu.io.torch_convert import infer_model_size

    save_exported(out, blob, weights, {
        "model": args.model_options,
        **infer_model_size(variables, args.model_options),
        "checkpoint": os.path.basename(args.model_path),
        "batch_size": ("dynamic" if args.batch_size is None
                       else args.batch_size),
        "image_size": args.image_size,
        "platforms": args.platforms,
        "path": ("f32-parity" if args.parity
                 else "int8-serving" if args.quantize
                 else "bf16-serving"),
        **({"calibration_tiles": int(calib.shape[0])}
           if int8_scales is not None else {}),
    })
    print(f"Wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

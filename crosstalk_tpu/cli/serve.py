"""Serving CLI — online inference over HTTP with dynamic batching.

No reference counterpart (djpbarry/Torch-Unet is offline-only; its eval CLI
test-cross-talk-model.py:228-324 scores a directory in one pass). This is
the production-serving surface of the same model checkpoints: load a
``.pth``, compile ONE fixed-shape program (serving path by default), and
coalesce concurrent HTTP requests into full device batches.

Example:
  python -m crosstalk_tpu.cli.serve -p model.pth -o single --port 8000
  curl -s http://127.0.0.1:8000/healthz
  python - <<'EOF'
  import io, json, urllib.request, numpy as np
  buf = io.BytesIO()
  np.savez(buf, mixed=np.random.rand(4, 256, 256), source=np.random.rand(4, 256, 256))
  req = urllib.request.Request("http://127.0.0.1:8000/predict", data=buf.getvalue())
  print(json.load(urllib.request.urlopen(req))["alpha"])
  EOF
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Serve a crosstalk regression checkpoint over HTTP."
    )
    parser.add_argument("-p", "--model_path", type=str, default=None,
                        help="Path to the .pth checkpoint to serve")
    parser.add_argument("--artifact", type=str, default=None,
                        help="Serve a .ctkx AOT export (tools/export_model.py)"
                             " instead of a checkpoint. Its image size/model "
                             "override the flags; dynamic-batch artifacts "
                             "(the export default) serve at --batch_size, "
                             "pinned ones dictate their own shape")
    parser.add_argument("-o", "--model_options", type=str, default="single",
                        choices=["single", "double"],
                        help="Use single- or double-branch model")
    parser.add_argument("--initial_filters", type=int, default=None,
                        help="Model width override — must match the "
                             "checkpoint (reference config: 128 single / "
                             "64 per branch double)")
    parser.add_argument("--num_conv_blocks", type=int, default=None,
                        help="Single-branch depth override — must match "
                             "the checkpoint (reference: 6)")
    parser.add_argument("--host", type=str, default="127.0.0.1",
                        help="Bind address (0.0.0.0 to accept remote traffic)")
    parser.add_argument("--port", type=int, default=8000,
                        help="Bind port (0 picks a free port)")
    parser.add_argument("--batch_size", type=int, default=256,
                        help="Static device batch size; requests are "
                             "coalesced and padded to exactly this shape")
    parser.add_argument("--batch_buckets", type=str, default=None,
                        help="Comma-separated extra batch shapes below "
                             "--batch_size (e.g. '32,128'). A partially-"
                             "filled flush dispatches at the smallest "
                             "bucket that holds it, so light traffic pays "
                             "a small device call + transfer instead of a "
                             "full batch_size one. Each bucket compiles "
                             "its own program at startup. Requires -p")
    parser.add_argument("--max_delay_ms", type=float, default=5.0,
                        help="Max time a queued tile waits for a full batch")
    parser.add_argument("--image_size", type=int, default=None,
                        help="Tile height/width (default: auto-detected "
                             "from the checkpoint / artifact metadata; "
                             "256 when neither records it)")
    parser.add_argument("--parity", action="store_true",
                        help="Serve the f32 checkpoint-parity forward instead "
                             "of the bf16 serving path (slower, ~1e-8 MAE "
                             "vs the reference)")
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8"],
                        help="Serve the opt-in int8 MXU tier instead of "
                             "bf16 (faster on FLOPs-bound chips; prediction "
                             "error OUTSIDE the 1e-4 parity budget — see "
                             "DEPLOY.md's parity map). Requires -p and "
                             "--calibration_* dirs; incompatible with "
                             "--parity")
    parser.add_argument("--calibration_mixed_dir", type=str, default=None,
                        help="--quantize int8: directory of mixed-channel "
                             "tiles drawn from the serving distribution "
                             "(paired with --calibration_source_dir by "
                             "filename, labeled or unlabeled schema); the "
                             "activation ranges are calibrated on up to "
                             "--calibration_tiles of them at startup")
    parser.add_argument("--calibration_source_dir", type=str, default=None,
                        help="--quantize int8: directory of pure-source "
                             "tiles paired with --calibration_mixed_dir")
    parser.add_argument("--calibration_tiles", type=int, default=256,
                        help="--quantize int8: max tile pairs used for "
                             "activation-range calibration")
    parser.add_argument("--num_devices", type=int, default=None,
                        help="Shard each batch over this many devices "
                             "(default 1; batch_size must divide it)")
    parser.add_argument("--request_timeout", type=float, default=120.0,
                        help="Per-request result timeout, seconds")
    parser.add_argument("--io_timeout", type=float, default=60.0,
                        help="Per-connection socket read timeout, seconds "
                             "(frees handler threads from clients that "
                             "stall mid-body or idle on keep-alive)")
    parser.add_argument("--transport_dtype", type=str, default="float32",
                        choices=["float32", "float16"],
                        help="Dtype of the assembled device batch. float16 "
                             "halves host->device transfer (the serving "
                             "bottleneck on bandwidth-limited links) with "
                             "~1e-3 alpha perturbation; requires -p (the "
                             "predictor casts on device). Pair with the "
                             "client's predict(dtype='float16') to halve "
                             "the HTTP wire too")
    parser.add_argument("--max_body_mb", type=int, default=256,
                        help="Reject request bodies above this many MiB "
                             "(memory-safety cap for public binds)")
    parser.add_argument("--max_tiles", type=int, default=4096,
                        help="Reject requests holding more than this many "
                             "decoded tiles")
    parser.add_argument("--allow_reload", action="store_true",
                        help="Enable POST /reload {\"model_path\": ...}: "
                             "zero-downtime checkpoint hot-swap (the new "
                             ".pth loads and compiles while the old model "
                             "keeps serving, then batches switch over "
                             "atomically). Loading a .pth unpickles it — "
                             "enable only on trusted/admin networks. "
                             "Requires -p (not --artifact)")
    parser.add_argument("--verbose", action="store_true",
                        help="Log each HTTP request")
    return parser


def _load_calibration_batch(args, image_size):
    """Load, pair, decode, and normalize up to --calibration_tiles pairs
    for int8 activation-range calibration. -> (n, px, px, 2) f32 normalized
    array, or None (with a printed error)."""
    from crosstalk_tpu.eval.int8_forward import load_calibration_tiles

    try:
        return load_calibration_tiles(
            args.calibration_mixed_dir, args.calibration_source_dir,
            image_size, max_tiles=args.calibration_tiles)
    except (ValueError, FileNotFoundError, OSError) as e:
        print(f"Error loading calibration tiles: {e}")
        return None


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if not 0 <= args.port <= 65535:
        print(f"Error: --port must be in 0-65535, got {args.port}")
        return 1
    if args.image_size is not None and args.image_size <= 0:
        print(f"Error: --image_size must be positive, got {args.image_size}")
        return 1

    import jax

    from crosstalk_tpu.serve.server import CrosstalkServer
    from crosstalk_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if bool(args.model_path) == bool(args.artifact):
        print("Error: pass exactly one of -p/--model_path or --artifact.")
        return 1

    if args.quantize is not None:
        if not args.model_path:
            print("Error: --quantize int8 requires a checkpoint (-p); to "
                  "serve an int8 AOT artifact, export it with "
                  "tools/export_model.py --quantize int8 (the tier is "
                  "baked into the artifact).")
            return 1
        if args.parity:
            print("Error: --quantize int8 and --parity are mutually "
                  "exclusive (int8 is far outside the parity budget).")
            return 1
        if args.model_options == "double":
            print("Error: --quantize int8 is gated to the single-branch "
                  "family: on the two-branch model the tier is a measured "
                  "wash (no throughput win over bf16 — PERF_NOTES \"int8 "
                  "serving\") while still adding quantization error. Serve "
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

    buckets = None
    if args.batch_buckets:
        if not args.model_path:
            print("Error: --batch_buckets requires a checkpoint (-p); AOT "
                  "artifacts are lowered at fixed shapes.")
            return 1
        from crosstalk_tpu.serve.batcher import parse_batch_buckets

        try:
            buckets = parse_batch_buckets(args.batch_buckets, args.batch_size)
        except ValueError as e:
            print(f"Error: {e}")
            return 1

    n_dev = 1 if args.num_devices is None else args.num_devices
    if n_dev <= 0 or n_dev > len(jax.devices()):
        print(f"Error: --num_devices {n_dev} requested but only "
              f"{len(jax.devices())} device(s) are visible.")
        return 1

    device = jax.devices()[0]
    if args.artifact:
        # Serve a pre-lowered AOT artifact (weights ride in the file;
        # dynamic-batch artifacts accept any batch size).
        from crosstalk_tpu.io.export import load_exported

        print("--- Loading AOT artifact ---")
        try:
            fn, meta = load_exported(args.artifact)
        except (FileNotFoundError, ValueError) as e:
            print(f"Error loading artifact {args.artifact}: {e}")
            return 1
        if n_dev > 1:
            print("Error: --num_devices > 1 requires a checkpoint "
                  "(-p); AOT artifacts are lowered single-device.")
            return 1
        if args.transport_dtype != "float32":
            print("Error: --transport_dtype float16 requires a checkpoint "
                  "(-p); AOT artifacts are lowered for float32 input.")
            return 1
        if args.allow_reload:
            print("Error: --allow_reload requires a checkpoint (-p); AOT "
                  "artifacts carry their weights in the file.")
            return 1
        meta_bs = meta.get("batch_size", "dynamic")
        # dynamic-batch artifacts serve at the --batch_size flag; a pinned
        # artifact dictates its own shape
        batch_size = args.batch_size if meta_bs == "dynamic" else int(meta_bs)
        meta_px = meta.get("image_size")
        if (meta_px is not None and args.image_size is not None
                and int(meta_px) != args.image_size):
            print(f"Error: --image_size {args.image_size} does not match "
                  f"the artifact (exported for {int(meta_px)}px tiles).")
            return 1
        if meta_px is not None:
            image_size = int(meta_px)
        elif args.image_size is not None:  # validated positive above
            image_size = args.image_size
        else:
            image_size = 256
        predict = fn
        import numpy as np

        predict(np.zeros((batch_size, image_size, image_size, 2),
                         np.float32))  # compile before the first request
        model_info = {"artifact": args.artifact, **meta, "devices": 1}
        print(f"Using device: {device.platform}:{device.device_kind} x1")
        print(f"Serving artifact (batch {batch_size}, {image_size}px, "
              f"{meta.get('path', '?')})")
    else:
        from crosstalk_tpu.config import ModelConfig
        from crosstalk_tpu.io.torch_convert import load_pth
        from crosstalk_tpu.serve.predictor import make_predictor

        print("--- Loading model weights ---")
        try:
            variables = load_pth(args.model_path, args.model_options)
        except (FileNotFoundError, KeyError, ValueError) as e:
            print(f"Error loading model from {args.model_path}: {e}")
            return 1

        if args.num_conv_blocks is not None and args.model_options == "double":
            print("Error: --num_conv_blocks applies to the single-branch "
                  "model only.")
            return 1
        # Size the model from the checkpoint itself (flags, when given,
        # are validated against it)
        from crosstalk_tpu.io.torch_convert import model_config_for_checkpoint

        try:
            model_cfg = model_config_for_checkpoint(
                args.model_options, variables,
                initial_filters=args.initial_filters,
                num_conv_blocks=args.num_conv_blocks,
                compute_dtype="f32" if args.parity else "bf16",
            )
        except ValueError as e:
            print(f"Error: {e}")
            return 1
        if model_cfg != ModelConfig(
            variant=args.model_options,
            compute_dtype="f32" if args.parity else "bf16",
        ):
            print(f"Detected non-default model size from the checkpoint: "
                  f"{model_cfg}")

        mesh = None
        if n_dev > 1:
            from crosstalk_tpu.parallel.mesh import data_mesh

            mesh = data_mesh(n_dev)

        batch_size = args.batch_size
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
            image_size = detected_px
            if detected_px != 256:
                print(f"Detected tile size from the checkpoint: "
                      f"{detected_px}px")
        elif not image_size_compatible(variables, args.model_options,
                                       args.image_size):
            lo, hi = _compatible_px_range(variables, args.model_options)
            print(f"Error: --image_size {args.image_size} does not match "
                  f"the checkpoint's head (compatible tile sizes: "
                  f"{lo}-{hi}px).")
            return 1
        else:
            image_size = args.image_size
        serve_sizes = (buckets or []) + [batch_size]
        if mesh is not None:
            bad = [b for b in serve_sizes if b % n_dev != 0]
            if bad:
                print(f"Error: batch shapes {bad} must divide across "
                      f"{n_dev} devices.")
                return 1
        print(f"Using device: {device.platform}:{device.device_kind} x{n_dev}")
        import numpy as np

        calib_batch = None
        int8_scales = None

        def _calibrate(vars_):
            # one calibration site for startup AND /reload — the
            # use_pallas condition must match between them or a reload
            # would silently serve a differently-calibrated program
            from crosstalk_tpu.eval.int8_forward import calibrate_int8

            return calibrate_int8(
                model_cfg, vars_, calib_batch,
                use_pallas=(device.platform in ("tpu", "axon")
                            and n_dev == 1),
            )

        if args.quantize == "int8":
            calib_batch = _load_calibration_batch(args, image_size)
            if calib_batch is None:
                return 1
            print(f"Calibrating int8 activation ranges on "
                  f"{calib_batch.shape[0]} tile pairs...")
            int8_scales = _calibrate(variables)

        path_name = ("f32 parity" if args.parity
                     else "int8 serving" if args.quantize
                     else "bf16 serving")
        shapes = f"batch {batch_size}" + (
            f" + buckets {buckets}" if buckets else "")
        print(f"Compiling serving program ({shapes}, {path_name} path)...")

        predict = make_predictor(
            variables, model_cfg, serve_sizes,
            image_size=image_size, fast=not args.parity, mesh=mesh,
            input_dtype=np.dtype(args.transport_dtype),
            int8_scales=int8_scales,
        )
        from crosstalk_tpu.io.torch_convert import infer_model_size

        model_info = {
            "model": args.model_options,
            **infer_model_size(variables, args.model_options),
            "checkpoint": args.model_path,
            "image_size": image_size,
            "path": ("f32-parity" if args.parity
                     else "int8-serving" if args.quantize
                     else "bf16-serving"),
            "batch_size": batch_size,
            "devices": n_dev,
            "transport_dtype": args.transport_dtype,
        }
        if buckets:
            model_info["batch_buckets"] = buckets

    reload_fn = None
    if args.allow_reload:
        # POST /reload: load + compile the new checkpoint with the SAME
        # serving configuration, then the server swaps it in atomically
        def reload_fn(path):
            new_vars = load_pth(path, args.model_options)
            from crosstalk_tpu.io.torch_convert import infer_model_size

            new_size = infer_model_size(new_vars, args.model_options)
            old_size = infer_model_size(variables, args.model_options)
            if new_size != old_size:
                raise ValueError(
                    f"checkpoint size mismatch: serving {old_size}, "
                    f"reload candidate is {new_size} — restart the server "
                    "to change model size"
                )
            if not image_size_compatible(new_vars, args.model_options,
                                         image_size):
                new_px = infer_image_size(new_vars, args.model_options)
                raise ValueError(
                    f"tile-size mismatch: serving {image_size}px, reload "
                    f"candidate was trained at {new_px}px — restart the "
                    "server to change tile size"
                )
            new_scales = None
            if calib_batch is not None:
                # activation ranges depend on the weights upstream of each
                # quantize point — recalibrate for the swapped-in checkpoint
                new_scales = _calibrate(new_vars)
            new_predict = make_predictor(
                new_vars, model_cfg, serve_sizes,
                image_size=image_size, fast=not args.parity, mesh=mesh,
                input_dtype=np.dtype(args.transport_dtype),
                int8_scales=new_scales,
            )
            return new_predict, {**model_info, "checkpoint": path}

    server = CrosstalkServer(
        predict,
        batch_size=batch_size,
        image_size=image_size,
        host=args.host,
        port=args.port,
        max_delay_ms=args.max_delay_ms,
        model_info=model_info,
        request_timeout=args.request_timeout,
        verbose=args.verbose,
        max_body_bytes=args.max_body_mb << 20,
        max_tiles=args.max_tiles,
        transport_dtype=(args.transport_dtype if args.model_path
                         else "float32"),
        reload_fn=reload_fn,
        bucket_sizes=buckets,
        io_timeout=args.io_timeout,
    )
    host, port = server.address
    endpoints = "POST /predict, GET /healthz, GET /stats, GET /metrics" + (
        ", POST /reload" if reload_fn is not None else "")
    print(f"Serving on http://{host}:{port}  ({endpoints}) — Ctrl-C to stop")

    # SIGTERM (the orchestrator-standard stop signal) drains like Ctrl-C:
    # stop accepting, flush queued batches, resolve in-flight futures. The
    # handler disarms itself so an escalated second SIGTERM can't abort the
    # drain mid-flush.
    import signal

    def _sigterm(signum, frame):
        signal.signal(signal.SIGTERM, signal.SIG_IGN)
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        print("\nShutting down...")
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

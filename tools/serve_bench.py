#!/usr/bin/env python
"""Load-test the serving stack: dynamic batcher + HTTP front under
concurrent clients, reporting throughput and latency percentiles.

Measures the ONLINE serving path end-to-end (HTTP parse -> batcher queue ->
padded static-shape device batch -> JSON response), the number that matters
for deployment — bench.py's scan methodology measures the raw device
ceiling instead. Run on the TPU host:

    python tools/serve_bench.py [--batch_size 256] [--clients 8]
    [--tiles_per_request 32] [--seconds 20] [--parity] [-o single]

Uses a freshly initialized model (serving throughput is weight-independent);
pass -p to serve a real checkpoint instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--model_options", default="single",
                    choices=["single", "double"])
    ap.add_argument("-p", "--model_path", default=None,
                    help=".pth to serve (default: fresh init)")
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--batch_buckets", type=str, default=None,
                    help="Comma-separated extra batch shapes below "
                         "batch_size (see cli.serve --batch_buckets): "
                         "light-traffic flushes ride the smallest bucket")
    ap.add_argument("--max_delay_ms", type=float, default=5.0)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--tiles_per_request", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--transport_dtype", default="float32",
                    choices=["float32", "float16"],
                    help="Device-batch dtype (float16 halves H2D bytes)")
    ap.add_argument("--client_dtype", default=None,
                    choices=["float32", "float16"],
                    help="Client payload dtype (float16 halves HTTP bytes);"
                         " default: the transport dtype")
    args = ap.parse_args(argv)

    import jax

    from crosstalk_tpu.config import ModelConfig
    from crosstalk_tpu.serve.client import CrosstalkClient
    from crosstalk_tpu.serve.predictor import make_predictor
    from crosstalk_tpu.serve.server import CrosstalkServer
    from crosstalk_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = ModelConfig(variant=args.model_options,
                      compute_dtype="f32" if args.parity else "bf16")
    if args.model_path:
        from crosstalk_tpu.io.torch_convert import load_pth

        variables = load_pth(args.model_path, args.model_options)
    else:
        from crosstalk_tpu.models import build_model, init_model

        variables = init_model(build_model(cfg), jax.random.key(0),
                               image_size=args.image_size)

    buckets = None
    if args.batch_buckets:
        from crosstalk_tpu.serve.batcher import parse_batch_buckets

        try:  # validate BEFORE make_predictor compiles anything
            buckets = parse_batch_buckets(args.batch_buckets, args.batch_size)
        except ValueError as e:
            print(f"Error: {e}", file=sys.stderr)
            return 1
    print(f"Compiling (batch {args.batch_size}"
          + (f" + buckets {buckets}" if buckets else "")
          + f", {'f32' if args.parity else 'bf16'}, "
          f"{args.transport_dtype} transport)...", file=sys.stderr)
    predict = make_predictor(variables, cfg,
                             (buckets or []) + [args.batch_size],
                             image_size=args.image_size,
                             fast=not args.parity,
                             input_dtype=np.dtype(args.transport_dtype))
    server = CrosstalkServer(predict, batch_size=args.batch_size,
                             image_size=args.image_size, port=0,
                             max_delay_ms=args.max_delay_ms,
                             transport_dtype=args.transport_dtype,
                             bucket_sizes=buckets)
    server.start_background()
    host, port = server.address
    client_url = f"http://{host}:{port}"
    print(f"Serving on {client_url}; {args.clients} clients x "
          f"{args.tiles_per_request} tiles/request for {args.seconds}s",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    tiles = rng.random(
        (args.tiles_per_request, args.image_size, args.image_size, 2),
        np.float32,
    )
    latencies, counts = [], []
    stop = time.monotonic() + args.seconds
    lock = threading.Lock()

    client_dtype = args.client_dtype or args.transport_dtype

    failures = []

    def worker():
        c = CrosstalkClient(client_url)
        n, lats = 0, []
        try:
            while time.monotonic() < stop:
                t0 = time.monotonic()
                out = c.predict(tiles, dtype=client_dtype)
                lats.append(time.monotonic() - t0)
                n += out.shape[0]
        except Exception as e:  # noqa: BLE001 — a dead client must FAIL the
            with lock:          # bench, not silently deflate its numbers
                failures.append(f"{type(e).__name__}: {e}")
        with lock:
            counts.append(n)
            latencies.extend(lats)

    t_start = time.monotonic()
    threads = [threading.Thread(target=worker) for _ in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t_start

    lat = np.sort(np.asarray(latencies))
    total = int(sum(counts))
    stats = server.batcher.stats()
    server.shutdown()
    if failures:
        print(json.dumps({"error": "client worker(s) failed mid-run — "
                                   "throughput numbers would be wrong",
                          "failures": failures[:8]}))
        return 1
    if len(lat) == 0:
        print(json.dumps({"error": "no requests completed in the window; "
                                   "raise --seconds or lower --batch_size"}))
        return 1
    print(json.dumps({
        "tiles_per_sec": round(total / wall, 1),
        "requests": len(lat),
        "latency_ms_p50": round(float(lat[len(lat) // 2] * 1e3), 2),
        "latency_ms_p95": round(float(lat[int(len(lat) * 0.95)] * 1e3), 2),
        "latency_ms_max": round(float(lat[-1] * 1e3), 2),
        "batch_occupancy": round(stats.get("mean_batch_occupancy", 0.0), 3),
        "device_busy_frac": round(stats["device_seconds"] / wall, 3),
        "batches": stats["batches"],
        "transport_dtype": args.transport_dtype,
        "client_dtype": client_dtype,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

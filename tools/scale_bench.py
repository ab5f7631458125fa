#!/usr/bin/env python
"""End-to-end pipeline scale test (BASELINE config #5's shape: large dataset,
host prefetch feeding the accelerator).

Measures, on a generated N-pair dataset:
  1. cold packed-cache build rate (native C++ decode -> memmapped cache);
  2. steady-state epoch throughput of the REAL training path
     (iterate_batches -> device_prefetch -> donated jitted train step),
     i.e. host pipeline + H2D + compute together, not a kernel microbench.

Usage: python tools/scale_bench.py [-n 2000] [-b 128] [--epochs 2]
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("-n", "--num_pairs", type=int, default=2000)
    parser.add_argument("-b", "--batch_size", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--keep", action="store_true")
    parser.add_argument("--data_dir", default=None,
                        help="Reuse an existing generated dataset directory "
                             "(skips generation; implies --keep)")
    parser.add_argument("--feed_only", action="store_true",
                        help="Measure the HOST pipeline's batch-production "
                             "rate (memmap reads + batch assembly, no "
                             "device) — the rate that must exceed the "
                             "chip's ~5k tiles/s consumption")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from crosstalk_tpu.config import ModelConfig, OptimConfig
    from crosstalk_tpu.data.index import PairIndex
    from crosstalk_tpu.data.pipeline import TileStore, device_prefetch, iterate_batches
    from crosstalk_tpu.models import build_model, init_model
    from crosstalk_tpu.train.steps import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from tools.make_dataset import main as make_dataset

    if args.data_dir:
        root = args.data_dir
        args.keep = True
        os.makedirs(root, exist_ok=True)
    else:
        root = tempfile.mkdtemp(prefix="crosstalk_scale_")
    try:
        if not os.path.isdir(os.path.join(root, "Mixed")):
            print(f"Generating {args.num_pairs} pairs under {root} ...")
            t0 = time.perf_counter()
            make_dataset([root, "-n", str(args.num_pairs)])
            print(f"  generated in {time.perf_counter() - t0:.1f}s")

        index = PairIndex(os.path.join(root, "Mixed"), os.path.join(root, "Source"))
        cache_path = os.path.join(root, "cache")
        cold = not os.path.isdir(cache_path) or not os.listdir(cache_path)
        t0 = time.perf_counter()
        store = TileStore(index.samples, jobs=8, cache_dir=cache_path)
        dt = time.perf_counter() - t0
        cache_gb = store.tiles.nbytes / 1e9
        print(f"{'cold' if cold else 'warm'} cache build: {len(store)} pairs "
              f"in {dt:.1f}s ({2 * len(store) / dt:,.0f} tiles/s; "
              f"cache {cache_gb:.1f} GB"
              + ("; one-time cost, usually disk-writeback-bound - warm "
                 "decode is ~2-5k tiles/s/core)" if cold else ")"))

        if args.feed_only:
            # host-pipeline production rate: the full iterate_batches path
            # (memmapped reads, shuffle gather, pad/mask assembly) consumed
            # as fast as the host can produce it. This is the feeding rate
            # that must exceed the chip's ~5k tiles/s; the device link is
            # probed separately below when a device is present.
            sink = 0.0
            for epoch in range(args.epochs):
                t0 = time.perf_counter()
                n = 0
                for batch in iterate_batches(store, args.batch_size,
                                             shuffle=True, drop_last=True,
                                             seed=1, epoch=epoch):
                    sink += float(batch.inputs[0, 0, 0, 0]) + float(batch.labels[0, 0])
                    n += args.batch_size
                dt = time.perf_counter() - t0
                print(f"feed epoch {epoch}: {n} tiles in {dt:.1f}s -> "
                      f"{n / dt:,.0f} tiles/s host-pipeline production")
            print(f"(sink {sink:.3f})")
            return 0

        # isolate the host->device link (through this environment's TPU
        # relay it can be ~50 MB/s vs 10-30 GB/s PCIe on a real TPU host —
        # if so, end-to-end numbers below are transfer-bound, not framework-
        # bound)
        import jax as _jax

        probe = np.random.default_rng(9).random(
            (args.batch_size, 256, 256, 2)).astype(np.float32)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            a = _jax.device_put(probe)
            float(np.asarray(a.ravel()[0]))
            best = min(best, time.perf_counter() - t0)
        h2d = probe.nbytes / best / 1e6
        print(f"H2D link: {h2d:,.0f} MB/s ({probe.nbytes / 1e6:.0f} MB/batch "
              f"-> ~{args.batch_size / best:,.0f} tiles/s transfer ceiling)")

        model = build_model(ModelConfig(variant="single", compute_dtype="bf16"))
        variables = init_model(model, jax.random.key(0), image_size=256)
        tx = make_optimizer(OptimConfig())
        state = init_train_state(model, variables, tx)
        step = make_train_step(model, tx)

        for epoch in range(args.epochs):
            t0 = time.perf_counter()
            n_steps = 0
            last_loss = None
            for batch in device_prefetch(
                iterate_batches(store, args.batch_size, shuffle=True,
                                drop_last=True, seed=1, epoch=epoch)
            ):
                state, last_loss = step(
                    state, batch.inputs, batch.labels,
                    np.float32(1e-4), jax.random.fold_in(jax.random.key(2), n_steps),
                )
                n_steps += 1
            loss = float(np.asarray(last_loss))  # device fence
            dt = time.perf_counter() - t0
            tiles = n_steps * args.batch_size
            print(f"epoch {epoch}: {tiles} tiles in {dt:.1f}s -> "
                  f"{tiles / dt:,.0f} tiles/s end-to-end (loss {loss:.4f})")
        return 0
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())

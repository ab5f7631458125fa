#!/usr/bin/env python
"""Synthetic dataset generator in the reference's on-disk layout.

Writes N paired tiles (`image_<ID>_alpha_<A>_(mixed|source).tif`, float64,
the bundled dataset's exact flavor) for pipeline/scale testing — e.g. an
IDR-scale stand-in when the real 40k-image corpus isn't mounted.

Usage: python tools/make_dataset.py OUT_DIR [-n N] [--size 256] [--seed 0]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from crosstalk_tpu.data.tiff import write_tile  # noqa: E402


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir")
    parser.add_argument("-n", "--num_pairs", type=int, default=1000)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    mixed_dir = os.path.join(args.out_dir, "Mixed")
    source_dir = os.path.join(args.out_dir, "Source")
    os.makedirs(mixed_dir, exist_ok=True)
    os.makedirs(source_dir, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    for i in range(args.num_pairs):
        image_id = 100000 + i
        alpha = round(float(rng.uniform(0.01, 0.5)), 2)
        # blobby microscopy-ish structure: smoothed noise
        def field():
            base = rng.random((args.size // 8, args.size // 8))
            return np.kron(base, np.ones((8, 8)))[: args.size, : args.size]

        source = field() + 0.05 * rng.random((args.size, args.size))
        other = field() + 0.05 * rng.random((args.size, args.size))
        mixed = other + alpha * source
        name = f"image_{image_id}_alpha_{alpha}"
        write_tile(os.path.join(mixed_dir, f"{name}_mixed.tif"), mixed)
        write_tile(os.path.join(source_dir, f"{name}_source.tif"), source)
        if (i + 1) % 500 == 0:
            print(f"{i + 1}/{args.num_pairs}", flush=True)
    print(f"Wrote {args.num_pairs} pairs under {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

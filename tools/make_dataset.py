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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from crosstalk_tpu.data.synthetic import _PRESETS, generate_dataset  # noqa: E402


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir")
    parser.add_argument("-n", "--num_pairs", type=int, default=1000)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--preset", type=str, default="uniform",
                        choices=sorted(_PRESETS),
                        help="'uniform': v1 dense blocks, independent "
                             "channels. 'microscopy': matched to the real "
                             "bundled IDR tiles' statistics (sparse "
                             "log-skewed intensities, correlated channels, "
                             "faint raw source scale)")
    args = parser.parse_args(argv)

    generate_dataset(args.out_dir, args.num_pairs, args.size, args.seed,
                     preset=args.preset)
    print(f"Wrote {args.num_pairs} pairs under {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Reference-compatible training entry point (same filename, flags, and
output contract as the reference's train_model.py). Thin wrapper over
crosstalk_tpu.cli.train."""
import sys

from crosstalk_tpu.cli.train import main

if __name__ == "__main__":
    sys.exit(main())

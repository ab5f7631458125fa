#!/usr/bin/env python
"""Reference-compatible evaluation entry point (same filename, flags, and
output contract as the reference's test-cross-talk-model.py). Thin wrapper
over crosstalk_tpu.cli.evaluate."""
import sys

from crosstalk_tpu.cli.evaluate import main

if __name__ == "__main__":
    sys.exit(main())

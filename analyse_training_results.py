#!/usr/bin/env python
"""Reference-compatible sweep-analysis entry point (same filename and output
contract as the reference's analyse_training_results.py; the hardcoded base
path becomes the -d flag). Thin wrapper over crosstalk_tpu.cli.analyse."""
import sys

from crosstalk_tpu.cli.analyse import main

if __name__ == "__main__":
    sys.exit(main())

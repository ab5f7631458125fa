"""Opt-in performance-regression guard.

The bench.py headline rates are the framework's coverage claim against
BASELINE.md (>=5k 256px tiles/s/chip) — load-bearing numbers that, until
this guard, were only re-measured manually each round. This test pins the
round-4 driver-captured rates (BENCH_r04.json, one real v5e chip) and fails
loudly if a toolchain change (jax/libtpu bump, kernel edit) silently costs
throughput.

Opt-in (`CROSSTALK_RUN_PERF=1`) because it needs exclusive use of a real
TPU chip and several minutes of wall clock; the CPU-only unit suite skips
it. Run it from the repo root on a TPU host:

    CROSSTALK_RUN_PERF=1 python -m pytest tests/test_perf_guard.py -q

Updating the pins is a deliberate act: re-measure with `python bench.py`
on an idle chip, confirm the change is intended (PERF_NOTES.md "Perf
regression guard"), and edit PINS with the new numbers in the same commit
that explains why.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# BENCH_r04.json rates (tiles/s on one v5e chip). Lower-bound-only: faster
# is never a regression.
PINS = {
    "infer_tps": 5142.9,
    "train_tps": 1075.7,
    "two_branch_infer_tps": 6271.4,
    "two_branch_train_tps": 1195.2,
    "int8_infer_tps": 6918.3,
}
# 5% headroom covers run-to-run chip noise (bench takes best-of-3 per rate;
# observed cross-round spread on identical code is ~1-2%).
TOLERANCE = 0.95


@pytest.mark.skipif(
    not os.environ.get("CROSSTALK_RUN_PERF"),
    reason="opt-in: CROSSTALK_RUN_PERF=1 on an idle machine with a real TPU",
)
def test_bench_rates_hold_the_pinned_floor():
    # restore the ambient TPU environment that conftest's CPU re-exec
    # stripped (stashed there as CROSSTALK_TPU_*). The PYTHONPATH stash key
    # is the marker that a re-exec happened at all: on an axon-free host
    # conftest never re-execs, no stash exists, and the ambient env already
    # IS the TPU env — touch nothing in that case.
    env = dict(os.environ)
    if "CROSSTALK_TPU_PYTHONPATH" in env:
        for var in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS"):
            stashed = env.pop(f"CROSSTALK_TPU_{var}", "")
            if stashed:
                env[var] = stashed
            else:
                env.pop(var, None)
    env.pop("CROSSTALK_TEST_REEXEC", None)

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    result = json.loads(line)

    if "TPU" not in str(result.get("device", "")):
        pytest.skip(f"bench ran on {result.get('device')!r}, not a TPU — "
                    "the pins are v5e-chip rates")

    failures = {
        key: (result[key], pin)
        for key, pin in PINS.items()
        if result[key] < TOLERANCE * pin
    }
    assert not failures, (
        "throughput regression vs BENCH_r04 pins (measured, pinned): "
        f"{failures} — if intentional, update tests/test_perf_guard.py "
        "PINS per its docstring"
    )

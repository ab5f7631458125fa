"""Doctor CLI — verify an installation/deployment end to end.

Deployment extension with no reference counterpart (the reference's
failure mode is a stack trace minutes into a run — e.g. its hardcoded
256px dummy forward at regression_model.py:52-56, or a missing dependency
surfacing mid-import at train_model.py:1-17). This command front-loads
every environment check a production rollout cares about and reports them
in one pass:

    python -m crosstalk_tpu doctor                  # environment only
    python -m crosstalk_tpu doctor -p model.pth     # + checkpoint load
    python -m crosstalk_tpu doctor --url http://tpu-host:8000   # + server

Checks: package imports/versions, accelerator backend + device list, XLA
persistent compilation cache writability, native C++ TIFF decoder
availability (falls back to the threaded Python decoder with a warning),
TIFF write/read round-trip, a jitted forward smoke test (compile + cached
re-dispatch timings), torch interop availability, and optionally a
checkpoint load (structure-derived size detection) and a serving-endpoint
health probe. Exit code 0 = deployable; 1 = at least one FAIL.
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Check this machine's crosstalk_tpu deployment health."
    )
    parser.add_argument("-p", "--model_path", type=str, default=None,
                        help="Optionally verify a .pth checkpoint loads")
    parser.add_argument("--url", type=str, default=None,
                        help="Optionally probe a running serving endpoint")
    parser.add_argument("--image_size", type=int, default=64,
                        help="Tile size for the forward smoke test "
                             "(small by default so the check is quick)")
    parser.add_argument("--timeout", type=float, default=10.0,
                        help="Server-probe timeout, seconds")
    return parser


class _Report:
    def __init__(self):
        self.failures = 0

    def ok(self, name: str, detail: str = "") -> None:
        print(f"  ok    {name}" + (f" — {detail}" if detail else ""))

    def warn(self, name: str, detail: str) -> None:
        print(f"  warn  {name} — {detail}")

    def fail(self, name: str, detail: str) -> None:
        self.failures += 1
        print(f"  FAIL  {name} — {detail}")


def _check_imports(rep: _Report) -> bool:
    try:
        import flax
        import jax
        import numpy
        import optax

        rep.ok("imports", f"jax {jax.__version__}, flax {flax.__version__}, "
                          f"optax {optax.__version__}, numpy {numpy.__version__}")
        return True
    except Exception as e:
        rep.fail("imports", f"{type(e).__name__}: {e}")
        return False


def _check_devices(rep: _Report):
    import jax

    try:
        devices = jax.devices()
    except Exception as e:
        rep.fail("accelerator backend", f"{type(e).__name__}: {e}")
        return None
    kinds = {d.device_kind for d in devices}
    rep.ok("devices", f"{len(devices)}x {'/'.join(sorted(kinds))} "
                      f"({devices[0].platform} backend)")
    if devices[0].platform == "cpu":
        rep.warn("devices", "CPU backend — fine for tests; production "
                            "serving/training expects a TPU")
    return devices


def _check_compile_cache(rep: _Report) -> None:
    import jax

    from crosstalk_tpu.utils.cache import enable_compilation_cache

    try:
        enable_compilation_cache()
        cache_dir = jax.config.jax_compilation_cache_dir
        rep.ok("compilation cache", cache_dir)
    except Exception as e:
        rep.warn("compilation cache", f"not usable ({type(e).__name__}: {e}); "
                 "first compiles will not persist across processes")


def _check_decoder(rep: _Report) -> None:
    from crosstalk_tpu.data.native_loader import native_available

    if native_available():
        rep.ok("native TIFF decoder", "C++ thread-pool decoder built")
    else:
        rep.warn("native TIFF decoder", "unavailable (no C++ toolchain or "
                 "build failed); the threaded Python decoder handles IO at "
                 "~1/48th the rate — fine for small datasets")


def _check_tiff_roundtrip(rep: _Report) -> None:
    import os
    import tempfile

    import numpy as np

    from crosstalk_tpu.data.tiff import read_tile, write_tile

    try:
        with tempfile.TemporaryDirectory() as tmp:
            path = os.path.join(tmp, "probe.tif")
            tile = np.random.default_rng(0).random((16, 16)).astype(np.float32)
            write_tile(path, tile)
            back = read_tile(path)
        if np.array_equal(np.asarray(back, np.float32), tile):
            rep.ok("TIFF round-trip", "write_tile/read_tile bit-exact")
        else:
            rep.fail("TIFF round-trip", "values changed across write/read")
    except Exception as e:
        rep.fail("TIFF round-trip", f"{type(e).__name__}: {e}")


def _check_forward(rep: _Report, image_size: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crosstalk_tpu.config import ModelConfig
    from crosstalk_tpu.models import build_model, init_model

    try:
        cfg = ModelConfig(variant="single", initial_filters=8,
                          num_conv_blocks=3)
        model = build_model(cfg)
        variables = init_model(model, jax.random.PRNGKey(0),
                               image_size=image_size)
        apply = jax.jit(lambda v, a: model.apply(v, a, train=False))
        x = jnp.zeros((2, image_size, image_size, 2), jnp.float32)
        t0 = time.perf_counter()
        np.asarray(apply(variables, x))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(apply(variables, x))
        cached_s = time.perf_counter() - t0
        rep.ok("jitted forward", f"{image_size}px compile {compile_s:.2f}s, "
                                 f"cached dispatch {cached_s * 1e3:.1f}ms")
    except Exception as e:
        rep.fail("jitted forward", f"{type(e).__name__}: {e}")


def _check_torch(rep: _Report) -> None:
    try:
        import torch

        rep.ok("torch interop", f"torch {torch.__version__} (.pth converter "
                                "available both directions)")
    except ImportError:
        rep.warn("torch interop", "torch not importable — .pth checkpoint "
                 "load/save (reference interop) unavailable on this machine")


def _check_checkpoint(rep: _Report, path: str) -> None:
    from crosstalk_tpu.io.torch_convert import (
        infer_image_size,
        infer_model_size,
        load_pth,
    )

    for variant in ("single", "double"):
        try:
            variables = load_pth(path, variant)
        except (FileNotFoundError, ValueError) as e:
            rep.fail("checkpoint", f"{type(e).__name__}: {e}")
            return
        except KeyError:
            continue  # try the other variant
        size = infer_model_size(variables, variant)
        px = infer_image_size(variables, variant)
        detail = ", ".join(f"{k}={v}" for k, v in size.items())
        rep.ok("checkpoint", f"{path}: {variant}, {detail}, native {px}px")
        return
    rep.fail("checkpoint", f"{path} matches neither model family's schema")


def _check_server(rep: _Report, url: str, timeout: float) -> None:
    from crosstalk_tpu.serve.client import CrosstalkClient

    try:
        client = CrosstalkClient(url, timeout=timeout)
        health = client.health()
        stats = client.stats()
        rep.ok("serving endpoint",
               f"{url}: {health.get('model', '?')} model, "
               f"batch {stats.get('batch_size', '?')}, "
               f"{stats.get('requests', 0)} requests served")
    except Exception as e:
        rep.fail("serving endpoint", f"{url} not healthy "
                                     f"({type(e).__name__}: {e})")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.image_size < 8:
        print(f"Error: --image_size must be >= 8, got {args.image_size}")
        return 1

    print("crosstalk_tpu doctor")
    rep = _Report()
    if not _check_imports(rep):
        print("\n1 check failed — environment is not usable.")
        return 1
    devices = _check_devices(rep)
    _check_compile_cache(rep)
    _check_decoder(rep)
    _check_tiff_roundtrip(rep)
    if devices is not None:
        _check_forward(rep, args.image_size)
    _check_torch(rep)
    if args.model_path is not None:
        _check_checkpoint(rep, args.model_path)
    if args.url is not None:
        _check_server(rep, args.url, args.timeout)

    if rep.failures:
        print(f"\n{rep.failures} check(s) FAILED — see above.")
        return 1
    print("\nAll checks passed — this machine can run crosstalk_tpu.")
    return 0


if __name__ == "__main__":
    sys.exit(main())

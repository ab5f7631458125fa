"""AOT StableHLO export (io/export.py + tools/export_model.py).

Round-trip contract: export -> serialize -> file -> load -> call must
reproduce the live model's predictions, with no model code at load time.
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from crosstalk_tpu.config import ModelConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_model():
    from crosstalk_tpu.models import build_model, init_model

    cfg = ModelConfig(variant="single", initial_filters=8, num_conv_blocks=3,
                      compute_dtype="f32")
    model = build_model(cfg)
    variables = init_model(model, jax.random.key(2), image_size=32, batch=2)
    return cfg, model, variables


def test_export_roundtrip_matches_live_model(tmp_path, tiny_model):
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.io.export import (
        export_serving_model,
        load_exported,
        save_exported,
    )

    cfg, model, variables = tiny_model
    blob, weights = export_serving_model(variables, cfg, batch_size=4,
                                         image_size=32, fast=False,
                                         platforms=["cpu"])
    path = str(tmp_path / "m.ctkx")
    save_exported(path, blob, weights, {"model": "single", "batch_size": 4})

    fn, meta = load_exported(path)
    assert meta["batch_size"] == 4
    raw = np.random.default_rng(1).random((4, 32, 32, 2), np.float32) * 3.0
    golden = np.asarray(
        model.apply(variables, normalize_batch_nhwc(raw), train=False)
    )[:, 0]
    np.testing.assert_allclose(fn(raw), golden, rtol=1e-6, atol=1e-6)


def test_export_bad_file_rejected(tmp_path):
    from crosstalk_tpu.io.export import _MAGIC, read_exported

    bad = tmp_path / "bad.ctkx"
    bad.write_bytes(b"not an export at all")
    with pytest.raises(ValueError, match="not a crosstalk export"):
        read_exported(str(bad))

    # every truncation/corruption point raises ValueError, never struct/json
    # errors (the serve CLI catches ValueError for its clean error message)
    cases = [
        (_MAGIC, "truncated export header"),                  # magic only
        (_MAGIC + b"\x02", "truncated export header"),        # partial length
        (_MAGIC + bytes(4), "corrupt export metadata"),       # empty meta
        (_MAGIC + b"\x10\x00\x00\x00" + b"{}", "truncated export metadata"),
        (_MAGIC + b"\x02\x00\x00\x00" + b"xx" + bytes(8), "corrupt export metadata"),
        (_MAGIC + b"\x02\x00\x00\x00" + b"{}", "truncated weights header"),
        (_MAGIC + b"\x02\x00\x00\x00" + b"{}" + b"\x10" + bytes(7), "truncated weights section"),
        (_MAGIC + b"\x02\x00\x00\x00" + b"{}" + bytes(8), "no StableHLO module"),
    ]
    for i, (content, match) in enumerate(cases):
        p = tmp_path / f"bad{i}.ctkx"
        p.write_bytes(content)
        with pytest.raises(ValueError, match=match):
            read_exported(str(p))


def test_export_corrupt_weights_zip_rejected(tmp_path, tiny_model):
    """A weights section that passes the length checks but is corrupt zip
    bytes must raise ValueError from load_exported (the serve CLI's catch),
    not zipfile.BadZipFile."""
    from crosstalk_tpu.io.export import (
        export_serving_model,
        load_exported,
        save_exported,
    )

    cfg, model, variables = tiny_model
    blob, weights = export_serving_model(variables, cfg, batch_size=2,
                                         image_size=32, fast=False,
                                         platforms=["cpu"])
    corrupt = weights[:10] + bytes(len(weights) - 10)  # keep PK magic
    path = str(tmp_path / "cw.ctkx")
    save_exported(path, blob, corrupt, {"model": "single"})
    with pytest.raises(ValueError, match="corrupt weights section"):
        load_exported(path)


def test_export_dynamic_batch(tmp_path, tiny_model):
    """batch_size=None (the default) exports a symbolic batch dimension:
    one artifact serves any batch size, on both the flax and the fast
    folded-BN serving paths."""
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.io.export import (
        export_serving_model,
        load_exported,
        save_exported,
    )

    cfg, model, variables = tiny_model
    for fast in (False, True):
        blob, weights = export_serving_model(variables, cfg, image_size=32,
                                             fast=fast, platforms=["cpu"])
        path = str(tmp_path / f"dyn{int(fast)}.ctkx")
        save_exported(path, blob, weights,
                      {"model": "single", "batch_size": "dynamic"})
        fn, meta = load_exported(path)
        assert meta["batch_size"] == "dynamic"
        for n in (1, 3, 8):
            raw = np.random.default_rng(n).random((n, 32, 32, 2), np.float32)
            golden = np.asarray(
                model.apply(variables, normalize_batch_nhwc(raw), train=False)
            )[:, 0]
            tol = 2e-2 if fast else 1e-6  # bf16 vs f32 path
            np.testing.assert_allclose(fn(raw), golden, rtol=tol, atol=tol)


def test_export_multiplatform_lowering(tiny_model):
    """tpu+cpu dual lowering works WITHOUT a TPU attached (cross-platform
    export is lowering-only), and the cpu lowering stays callable."""
    from jax import export as jexport

    from crosstalk_tpu.io.export import export_serving_model

    cfg, model, variables = tiny_model
    blob, weights = export_serving_model(variables, cfg, batch_size=2,
                                         image_size=32, fast=False,
                                         platforms=["tpu", "cpu"])
    exported = jexport.deserialize(blob)
    assert set(exported.platforms) == {"tpu", "cpu"}
    import io

    with np.load(io.BytesIO(weights)) as npz:
        leaves = tuple(npz[f"w{i}"] for i in range(len(npz.files)))
    out = exported.call(leaves, np.zeros((2, 32, 32, 2), np.float32))
    assert np.asarray(out).shape == (2,)


def test_export_double_model_roundtrip(tmp_path):
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.io.export import (
        export_serving_model,
        load_exported,
        save_exported,
    )
    from crosstalk_tpu.models import build_model, init_model

    cfg = ModelConfig(variant="double", initial_filters_per_branch=4,
                      compute_dtype="f32")
    model = build_model(cfg)
    variables = init_model(model, jax.random.key(5), image_size=32, batch=2)
    blob, weights = export_serving_model(variables, cfg, batch_size=2,
                                         image_size=32, fast=False,
                                         platforms=["cpu"])
    path = str(tmp_path / "d.ctkx")
    save_exported(path, blob, weights, {"model": "double", "batch_size": 2})
    fn, _ = load_exported(path)
    raw = np.random.default_rng(6).random((2, 32, 32, 2), np.float32)
    golden = np.asarray(
        model.apply(variables, normalize_batch_nhwc(raw), train=False)
    )[:, 0]
    np.testing.assert_allclose(fn(raw), golden, rtol=1e-6, atol=1e-6)
    assert np.all(fn(raw) >= 0) and np.all(fn(raw) <= 0.5)  # sigmoid*0.5 head


def test_artifact_backed_http_server(tmp_path, tiny_model):
    """The serve stack runs an AOT artifact as its predictor: the complete
    deployment loop (export -> file -> server -> HTTP) with no model code."""
    import io
    import json
    import urllib.request

    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.io.export import (
        export_serving_model,
        load_exported,
        save_exported,
    )
    from crosstalk_tpu.serve.server import CrosstalkServer

    cfg, model, variables = tiny_model
    blob, weights = export_serving_model(variables, cfg, batch_size=4,
                                         image_size=32, fast=False,
                                         platforms=["cpu"])
    path = str(tmp_path / "m.ctkx")
    save_exported(path, blob, weights, {"model": "single", "batch_size": 4})
    fn, meta = load_exported(path)

    server = CrosstalkServer(fn, batch_size=4, image_size=32, port=0,
                             max_delay_ms=2.0, model_info=meta)
    server.start_background()
    try:
        host, port = server.address
        raw = np.random.default_rng(7).random((3, 32, 32, 2), np.float32)
        buf = io.BytesIO()
        np.savez(buf, tiles=raw)
        req = urllib.request.Request(
            f"http://{host}:{port}/predict", data=buf.getvalue()
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = json.load(resp)
        golden = np.asarray(
            model.apply(variables, normalize_batch_nhwc(raw), train=False)
        )[:, 0]
        np.testing.assert_allclose(out["alpha"], golden, rtol=1e-5, atol=1e-5)
    finally:
        server.shutdown()


def test_export_cli_roundtrip(tmp_path):
    """tools/export_model.py on a real torch .pth; load with the library."""
    torch = pytest.importorskip("torch")
    from tests.torch_ref import TorchSingle, burn_in_batch_stats

    torch.manual_seed(4)
    # custom size: also covers the tool's --initial_filters/--num_conv_blocks
    tmodel = TorchSingle(initial_filters=16, num_blocks=4, image_size=64)
    burn_in_batch_stats(tmodel, 64, steps=2)
    ckpt = str(tmp_path / "model.pth")
    torch.save(tmodel.state_dict(), ckpt)

    out = str(tmp_path / "model.ctkx")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_model.py"),
         "-p", ckpt, "-o", "single", "--out", out,
         "--initial_filters", "16", "--num_conv_blocks", "4",
         "--batch_size", "4", "--image_size", "64",
         "--platforms", "cpu", "--parity"],
        capture_output=True, text=True, cwd=REPO, timeout=420,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert os.path.exists(out)

    from crosstalk_tpu.io.export import load_exported

    fn, meta = load_exported(out)
    assert meta["model"] == "single" and meta["image_size"] == 64

    rng = np.random.default_rng(3)
    raw = rng.random((4, 64, 64, 2), np.float32)
    lo = raw.min(axis=(1, 2), keepdims=True)
    hi = raw.max(axis=(1, 2), keepdims=True)
    with torch.no_grad():
        golden = tmodel(
            torch.from_numpy(((raw - lo) / (hi - lo)).transpose(0, 3, 1, 2))
        ).numpy().ravel()
    np.testing.assert_allclose(fn(raw), golden, rtol=1e-4, atol=1e-4)


def test_infer_image_size_both_variants():
    """Tile size recovered from the parameter tree (the head dims bake it
    in — reference regression_model.py:52-56, two_branch_regression.py:68-80)."""
    from crosstalk_tpu.io.torch_convert import infer_image_size
    from crosstalk_tpu.models import build_model, init_model

    for variant, kw, sizes in (
        ("single", dict(initial_filters=8, num_conv_blocks=3), (32, 64)),
        ("double", dict(initial_filters=8), (32, 64)),
    ):
        for size in sizes:
            cfg = ModelConfig(variant=variant, compute_dtype="f32", **kw)
            v = init_model(build_model(cfg), jax.random.key(0),
                           image_size=size, batch=2)
            assert infer_image_size(v, variant) == size, (variant, size)


def test_export_cli_autodetects_image_size(tmp_path, capsys):
    """A 64px checkpoint exports correctly with NO --image_size flag
    (round-3 bug: the tool assumed 256px and the lowering crashed with a
    dot_general shape error); an explicit wrong flag is a clear error."""
    torch = pytest.importorskip("torch")
    from tests.torch_ref import TorchSingle, burn_in_batch_stats
    from tools.export_model import main as export_main

    torch.manual_seed(9)
    tmodel = TorchSingle(initial_filters=8, num_blocks=3, image_size=64)
    burn_in_batch_stats(tmodel, 64, steps=2)
    ckpt = str(tmp_path / "model.pth")
    torch.save(tmodel.state_dict(), ckpt)

    out = str(tmp_path / "model.ctkx")
    rc = export_main(["-p", ckpt, "--out", out, "--batch_size", "2",
                      "--platforms", "cpu", "--parity"])
    assert rc == 0
    assert "Detected tile size from the checkpoint: 64px" in \
        capsys.readouterr().out

    from crosstalk_tpu.io.export import load_exported

    fn, meta = load_exported(out)
    assert meta["image_size"] == 64
    raw = np.random.default_rng(0).random((2, 64, 64, 2), np.float32)
    assert np.asarray(fn(raw)).shape == (2,)

    rc = export_main(["-p", ckpt, "--out", out, "--batch_size", "2",
                      "--image_size", "256", "--platforms", "cpu"])
    assert rc == 1
    assert "compatible tile sizes: 64-71px" in capsys.readouterr().out

    # pooling floors odd dims: 70px shares the 64px head shape, so an
    # explicit --image_size 70 must be accepted (it is not auto-detectable)
    out70 = str(tmp_path / "model70.ctkx")
    rc = export_main(["-p", ckpt, "--out", out70, "--batch_size", "2",
                      "--image_size", "70", "--platforms", "cpu",
                      "--parity"])
    assert rc == 0
    fn70, meta70 = load_exported(out70)
    assert meta70["image_size"] == 70
    raw = np.random.default_rng(1).random((2, 70, 70, 2), np.float32)
    assert np.isfinite(np.asarray(fn70(raw))).all()


def test_export_cli_rejects_nonpositive_batch(tmp_path, capsys):
    from tools.export_model import main as export_main

    rc = export_main(["-p", str(tmp_path / "m.pth"), "--batch_size", "0"])
    assert rc == 1
    assert "must be positive" in capsys.readouterr().out


def test_serve_cli_artifact_subprocess(tmp_path, tiny_model):
    """serve CLI end-to-end on a dynamic-batch artifact: export -> file ->
    `crosstalk_tpu.cli.serve --artifact` subprocess -> HTTP -> SIGTERM."""
    import io
    import json
    import time
    import urllib.request

    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.io.export import export_serving_model, save_exported

    cfg, model, variables = tiny_model
    blob, weights = export_serving_model(variables, cfg, image_size=32,
                                         fast=False, platforms=["cpu"])
    path = str(tmp_path / "m.ctkx")
    save_exported(path, blob, weights, {
        "model": "single", "batch_size": "dynamic", "image_size": 32,
        "path": "f32-parity",
    })

    proc = subprocess.Popen(
        [sys.executable, "-m", "crosstalk_tpu.cli.serve",
         "--artifact", path, "--port", "0", "--batch_size", "4"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env={**os.environ, "PYTHONPATH": REPO},
    )
    try:
        url = None
        deadline = time.monotonic() + 180
        while time.monotonic() < deadline:
            line = proc.stdout.readline()
            if not line and proc.poll() is not None:
                raise AssertionError("serve CLI exited before listening")
            if line.startswith("Serving on "):
                url = line.split()[2]
                break
        assert url, "never saw the 'Serving on' line"

        raw = np.random.default_rng(9).random((3, 32, 32, 2), np.float32)
        buf = io.BytesIO()
        np.savez(buf, tiles=raw)
        req = urllib.request.Request(url + "/predict", data=buf.getvalue())
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = json.load(resp)
        golden = np.asarray(
            model.apply(variables, normalize_batch_nhwc(raw), train=False)
        )[:, 0]
        np.testing.assert_allclose(out["alpha"], golden, rtol=1e-5, atol=1e-5)

        with urllib.request.urlopen(url + "/healthz", timeout=30) as resp:
            health = json.load(resp)
        assert health["batch_size"] == "dynamic"

        proc.terminate()  # SIGTERM drains gracefully
        rest = proc.communicate(timeout=60)[0]
        assert proc.returncode == 0, rest
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)


def test_export_int8_roundtrip(tmp_path, tiny_model):
    """An int8-lowered artifact reproduces the live int8 forward and tracks
    the f32 model within the tier's envelope — the calibrated activation
    scales bake into the program (no calibration data at the load site)."""
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.eval.int8_forward import (
        calibrate_int8,
        make_int8_forward,
    )
    from crosstalk_tpu.io.export import (
        export_serving_model,
        load_exported,
        save_exported,
    )

    cfg, model, variables = tiny_model
    rng = np.random.default_rng(7)
    raw = rng.random((4, 32, 32, 2), np.float32) * 3.0
    calib = np.asarray(normalize_batch_nhwc(raw))
    scales = calibrate_int8(cfg, variables, calib, use_pallas=False)

    blob, weights = export_serving_model(
        variables, cfg, batch_size=4, image_size=32, platforms=["cpu"],
        int8_scales=scales)
    path = str(tmp_path / "m8.ctkx")
    save_exported(path, blob, weights, {"path": "int8-serving"})
    fn, meta = load_exported(path)
    assert meta["path"] == "int8-serving"

    live = jax.jit(make_int8_forward(cfg, scales, use_pallas=False))
    golden_live = np.asarray(live(variables, normalize_batch_nhwc(raw)))[:, 0]
    np.testing.assert_allclose(fn(raw), golden_live, rtol=1e-5, atol=1e-5)

    f32 = np.asarray(
        model.apply(variables, normalize_batch_nhwc(raw), train=False))[:, 0]
    spread = max(float(np.ptp(f32)), 1e-3)
    assert float(np.abs(fn(raw) - f32).mean()) < 0.15 * spread


def test_export_cli_int8(tmp_path, capsys):
    """tools/export_model.py --quantize int8 calibrates on tile dirs, bakes
    the tier into the artifact, and the loaded artifact tracks the torch
    golden within the int8 envelope."""
    torch = pytest.importorskip("torch")
    from crosstalk_tpu.data.tiff import write_tile
    from tests.torch_ref import TorchSingle, burn_in_batch_stats
    from tools.export_model import main as export_main

    size = 64
    torch.manual_seed(11)
    tmodel = burn_in_batch_stats(
        TorchSingle(initial_filters=8, num_blocks=3, image_size=size),
        size, steps=2)
    ckpt = str(tmp_path / "model.pth")
    torch.save(tmodel.state_dict(), ckpt)

    calib_m = tmp_path / "calib_mixed"
    calib_s = tmp_path / "calib_source"
    calib_m.mkdir()
    calib_s.mkdir()
    rng = np.random.default_rng(17)
    for i in range(6):
        write_tile(str(calib_m / f"c{i}_mixed.tif"), rng.random((size, size)))
        write_tile(str(calib_s / f"c{i}_source.tif"),
                   rng.random((size, size)))

    out = str(tmp_path / "model_int8.ctkx")
    rc = export_main(["-p", ckpt, "--out", out, "--batch_size", "4",
                      "--platforms", "cpu", "--quantize", "int8",
                      "--calibration_mixed_dir", str(calib_m),
                      "--calibration_source_dir", str(calib_s)])
    assert rc == 0
    assert "Calibrating int8" in capsys.readouterr().out

    from crosstalk_tpu.io.export import load_exported

    fn, meta = load_exported(out)
    assert meta["path"] == "int8-serving"
    assert meta["calibration_tiles"] == 6

    raw = rng.random((4, size, size, 2)).astype(np.float32)
    lo = raw.min(axis=(1, 2), keepdims=True)
    hi = raw.max(axis=(1, 2), keepdims=True)
    with torch.no_grad():
        golden = tmodel(
            torch.from_numpy(((raw - lo) / (hi - lo)).transpose(0, 3, 1, 2))
        ).numpy().ravel()
    spread = max(float(np.ptp(golden)), 1e-3)
    assert float(np.abs(np.asarray(fn(raw)) - golden).mean()) < 0.15 * spread


def test_export_cli_int8_flag_validation(capsys):
    from tools.export_model import main as export_main

    rc = export_main(["-p", "m.pth", "--quantize", "int8", "--parity"])
    assert rc == 1
    assert "mutually exclusive" in capsys.readouterr().out
    rc = export_main(["-p", "m.pth", "--quantize", "int8"])
    assert rc == 1
    assert "requires --calibration_mixed_dir" in capsys.readouterr().out
    rc = export_main(["-p", "m.pth", "--quantize", "int8",
                      "--calibration_mixed_dir", "m",
                      "--calibration_source_dir", "s",
                      "--calibration_tiles", "0"])
    assert rc == 1
    assert "--calibration_tiles must be positive" in capsys.readouterr().out
    rc = export_main(["-p", "m.pth", "--calibration_mixed_dir", "m"])
    assert rc == 1
    assert "only apply with --quantize" in capsys.readouterr().out
    # two-branch int8 is gated: measured wash (PERF_NOTES "int8 serving")
    rc = export_main(["-p", "m.pth", "-o", "double", "--quantize", "int8"])
    assert rc == 1
    assert "gated to the single-branch family" in capsys.readouterr().out

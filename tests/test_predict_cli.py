"""Unlabeled pairing + predict-CLI tests.

The predict CLI (cli/predict.py) is a deployment extension with no
reference counterpart: the reference's data paths all require the
ground-truth alpha in the filename (reference train_model.py:105), so it
cannot score new, unlabeled acquisitions. These tests cover the stem-based
pairing rules and the end-to-end CLI contract (predict_run_* layout, CSV
schema, parity with the torch twin model).
"""

import csv
import glob
import math
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from crosstalk_tpu.data.index import pair_unlabeled
from crosstalk_tpu.data.tiff import write_tile
from tests.torch_ref import TorchSingle, burn_in_batch_stats


def _write_pair(mixed_dir, source_dir, mixed_name, source_name, size=16, seed=0):
    rng = np.random.default_rng(seed)
    write_tile(os.path.join(mixed_dir, mixed_name), rng.random((size, size)))
    write_tile(os.path.join(source_dir, source_name), rng.random((size, size)))


def _dirs(tmp_path):
    mixed = tmp_path / "Mixed"
    source = tmp_path / "Source"
    mixed.mkdir(parents=True)
    source.mkdir(parents=True)
    return str(mixed), str(source)


def test_pair_unlabeled_suffix_conventions(tmp_path):
    mixed, source = _dirs(tmp_path)
    _write_pair(mixed, source, "foo_mixed.tif", "foo_source.tif", seed=1)
    _write_pair(mixed, source, "scan3-bleed.tiff", "scan3-source.tiff", seed=2)
    _write_pair(mixed, source, "cell7.tif", "cell7.tif", seed=3)
    # unpaired + ignorable files
    write_tile(os.path.join(mixed, "lonely_mixed.tif"),
               np.zeros((16, 16)) + 0.5)
    write_tile(os.path.join(source, "orphan_source.tif"),
               np.zeros((16, 16)) + 0.5)
    with open(os.path.join(mixed, "notes.txt"), "w") as f:
        f.write("not a tif")

    index = pair_unlabeled(mixed, source)
    assert [s.image_id for s in index.samples] == ["cell7", "foo", "scan3"]
    assert all(math.isnan(s.scalar_label) for s in index.samples)
    assert index.unpaired_mixed == ["lonely_mixed.tif"]
    assert index.unpaired_source == ["orphan_source.tif"]
    by_key = {s.image_id: s for s in index.samples}
    assert by_key["scan3"].mixed_path.endswith("scan3-bleed.tiff")
    assert by_key["scan3"].source_path.endswith("scan3-source.tiff")
    assert by_key["cell7"].mixed_path != by_key["cell7"].source_path


def test_pair_unlabeled_accepts_reference_schema(tmp_path):
    mixed, source = _dirs(tmp_path)
    _write_pair(mixed, source,
                "image_42_alpha_0.25_mixed.tif",
                "image_42_alpha_0.25_source.tif")
    index = pair_unlabeled(mixed, source)
    assert [s.image_id for s in index.samples] == ["image_42_alpha_0.25"]


def test_pair_unlabeled_case_insensitive(tmp_path):
    """Pairing keys are case-insensitive: 'Foo_Mixed.tif' pairs with
    'foo_source.tif' (image_id is the lowercased key), and two files
    differing only in case collide loudly (round-3 advice)."""
    mixed, source = _dirs(tmp_path)
    _write_pair(mixed, source, "Foo_Mixed.tif", "foo_source.tif", seed=1)
    index = pair_unlabeled(mixed, source)
    assert [s.image_id for s in index.samples] == ["foo"]
    assert index.samples[0].mixed_path.endswith("Foo_Mixed.tif")
    assert not index.unpaired_mixed and not index.unpaired_source

    write_tile(os.path.join(mixed, "FOO_mixed.tif"), np.zeros((16, 16)) + 0.1)
    with pytest.raises(ValueError, match="Ambiguous mixed"):
        pair_unlabeled(mixed, source)


def test_pair_unlabeled_ambiguous_key_raises(tmp_path):
    mixed, source = _dirs(tmp_path)
    _write_pair(mixed, source, "foo_mixed.tif", "foo_source.tif")
    write_tile(os.path.join(mixed, "foo_bleed.tif"), np.zeros((16, 16)) + 0.1)
    with pytest.raises(ValueError, match="Ambiguous mixed"):
        pair_unlabeled(mixed, source)


def test_pair_unlabeled_nothing_pairs_raises(tmp_path):
    mixed, source = _dirs(tmp_path)
    write_tile(os.path.join(mixed, "a_mixed.tif"), np.zeros((16, 16)) + 0.1)
    write_tile(os.path.join(source, "b_source.tif"), np.zeros((16, 16)) + 0.2)
    with pytest.raises(ValueError, match="No pairable tiles"):
        pair_unlabeled(mixed, source)


def test_predict_cli_end_to_end(tmp_path):
    from crosstalk_tpu.cli.predict import main as predict_main

    mixed, source = _dirs(tmp_path)
    n, size = 6, 32
    rng = np.random.default_rng(7)
    for i in range(n):
        write_tile(os.path.join(mixed, f"acq{i}_mixed.tif"),
                   rng.random((size, size)))
        write_tile(os.path.join(source, f"acq{i}_source.tif"),
                   rng.random((size, size)))

    torch.manual_seed(11)
    tmodel = TorchSingle(initial_filters=8, num_blocks=3, image_size=size)
    burn_in_batch_stats(tmodel, size, steps=2)
    ckpt = str(tmp_path / "model.pth")
    torch.save(tmodel.state_dict(), ckpt)

    out_base = str(tmp_path / "out")
    # batch 4 over 6 pairs exercises the padded final chunk; the non-default
    # model width exercises checkpoint size auto-detection on this path.
    rc = predict_main([
        "-m", mixed, "-s", source, "-p", ckpt, "-j", "2",
        "-b", "4", "--output_base", out_base,
    ])
    assert rc == 0

    run_dirs = glob.glob(os.path.join(out_base, "predict_run_*"))
    assert len(run_dirs) == 1
    assert os.path.exists(os.path.join(run_dirs[0], "params.txt"))
    csvs = glob.glob(os.path.join(run_dirs[0], "predictions_*.csv"))
    assert len(csvs) == 1
    with open(csvs[0]) as f:
        rows = list(csv.DictReader(f))
    assert list(rows[0].keys()) == [
        "Image_Key", "Mixed_File", "Source_File", "Predicted_Alpha",
        "Num_Tiles", "Alpha_Std"
    ]
    assert all(r["Num_Tiles"] == "1" and float(r["Alpha_Std"]) == 0.0
               for r in rows)
    assert [r["Image_Key"] for r in rows] == [f"acq{i}" for i in range(n)]
    assert rows[0]["Mixed_File"] == "acq0_mixed.tif"
    assert rows[0]["Source_File"] == "acq0_source.tif"

    # parity vs the torch twin on the same normalized tiles
    tiles = np.empty((n, size, size, 2), dtype=np.float32)
    from crosstalk_tpu.data.tiff import read_tile

    for i in range(n):
        tiles[i, :, :, 0] = read_tile(os.path.join(mixed, f"acq{i}_mixed.tif"))
        tiles[i, :, :, 1] = read_tile(
            os.path.join(source, f"acq{i}_source.tif"))
    lo = tiles.min(axis=(1, 2), keepdims=True)
    hi = tiles.max(axis=(1, 2), keepdims=True)
    batch = (tiles - lo) / (hi - lo)
    with torch.no_grad():
        golden = tmodel(
            torch.from_numpy(batch.transpose(0, 3, 1, 2))
        ).numpy().ravel()
    got = np.array([float(r["Predicted_Alpha"]) for r in rows])
    np.testing.assert_allclose(got, golden, atol=1e-4)


def test_corrupt_checkpoint_clear_error_everywhere(tmp_path, capsys):
    """A file that is not a torch checkpoint maps to a clear CLI error in
    every consumer (load_pth wraps torch's pickle/zip internals in
    ValueError), never a raw traceback."""
    from crosstalk_tpu.cli.evaluate import main as eval_main
    from crosstalk_tpu.cli.predict import main as predict_main
    from crosstalk_tpu.cli.serve import main as serve_main
    from tools.export_model import main as export_main

    mixed, source = _dirs(tmp_path)
    # labeled schema so the eval CLI's dataset scan succeeds too
    _write_pair(mixed, source,
                "image_1_alpha_0.2_mixed.tif", "image_1_alpha_0.2_source.tif")
    bad = str(tmp_path / "garbage.pth")
    with open(bad, "wb") as f:
        f.write(b"\x89not-a-checkpoint" * 64)
    out = str(tmp_path / "out")

    for main_fn, argv in (
        (predict_main, ["-m", mixed, "-s", source, "-p", bad,
                        "--output_base", out]),
        (eval_main, ["-m", mixed, "-s", source, "-p", bad,
                     "--output_base", out]),
        (serve_main, ["-p", bad]),
        (export_main, ["-p", bad]),
    ):
        assert main_fn(argv) == 1
        assert "Error loading model" in capsys.readouterr().out


def test_predict_cli_requires_exactly_one_inference_source(tmp_path):
    from crosstalk_tpu.cli.predict import main as predict_main

    mixed, source = _dirs(tmp_path)
    _write_pair(mixed, source, "a_mixed.tif", "a_source.tif")
    assert predict_main(["-m", mixed, "-s", source]) == 1
    assert predict_main(["-m", mixed, "-s", source,
                         "-p", "x.pth", "--url", "http://h:1"]) == 1


def test_predict_cli_remote_mode_against_running_server(tmp_path):
    import jax

    from crosstalk_tpu.cli.predict import main as predict_main
    from crosstalk_tpu.config import ModelConfig
    from crosstalk_tpu.models import build_model, init_model
    from crosstalk_tpu.serve.predictor import make_predictor
    from crosstalk_tpu.serve.server import CrosstalkServer

    mixed, source = _dirs(tmp_path)
    n, size = 5, 32
    rng = np.random.default_rng(9)
    tiles = rng.random((n, size, size, 2)).astype(np.float32)
    for i in range(n):
        write_tile(os.path.join(mixed, f"r{i}_mixed.tif"), tiles[i, :, :, 0])
        write_tile(os.path.join(source, f"r{i}_source.tif"), tiles[i, :, :, 1])

    cfg = ModelConfig(variant="single", initial_filters=8, num_conv_blocks=3,
                      compute_dtype="f32")
    model = build_model(cfg)
    variables = init_model(model, jax.random.key(0), image_size=size, batch=2)
    predict = make_predictor(variables, cfg, batch_size=4, image_size=size,
                             fast=False)
    server = CrosstalkServer(predict, batch_size=4, image_size=size,
                             port=0, max_delay_ms=2.0,
                             model_info={"model": "single"})
    server.start_background()
    try:
        host, port = server.address
        out_base = str(tmp_path / "out")
        rc = predict_main([
            "-m", mixed, "-s", source, "--url", f"http://{host}:{port}",
            "--request_tiles", "2", "--dtype", "float32",
            "--output_base", out_base,
        ])
        assert rc == 0
        csv_path = glob.glob(
            os.path.join(out_base, "predict_run_*", "predictions_*.csv"))[0]
        with open(csv_path) as f:
            rows = list(csv.DictReader(f))
        assert [r["Image_Key"] for r in rows] == [f"r{i}" for i in range(n)]
        got = np.array([float(r["Predicted_Alpha"]) for r in rows])
        golden = np.concatenate([
            predict(tiles[:4]),
            predict(np.concatenate(
                [tiles[4:], np.zeros((3, size, size, 2), np.float32)]
            ))[:1],
        ])
        np.testing.assert_allclose(got, golden, atol=1e-4)
    finally:
        server.shutdown()


def test_predict_cli_unmix_recovers_clean_signal(tmp_path):
    """--unmix with the true alpha must recover the clean channel exactly:
    mixed = other + alpha*source  ->  mixed - alpha*source == other.
    Served by a constant-alpha predictor so the recovery is exact."""
    from crosstalk_tpu.cli.predict import main as predict_main
    from crosstalk_tpu.data.tiff import read_tile
    from crosstalk_tpu.serve.server import CrosstalkServer

    mixed, source = _dirs(tmp_path)
    n, size, alpha = 3, 16, 0.3
    rng = np.random.default_rng(21)
    others = rng.random((n, size, size))
    sources = rng.random((n, size, size))
    for i in range(n):
        write_tile(os.path.join(mixed, f"u{i}_mixed.tif"),
                   others[i] + alpha * sources[i])
        write_tile(os.path.join(source, f"u{i}_source.tif"), sources[i])

    def oracle(batch):
        return np.full((batch.shape[0],), alpha, np.float32)

    server = CrosstalkServer(oracle, batch_size=4, image_size=size,
                             port=0, max_delay_ms=2.0, model_info={})
    server.start_background()
    try:
        host, port = server.address
        out_base = str(tmp_path / "out")
        rc = predict_main([
            "-m", mixed, "-s", source, "--url", f"http://{host}:{port}",
            "--dtype", "float32", "--output_base", out_base, "--unmix",
        ])
        assert rc == 0
        unmix_dir = glob.glob(
            os.path.join(out_base, "predict_run_*", "unmixed"))[0]
        for i in range(n):
            corrected = read_tile(os.path.join(unmix_dir, f"u{i}_unmixed.tif"))
            np.testing.assert_allclose(
                corrected, others[i].astype(np.float32), atol=2e-6)
    finally:
        server.shutdown()


def test_predict_cli_unmix_matches_csv_alphas(tmp_path):
    """Local-checkpoint --unmix: each written tile is exactly
    clip(mixed - Predicted_Alpha*source, 0) for the CSV's alpha."""
    from crosstalk_tpu.cli.predict import main as predict_main
    from crosstalk_tpu.data.tiff import read_tile

    mixed, source = _dirs(tmp_path)
    n, size = 3, 32
    rng = np.random.default_rng(13)
    for i in range(n):
        write_tile(os.path.join(mixed, f"m{i}_mixed.tif"),
                   rng.random((size, size)))
        write_tile(os.path.join(source, f"m{i}_source.tif"),
                   rng.random((size, size)))
    torch.manual_seed(6)
    tmodel = TorchSingle(initial_filters=8, num_blocks=3, image_size=size)
    burn_in_batch_stats(tmodel, size, steps=2)
    ckpt = str(tmp_path / "model.pth")
    torch.save(tmodel.state_dict(), ckpt)

    out_base = str(tmp_path / "out")
    rc = predict_main(["-m", mixed, "-s", source, "-p", ckpt,
                       "--output_base", out_base, "--unmix"])
    assert rc == 0
    run_dir = glob.glob(os.path.join(out_base, "predict_run_*"))[0]
    with open(glob.glob(os.path.join(run_dir, "predictions_*.csv"))[0]) as f:
        rows = list(csv.DictReader(f))
    for r in rows:
        m = read_tile(os.path.join(mixed, r["Mixed_File"]))
        s = read_tile(os.path.join(source, r["Source_File"]))
        want = np.clip(m - float(r["Predicted_Alpha"]) * s, 0.0, None)
        got = read_tile(
            os.path.join(run_dir, "unmixed", f"{r['Image_Key']}_unmixed.tif"))
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_predict_cli_double_branch(tmp_path):
    """The two-branch model predicts through the same CLI (size and
    variant auto-detection included) and matches its torch twin."""
    from crosstalk_tpu.cli.predict import main as predict_main
    from crosstalk_tpu.data.tiff import read_tile
    from tests.torch_ref import TorchDouble

    mixed, source = _dirs(tmp_path)
    n, size = 3, 64
    rng = np.random.default_rng(41)
    for i in range(n):
        write_tile(os.path.join(mixed, f"w{i}_mixed.tif"),
                   rng.random((size, size)))
        write_tile(os.path.join(source, f"w{i}_source.tif"),
                   rng.random((size, size)))
    torch.manual_seed(15)
    tmodel = TorchDouble(filters_per_branch=4, image_size=size)
    burn_in_batch_stats(tmodel, size, steps=2)
    ckpt = str(tmp_path / "model.pth")
    torch.save(tmodel.state_dict(), ckpt)

    out_base = str(tmp_path / "out")
    rc = predict_main(["-m", mixed, "-s", source, "-p", ckpt, "-o", "double",
                       "--output_base", out_base])
    assert rc == 0
    csv_path = glob.glob(
        os.path.join(out_base, "predict_run_*", "predictions_*.csv"))[0]
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert [r["Num_Tiles"] for r in rows] == ["1"] * n

    tiles = np.empty((n, size, size, 2), dtype=np.float32)
    for i in range(n):
        tiles[i, :, :, 0] = read_tile(os.path.join(mixed, f"w{i}_mixed.tif"))
        tiles[i, :, :, 1] = read_tile(os.path.join(source, f"w{i}_source.tif"))
    lo = tiles.min(axis=(1, 2), keepdims=True)
    hi = tiles.max(axis=(1, 2), keepdims=True)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(
            ((tiles - lo) / (hi - lo)).transpose(0, 3, 1, 2)
        )).numpy().ravel()
    got = np.array([float(r["Predicted_Alpha"]) for r in rows])
    np.testing.assert_allclose(got, golden, atol=1e-4)


def test_predict_cli_whole_image_gridding(tmp_path):
    """Images larger than the model's native tile size are gridded into
    native-size crops and aggregated per image: a 64x96 image against a
    32px checkpoint scores as the median of its 6 quadrant predictions."""
    from crosstalk_tpu.cli.predict import main as predict_main

    mixed, source = _dirs(tmp_path)
    n, px = 2, 32
    H, W = 64, 96  # 2x3 grid of native tiles
    rng = np.random.default_rng(31)
    imgs = rng.random((n, H, W, 2)).astype(np.float32)
    for i in range(n):
        write_tile(os.path.join(mixed, f"big{i}_mixed.tif"), imgs[i, :, :, 0])
        write_tile(os.path.join(source, f"big{i}_source.tif"),
                   imgs[i, :, :, 1])

    torch.manual_seed(14)
    tmodel = TorchSingle(initial_filters=8, num_blocks=3, image_size=px)
    burn_in_batch_stats(tmodel, px, steps=2)
    ckpt = str(tmp_path / "model.pth")
    torch.save(tmodel.state_dict(), ckpt)

    out_base = str(tmp_path / "out")
    rc = predict_main(["-m", mixed, "-s", source, "-p", ckpt,
                       "--output_base", out_base])
    assert rc == 0
    csv_path = glob.glob(
        os.path.join(out_base, "predict_run_*", "predictions_*.csv"))[0]
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert [r["Num_Tiles"] for r in rows] == ["6", "6"]

    # golden: per-quadrant torch predictions, median per image
    for i, r in enumerate(rows):
        crops = []
        for gy in range(2):
            for gx in range(3):
                crops.append(imgs[i, gy * px:(gy + 1) * px,
                                  gx * px:(gx + 1) * px, :])
        crops = np.stack(crops)
        lo = crops.min(axis=(1, 2), keepdims=True)
        hi = crops.max(axis=(1, 2), keepdims=True)
        x = (crops - lo) / (hi - lo)
        with torch.no_grad():
            tile_alphas = tmodel(
                torch.from_numpy(x.transpose(0, 3, 1, 2))
            ).numpy().ravel()
        assert abs(float(r["Predicted_Alpha"])
                   - np.median(tile_alphas)) < 1e-4
        assert abs(float(r["Alpha_Std"]) - tile_alphas.std()) < 1e-3

    # too-small images are a clear error
    m2, s2 = _dirs(tmp_path / "small")
    _write_pair(m2, s2, "t_mixed.tif", "t_source.tif", size=16)
    assert predict_main(["-m", m2, "-s", s2, "-p", ckpt]) == 1


def test_predict_cli_artifact_mode(tmp_path):
    """--artifact scores tiles from an AOT .ctkx (no model code/torch on
    the inference path), padding the tail chunk of a pinned-batch artifact;
    an image-size mismatch is a clear error."""
    import jax

    from crosstalk_tpu.cli.predict import main as predict_main
    from crosstalk_tpu.config import ModelConfig
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.io.export import export_serving_model, save_exported
    from crosstalk_tpu.models import build_model, init_model

    mixed, source = _dirs(tmp_path)
    n, size = 6, 32
    rng = np.random.default_rng(23)
    tiles = rng.random((n, size, size, 2)).astype(np.float32)
    for i in range(n):
        write_tile(os.path.join(mixed, f"a{i}_mixed.tif"), tiles[i, :, :, 0])
        write_tile(os.path.join(source, f"a{i}_source.tif"), tiles[i, :, :, 1])

    cfg = ModelConfig(variant="single", initial_filters=8, num_conv_blocks=3,
                      compute_dtype="f32")
    model = build_model(cfg)
    variables = init_model(model, jax.random.key(4), image_size=size, batch=2)
    blob, weights = export_serving_model(variables, cfg, batch_size=4,
                                         image_size=size, fast=False,
                                         platforms=["cpu"])
    art = str(tmp_path / "m.ctkx")
    save_exported(art, blob, weights,
                  {"model": "single", "batch_size": 4, "image_size": size,
                   "path": "f32-parity"})

    out_base = str(tmp_path / "out")
    rc = predict_main(["-m", mixed, "-s", source, "--artifact", art,
                       "--output_base", out_base])
    assert rc == 0
    csv_path = glob.glob(
        os.path.join(out_base, "predict_run_*", "predictions_*.csv"))[0]
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    got = np.array([float(r["Predicted_Alpha"]) for r in rows])
    golden = np.asarray(
        model.apply(variables, normalize_batch_nhwc(tiles), train=False)
    )[:, 0]
    np.testing.assert_allclose(got, golden, atol=1e-4)

    # image-size mismatch -> clear error, not a shape traceback
    m2, s2 = _dirs(tmp_path / "small")
    _write_pair(m2, s2, "x_mixed.tif", "x_source.tif", size=16)
    assert predict_main(["-m", m2, "-s", s2, "--artifact", art]) == 1


def test_predict_cli_multi_device_matches_single(tmp_path):
    """--num_devices 2 (mesh-sharded batches) must reproduce the
    single-device predictions on the virtual CPU mesh."""
    from crosstalk_tpu.cli.predict import main as predict_main

    mixed, source = _dirs(tmp_path)
    n, size = 6, 32
    rng = np.random.default_rng(17)
    for i in range(n):
        write_tile(os.path.join(mixed, f"d{i}_mixed.tif"),
                   rng.random((size, size)))
        write_tile(os.path.join(source, f"d{i}_source.tif"),
                   rng.random((size, size)))
    torch.manual_seed(8)
    tmodel = TorchSingle(initial_filters=8, num_blocks=3, image_size=size)
    burn_in_batch_stats(tmodel, size, steps=2)
    ckpt = str(tmp_path / "model.pth")
    torch.save(tmodel.state_dict(), ckpt)

    preds = {}
    for label, extra in (("one", ["--num_devices", "1"]),
                         ("two", ["--num_devices", "2"])):
        out_base = str(tmp_path / f"out_{label}")
        rc = predict_main(["-m", mixed, "-s", source, "-p", ckpt,
                           "-b", "4", "--output_base", out_base] + extra)
        assert rc == 0
        csv_path = glob.glob(
            os.path.join(out_base, "predict_run_*", "predictions_*.csv"))[0]
        with open(csv_path) as f:
            preds[label] = np.array(
                [float(r["Predicted_Alpha"]) for r in csv.DictReader(f)])
    np.testing.assert_allclose(preds["two"], preds["one"], atol=1e-5)


def test_predict_cli_fast_path_matches_parity_path(tmp_path):
    from crosstalk_tpu.cli.predict import main as predict_main

    mixed, source = _dirs(tmp_path)
    size = 32
    rng = np.random.default_rng(5)
    for i in range(3):
        write_tile(os.path.join(mixed, f"t{i}_mixed.tif"),
                   rng.random((size, size)))
        write_tile(os.path.join(source, f"t{i}_source.tif"),
                   rng.random((size, size)))
    torch.manual_seed(2)
    tmodel = TorchSingle(initial_filters=8, num_blocks=3, image_size=size)
    burn_in_batch_stats(tmodel, size, steps=2)
    ckpt = str(tmp_path / "model.pth")
    torch.save(tmodel.state_dict(), ckpt)

    outs = {}
    for label, extra in (("f32", []), ("fast", ["--fast"])):
        out_base = str(tmp_path / f"out_{label}")
        rc = predict_main(["-m", mixed, "-s", source, "-p", ckpt,
                           "--output_base", out_base] + extra)
        assert rc == 0
        csv_path = glob.glob(
            os.path.join(out_base, "predict_run_*", "predictions_*.csv"))[0]
        with open(csv_path) as f:
            outs[label] = np.array(
                [float(r["Predicted_Alpha"]) for r in csv.DictReader(f)])
    np.testing.assert_allclose(outs["fast"], outs["f32"], atol=5e-3)


def test_predict_cli_int8_tier(tmp_path, capsys):
    """--int8 self-calibrates on the input tiles and tracks the f32 path
    within the int8 envelope (OUTSIDE the 1e-4 parity budget by design)."""
    from crosstalk_tpu.cli.predict import main as predict_main

    mixed, source = _dirs(tmp_path)
    size = 32
    rng = np.random.default_rng(6)
    for i in range(4):
        write_tile(os.path.join(mixed, f"t{i}_mixed.tif"),
                   rng.random((size, size)))
        write_tile(os.path.join(source, f"t{i}_source.tif"),
                   rng.random((size, size)))
    torch.manual_seed(3)
    tmodel = TorchSingle(initial_filters=8, num_blocks=3, image_size=size)
    burn_in_batch_stats(tmodel, size, steps=2)
    ckpt = str(tmp_path / "model.pth")
    torch.save(tmodel.state_dict(), ckpt)

    outs = {}
    for label, extra in (("f32", []), ("int8", ["--int8"])):
        out_base = str(tmp_path / f"out_{label}")
        rc = predict_main(["-m", mixed, "-s", source, "-p", ckpt,
                           "--output_base", out_base] + extra)
        assert rc == 0
        csv_path = glob.glob(
            os.path.join(out_base, "predict_run_*", "predictions_*.csv"))[0]
        with open(csv_path) as f:
            outs[label] = np.array(
                [float(r["Predicted_Alpha"]) for r in csv.DictReader(f)])
    assert "Calibrating int8" in capsys.readouterr().out
    spread = max(float(np.ptp(outs["f32"])), 1e-3)
    assert float(np.abs(outs["int8"] - outs["f32"]).mean()) < 0.15 * spread


def test_predict_cli_int8_flag_validation(tmp_path, capsys):
    from crosstalk_tpu.cli.predict import main as predict_main

    mixed, source = _dirs(tmp_path)
    _write_pair(mixed, source, "a_mixed.tif", "a_source.tif")
    # --int8 needs a local checkpoint, not a server or artifact
    rc = predict_main(["-m", mixed, "-s", source,
                       "--url", "http://127.0.0.1:9", "--int8"])
    assert rc == 1
    assert "--int8 requires a local checkpoint" in capsys.readouterr().out
    # --int8 and --fast are distinct tiers
    rc = predict_main(["-m", mixed, "-s", source, "-p", "model.pth",
                       "--int8", "--fast"])
    assert rc == 1
    assert "distinct serving tiers" in capsys.readouterr().out
    # two-branch int8 is gated: measured wash (PERF_NOTES "int8 serving")
    rc = predict_main(["-m", mixed, "-s", source, "-p", "model.pth",
                       "-o", "double", "--int8"])
    assert rc == 1
    assert "gated to the single-branch family" in capsys.readouterr().out

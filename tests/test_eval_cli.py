"""End-to-end eval-CLI test: runs the reference-compatible evaluation entry
point against a synthetic dataset + torch checkpoint and checks the full
artifact contract (eval_run_* layout, CSV schema, prediction parity).
"""

import csv
import glob
import os

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from crosstalk_tpu.cli.evaluate import main as eval_main
from crosstalk_tpu.io.artifacts import EVAL_FIELDNAMES
from tests.conftest import make_synthetic_dataset
from tests.torch_ref import TorchSingle, burn_in_batch_stats


@pytest.fixture(scope="module")
def cli_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    mixed_dir, source_dir = make_synthetic_dataset(str(root), n=10, size=64)
    torch.manual_seed(3)
    tmodel = TorchSingle(image_size=64)  # full instantiated width, 64px tiles
    burn_in_batch_stats(tmodel, 64, steps=2)
    ckpt = str(root / "model.pth")
    torch.save(tmodel.state_dict(), ckpt)
    return root, mixed_dir, source_dir, ckpt, tmodel


def test_eval_cli_end_to_end(cli_setup):
    root, mixed_dir, source_dir, ckpt, tmodel = cli_setup
    out_base = str(root / "out")
    rc = eval_main([
        "-m", mixed_dir, "-s", source_dir, "-p", ckpt, "-j", "2", "-o", "single",
        "--output_base", out_base, "--batch_size", "4",
    ])
    assert rc == 0

    run_dirs = glob.glob(os.path.join(out_base, "eval_run_*"))
    assert len(run_dirs) == 1
    run_dir = run_dirs[0]

    assert os.path.exists(os.path.join(run_dir, "params.txt"))
    assert os.path.exists(os.path.join(run_dir, "model_architecture.txt"))

    csvs = glob.glob(os.path.join(run_dir, "test_predictions_*.csv"))
    assert len(csvs) == 1
    with open(csvs[0]) as f:
        rows = list(csv.DictReader(f))
    assert list(rows[0].keys()) == EVAL_FIELDNAMES
    assert len(rows) == 10

    # one scatter PNG per metric column (test-cross-talk-model.py:103-121)
    pngs = glob.glob(os.path.join(run_dir, "test_*_plot_*.png"))
    assert len(pngs) == len(EVAL_FIELDNAMES) - 2

    # params.txt format: '{arg}: {value}' lines
    with open(os.path.join(run_dir, "params.txt")) as f:
        lines = f.read().splitlines()
    assert any(line.startswith("model_options: single") for line in lines)

    # prediction parity vs the torch model itself
    from tests.conftest import torch_golden_by_id

    by_id = torch_golden_by_id(tmodel, mixed_dir, source_dir)
    for row in rows:
        assert abs(float(row["Predicted_Label"]) - by_id[int(row["Image_ID"])]) < 1e-4
        for field in EVAL_FIELDNAMES[3:]:
            assert np.isfinite(float(row[field]))


def test_eval_cli_fast_path_on_cpu(cli_setup):
    """--fast must run on non-TPU backends (Pallas auto-gated off) and stay
    within the serving-accuracy budget of the f32 predictions."""
    root, mixed_dir, source_dir, ckpt, tmodel = cli_setup
    out_base = str(root / "out_fast")
    rc = eval_main([
        "-m", mixed_dir, "-s", source_dir, "-p", ckpt, "-j", "2", "-o", "single",
        "--output_base", out_base, "--batch_size", "4", "--fast",
    ])
    assert rc == 0
    (csv_path,) = glob.glob(os.path.join(out_base, "eval_run_*", "test_predictions_*.csv"))
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 10
    from tests.conftest import torch_golden_by_id

    by_id = torch_golden_by_id(tmodel, mixed_dir, source_dir)
    # bf16 serving path: looser budget than the f32 parity mode
    for row in rows:
        assert abs(float(row["Predicted_Label"]) - by_id[int(row["Image_ID"])]) < 2e-2


def test_eval_cli_fast_with_mesh(cli_setup):
    """--fast combined with --num_devices: the Pallas kernel is gated off
    under a sharded mesh and the GSPMD serving path must produce the same
    rows as single-device."""
    root, mixed_dir, source_dir, ckpt, tmodel = cli_setup
    out_base = str(root / "out_fast_mesh")
    rc = eval_main([
        "-m", mixed_dir, "-s", source_dir, "-p", ckpt, "-j", "2", "-o", "single",
        "--output_base", out_base, "--batch_size", "8", "--fast",
        "--num_devices", "8",
    ])
    assert rc == 0
    (csv_path,) = glob.glob(os.path.join(out_base, "eval_run_*",
                                         "test_predictions_*.csv"))
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 10
    from tests.conftest import torch_golden_by_id

    by_id = torch_golden_by_id(tmodel, mixed_dir, source_dir)
    for row in rows:  # bf16 serving budget, sharded == unsharded semantics
        assert abs(float(row["Predicted_Label"]) - by_id[int(row["Image_ID"])]) < 2e-2


def test_eval_cli_end_to_end_double(cli_setup):
    """BASELINE config #2 at CLI level: -o double runs the two-branch model
    through the full eval pipeline with prediction parity vs torch."""
    from tests.torch_ref import TorchDouble

    root, mixed_dir, source_dir, _, _ = cli_setup
    torch.manual_seed(4)
    tmodel = TorchDouble(image_size=64)  # full instantiated width, 64px tiles
    burn_in_batch_stats(tmodel, 64, steps=2)
    ckpt = str(root / "double.pth")
    torch.save(tmodel.state_dict(), ckpt)

    out_base = str(root / "out_double")
    rc = eval_main([
        "-m", mixed_dir, "-s", source_dir, "-p", ckpt, "-j", "2", "-o", "double",
        "--output_base", out_base, "--batch_size", "4",
    ])
    assert rc == 0

    (csv_path,) = glob.glob(
        os.path.join(out_base, "eval_run_*", "test_predictions_*.csv"))
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    assert list(rows[0].keys()) == EVAL_FIELDNAMES
    assert len(rows) == 10

    from tests.conftest import torch_golden_by_id

    by_id = torch_golden_by_id(tmodel, mixed_dir, source_dir)
    for row in rows:
        pred = float(row["Predicted_Label"])
        assert abs(pred - by_id[int(row["Image_ID"])]) < 1e-4
        assert 0.0 <= pred <= 0.5  # sigmoid*0.5 head range


def test_evaluate_data_parallel_matches_single_device(cli_setup):
    """evaluate(mesh=8-device) returns the same rows (order + values) as
    single-device evaluation — GSPMD shards the batch, replicates params."""
    from crosstalk_tpu.config import ModelConfig
    from crosstalk_tpu.data.index import PairIndex
    from crosstalk_tpu.data.pipeline import TileStore
    from crosstalk_tpu.eval.engine import evaluate
    from crosstalk_tpu.io.torch_convert import load_pth
    from crosstalk_tpu.models import build_model
    from crosstalk_tpu.parallel.mesh import data_mesh

    _, mixed_dir, source_dir, ckpt, _ = cli_setup
    model = build_model(ModelConfig(variant="single", compute_dtype="f32"))
    variables = load_pth(ckpt, "single")
    index = PairIndex(mixed_dir, source_dir)
    store = TileStore(index.samples, jobs=1)

    rows1, loss1 = evaluate(model, variables, store, batch_size=4)
    rows8, loss8 = evaluate(
        model, variables, store, batch_size=4, mesh=data_mesh(8)
    )
    assert len(rows1) == len(rows8) == 10
    np.testing.assert_allclose(loss1, loss8, rtol=1e-5)
    for r1, r8 in zip(rows1, rows8):
        assert r1["Image_ID"] == r8["Image_ID"]
        np.testing.assert_allclose(
            r1["Predicted_Label"], r8["Predicted_Label"], atol=1e-5
        )


def test_eval_cli_missing_checkpoint(cli_setup, capsys):
    root, mixed_dir, source_dir, _, _ = cli_setup
    rc = eval_main([
        "-m", mixed_dir, "-s", source_dir, "-p", "/nope/missing.pth",
        "-o", "single", "--output_base", str(root / "out2"),
    ])
    assert rc == 1
    assert "Error loading model" in capsys.readouterr().out


def test_eval_cli_empty_dataset(tmp_path, cli_setup, capsys):
    _, _, _, ckpt, _ = cli_setup
    (tmp_path / "Mixed").mkdir()
    (tmp_path / "Source").mkdir()
    rc = eval_main([
        "-m", str(tmp_path / "Mixed"), "-s", str(tmp_path / "Source"),
        "-p", ckpt, "-o", "single", "--output_base", str(tmp_path),
    ])
    assert rc == 1
    assert "Error initializing" in capsys.readouterr().out


def test_evaluate_with_debug_nans_and_padded_tail(cli_setup):
    """10 samples at batch_size=4 -> the last batch is padded with constant
    zero tiles. Their reference-semantics NaN correlation guards must be
    masked inside the jitted step, or jax_debug_nans aborts every eval with
    a padded tail (the metrics are dropped host-side anyway)."""
    from crosstalk_tpu.config import ModelConfig
    from crosstalk_tpu.data.index import PairIndex
    from crosstalk_tpu.data.pipeline import TileStore
    from crosstalk_tpu.eval.engine import evaluate
    from crosstalk_tpu.io.torch_convert import load_pth
    from crosstalk_tpu.models import build_model

    _, mixed_dir, source_dir, ckpt, _ = cli_setup
    model = build_model(ModelConfig(variant="single", compute_dtype="f32"))
    variables = load_pth(ckpt, "single")
    store = TileStore(PairIndex(mixed_dir, source_dir).samples, jobs=1)

    jax.config.update("jax_debug_nans", True)
    try:
        rows, loss = evaluate(model, variables, store, batch_size=4,
                              with_metrics=True)
    finally:
        jax.config.update("jax_debug_nans", False)
    assert len(rows) == 10
    assert np.isfinite(loss)
    for row in rows:  # real rows keep real (finite, here) metric values
        assert np.isfinite(float(row["Pearsons Correlation"]))

"""Smoke tests for the repo tooling (tools/make_dataset.py,
tools/scale_bench.py) — the scale/pipeline evidence must not rot."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_make_dataset_layout(tmp_path):
    from crosstalk_tpu.data.index import PairIndex
    from tools.make_dataset import main as make_dataset

    rc = make_dataset([str(tmp_path), "-n", "6", "--size", "32"])
    assert rc in (0, None)
    index = PairIndex(os.path.join(str(tmp_path), "Mixed"),
                      os.path.join(str(tmp_path), "Source"))
    assert len(index) == 6
    # tiles decode and labels parse from the filenames
    from crosstalk_tpu.data.pipeline import TileStore

    store = TileStore(index.samples, jobs=2)
    assert store.tiles.shape == (6, 32, 32, 2)
    assert (store.labels > 0).all() and (store.labels <= 0.5).all()


def test_make_dataset_microscopy_preset(tmp_path):
    """--preset microscopy writes the reference layout AND matches the real
    bundled tiles' key statistics (right-skewed sparse intensities,
    correlated channels, faint raw source) — the round-4 sim-to-real
    generator (TRAINING_RESULTS 'sim-to-real')."""
    import numpy as np

    from crosstalk_tpu.data.index import PairIndex
    from crosstalk_tpu.data.pipeline import TileStore
    from crosstalk_tpu.data.synthetic import generate_pair_microscopy
    from tools.make_dataset import main as make_dataset

    rc = make_dataset([str(tmp_path), "-n", "6", "--size", "32",
                       "--preset", "microscopy"])
    assert rc in (0, None)
    index = PairIndex(os.path.join(str(tmp_path), "Mixed"),
                      os.path.join(str(tmp_path), "Source"))
    store = TileStore(index.samples, jobs=2)
    assert store.tiles.shape == (6, 32, 32, 2)
    assert (store.labels > 0).all() and (store.labels <= 0.5).all()

    # distribution properties, measured over enough pairs to be stable
    rng = np.random.default_rng(3)
    pairs = [generate_pair_microscopy(rng, 128) for _ in range(24)]
    norm_means = []
    for mixed, source, alpha in pairs:
        assert 0.01 <= alpha <= 0.5
        assert source.max() < 0.1, "raw source must be faint (real: <0.05)"
        assert mixed.max() > 0.1, "raw mixed is O(0.1-1)"
        sn = (source - source.min()) / (source.max() - source.min())
        norm_means.append(sn.mean())
    # right-skewed: normalized mean far below the uniform preset's 0.5
    assert 0.03 < float(np.mean(norm_means)) < 0.35

    # v1 preset is untouched (quickstart/back-compat)
    from crosstalk_tpu.data.synthetic import generate_pair

    m, s, a = generate_pair(np.random.default_rng(0), 32)
    assert m.shape == (32, 32)


def test_make_pretrained_artifact(tmp_path):
    """tools/make_pretrained.py regenerates the reference's missing
    PreTrained_Model artifact (naming contract train_model.py:645-646)."""
    import glob

    import torch

    from tests.conftest import make_synthetic_dataset
    from tools.make_pretrained import main as make_pretrained

    mixed, source = make_synthetic_dataset(str(tmp_path), n=12, size=64, seed=9)
    out = str(tmp_path / "PreTrained_Model")
    rc = make_pretrained([
        "-m", mixed, "-s", source, "-o", "single", "-b", "8", "-l", "5e-4",
        "-n", "1", "-j", "2", "--out", out,
        # tiny model: the tool's contract (train -> copy final .pth under
        # the reference's PreTrained_Model naming) is size-independent
        "--initial_filters", "8", "--num_conv_blocks", "3",
    ])
    assert rc == 0
    (pth,) = glob.glob(os.path.join(out, "crosstalk_regression_model_trained_*_8_0.0005.pth"))
    sd = torch.load(pth, map_location="cpu", weights_only=True)
    assert any(k.startswith("conv_layers.0.") for k in sd)


def test_unmix_demo_figure(tmp_path):
    """tools/unmix_demo.py end-to-end (tiny model, CPU): trains nothing —
    loads a 1-epoch checkpoint, scores generated demo pairs through the
    predict CLI's --unmix path, and writes the before/after montage. The
    visual receipt in results/unmix_demo.png must stay reproducible."""
    import glob
    import json

    from tests.conftest import make_synthetic_dataset
    from tools.make_pretrained import main as make_pretrained
    from tools.unmix_demo import main as unmix_demo

    mixed, source = make_synthetic_dataset(str(tmp_path), n=12, size=64, seed=3)
    out = str(tmp_path / "PreTrained_Model")
    rc = make_pretrained([
        "-m", mixed, "-s", source, "-o", "single", "-b", "8", "-l", "5e-4",
        "-n", "1", "-j", "2", "--out", out,
        "--initial_filters", "8", "--num_conv_blocks", "3",
    ])
    assert rc == 0
    (pth,) = glob.glob(os.path.join(out, "*.pth"))

    png = str(tmp_path / "demo.png")
    import io as _io
    from contextlib import redirect_stdout

    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = unmix_demo([
            "-p", pth, "-o", png, "--pairs", "2", "--size", "64",
            "--initial_filters", "8", "--num_conv_blocks", "3",
        ])
    assert rc == 0
    assert os.path.getsize(png) > 10_000
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["pairs"] == 2
    # an untrained-ish model won't unmix well; the contract is the keys
    assert set(summary) == {"pairs", "mean_abs_alpha_err",
                            "mean_bleed_removed_pct", "png"}


def test_distill_tool_end_to_end(tmp_path):
    """tools/distill.py (tiny shapes, CPU): teacher .pth labels the train
    split, the width-4 student trains through the standard loop, the
    scoreboard evaluates on TRUE labels, and the run dir carries the full
    artifact contract (so serve/eval/analyse tooling works on students)."""
    import glob

    import torch

    from tests.conftest import make_synthetic_dataset
    from tests.torch_ref import TorchSingle, burn_in_batch_stats
    from tools.distill import main as distill

    mixed, source = make_synthetic_dataset(str(tmp_path), n=24, size=32,
                                           seed=3)
    torch.manual_seed(5)
    teacher = burn_in_batch_stats(
        TorchSingle(image_size=32, initial_filters=8, num_blocks=3), 32)
    teacher_path = str(tmp_path / "teacher.pth")
    torch.save(teacher.state_dict(), teacher_path)

    base = str(tmp_path / "out")
    rc = distill([
        "-m", mixed, "-s", source, "-p", teacher_path,
        "--initial_filters", "4", "--num_conv_blocks", "3",
        "-b", "8", "-n", "1", "-r", "onecycle", "--blend", "0.2",
        "-j", "2", "--output_base", base,
    ])
    assert rc == 0
    (run_dir,) = glob.glob(os.path.join(base, "training_run_*"))
    for pattern in ("params.txt", "model_architecture.txt",
                    "training_log_*.csv", "best_model_onecycle.pth",
                    "crosstalk_regression_model_trained_*.pth",
                    "test_predictions_*.csv", "train_predictions_*.csv",
                    "val_predictions_*.csv"):
        assert glob.glob(os.path.join(run_dir, pattern)), pattern
    # the provenance line lands in params.txt; the student .pth is the
    # student's size (strict-load into a width-4 torch twin)
    with open(os.path.join(run_dir, "params.txt")) as f:
        assert "distilled_from" in f.read()
    (student_path,) = glob.glob(
        os.path.join(run_dir, "crosstalk_regression_model_trained_*.pth"))
    student = TorchSingle(image_size=32, initial_filters=4, num_blocks=3)
    student.load_state_dict(
        torch.load(student_path, map_location="cpu", weights_only=True))

    # invalid blend is rejected before any work
    assert distill([
        "-m", mixed, "-s", source, "-p", teacher_path, "--blend", "1.5",
    ]) == 1

    # --resume continues the SAME run from its native checkpoint: identity
    # hyperparameters (student width, blend, teacher, schedule) are adopted
    # from params.txt even when the resume invocation passes conflicting
    # flags; -n is the extendable total-epoch target; the original log CSV
    # gains the new epochs; params.txt stays the original record.
    rc = distill([
        "-m", mixed, "-s", source, "-p", teacher_path,
        "--initial_filters", "8",  # conflicts — must be overridden to 4
        "--blend", "0.9",          # conflicts — must be overridden to 0.2
        "-n", "2", "-j", "2", "--resume", run_dir,
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(run_dir, "params_resume.txt"))
    (log_csv,) = glob.glob(os.path.join(run_dir, "training_log_*.csv"))
    with open(log_csv) as f:
        epochs = [line.split(",")[0] for line in f
                  if line.split(",")[0].isdigit()]
    assert epochs == ["1", "2"]
    # the final .pth still strict-loads at the ORIGINAL student width
    # (the resumed epilogue writes its own timestamped final .pth — take
    # the newest)
    newest = max(
        glob.glob(os.path.join(
            run_dir, "crosstalk_regression_model_trained_*.pth")),
        key=os.path.getmtime)
    student = TorchSingle(image_size=32, initial_filters=4, num_blocks=3)
    student.load_state_dict(
        torch.load(newest, map_location="cpu", weights_only=True))


@pytest.mark.skipif(
    not os.environ.get("CROSSTALK_RUN_SLOW"),
    reason="minutes of CPU conv compute; set CROSSTALK_RUN_SLOW=1 to run",
)
def test_scale_bench_smoke():
    """End-to-end pipeline bench runs (tiny: 24 pairs, 1 epoch, CPU)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scale_bench.py"),
         "-n", "24", "-b", "8", "--epochs", "1"],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "tiles/s end-to-end" in out.stdout


def test_sweep_runner_end_to_end(tmp_path):
    """tools/sweep.py runs a 2-combination grid and the analyzer
    consolidates both runs; then the REFERENCE's actual analyse module
    (/root/reference/analyse_training_results.py, imported and run over our
    run dirs via its importable analyze_training_directory) must parse them
    and agree with our reimplementation row for row — the executable form of
    MIGRATION.md's interchangeability claim."""
    import csv

    from tools.make_dataset import main as make_dataset
    from tools.sweep import main as sweep_main

    data = tmp_path / "data"
    rc = make_dataset([str(data), "-n", "16", "--size", "64"])
    assert rc in (0, None)
    out = tmp_path / "sweep"
    out.mkdir()
    rc = sweep_main([
        "-m", str(data / "Mixed"), "-s", str(data / "Source"),
        "--batch_sizes", "4", "8", "--learning_rates", "1e-3",
        "-n", "1", "-j", "2", "-o", "single", "-r", "aggressive_plateau",
        "--compute_dtype", "f32", "--output_base", str(out), "--analyse",
        # tiny model: the runner/analyzer contract under test (dir naming,
        # CSV schema, analyzer agreement) is model-size-independent
        "--initial_filters", "8", "--num_conv_blocks", "3",
    ])
    assert rc == 0
    run_dirs = sorted(out.glob("training_run_*"))
    assert len(run_dirs) == 2
    assert {d.name.split("_B")[1].split("_LR")[0] for d in run_dirs} == {"4", "8"}
    results = out / "training_analysis_results.csv"
    assert results.exists()
    with open(results) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert {r["batch_size"] for r in rows} == {"4", "8"}

    # cross-check: the reference's own parser over OUR run directories
    ref_path = "/root/reference/analyse_training_results.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference snapshot not mounted")
    pytest.importorskip("pandas")
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_analyse", ref_path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    ref_rows = {r["directory"]: r
                for r in ref.analyze_training_directory(str(out))}
    ours = {r["directory"]: r for r in rows}
    assert set(ref_rows) == set(ours)
    for name, rr in ref_rows.items():
        mine = ours[name]
        assert rr["batch_size"] == int(mine["batch_size"])
        assert rr["learning_rate"] == pytest.approx(
            float(mine["learning_rate"]))
        for key in ("min_train_loss", "min_val_loss", "test_mse"):
            assert rr[key] == pytest.approx(float(mine[key]), rel=1e-9), (
                f"{name}.{key}: reference {rr[key]} vs ours {mine[key]}")
        for key in ("min_train_epoch", "min_val_epoch"):
            assert int(rr[key]) == int(float(mine[key]))

    # and the reference's CSV writer round-trips our data unmodified
    ref_csv = str(tmp_path / "ref_analysis.csv")
    ref.save_results_to_csv(list(ref_rows.values()), ref_csv)
    with open(ref_csv) as f:
        assert len(list(csv.DictReader(f))) == 2


def test_serve_bench_smoke():
    """tools/serve_bench.py end-to-end on CPU (tiny window): prints one
    JSON line with throughput + latency percentiles + occupancy."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "serve_bench.py"),
         "--image_size", "64", "--batch_size", "4", "--clients", "3",
         "--tiles_per_request", "2", "--seconds", "3", "--parity"],
        capture_output=True, text=True, cwd=REPO, timeout=420, env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    import json

    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["tiles_per_sec"] > 0
    assert stats["requests"] > 0
    assert 0 < stats["latency_ms_p50"] <= stats["latency_ms_max"]
    assert 0 < stats["batch_occupancy"] <= 1

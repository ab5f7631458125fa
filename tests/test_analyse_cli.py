"""Sweep-analysis CLI tests: the analyse tool must parse run directories
produced by OUR train CLI (the full artifact-contract roundtrip the reference
relies on — analyse_training_results.py parses dir names and CSVs back), plus
the reference's quirkier inputs (extra metadata rows, missing files).
"""

import csv
import glob
import os

import numpy as np
import pytest

from crosstalk_tpu.cli.analyse import (
    analyze_test_predictions,
    analyze_training_log,
    extract_run_info_from_dirname,
    main as analyse_main,
)


def test_dirname_regex_matches_reference_contract():
    assert extract_run_info_from_dirname(
        "training_run_2025-08-16_09-11-06_B256_LR1e-06"
    ) == (256, 1e-06)
    assert extract_run_info_from_dirname(
        "training_run_2026-01-01_00-00-00_B8_LR0.001"
    ) == (8, 0.001)
    assert extract_run_info_from_dirname("eval_run_2026") == (None, None)


def test_roundtrip_with_real_train_cli_output(tmp_path):
    """Run the actual train CLI, then analyse its output directory."""
    from crosstalk_tpu.cli.train import main as train_main
    from tests.conftest import make_synthetic_dataset

    mixed_dir, source_dir = make_synthetic_dataset(str(tmp_path), n=12, size=64)
    rc = train_main([
        "-m", mixed_dir, "-s", source_dir, "-b", "4", "-l", "0.001", "-n", "2",
        "-o", "single", "-r", "aggressive_plateau",
        "--compute_dtype", "f32", "--output_base", str(tmp_path),
        "--num_devices", "1",
        # tiny model: the analyse contract (dir naming, CSV schema) under
        # test is model-size-independent
        "--initial_filters", "8", "--num_conv_blocks", "3",
    ])
    assert rc == 0

    out_csv = str(tmp_path / "training_analysis_results.csv")
    rc = analyse_main(["-d", str(tmp_path), "-o", out_csv])
    assert rc == 0

    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    row = rows[0]
    assert row["batch_size"] == "4"
    assert float(row["learning_rate"]) == 0.001
    assert float(row["min_train_loss"]) > 0
    assert int(float(row["min_val_epoch"])) in (1, 2)

    # test_mse recomputed from the predictions CSV must match a direct calc
    (pred,) = glob.glob(os.path.join(glob.glob(str(tmp_path / "training_run_*"))[0],
                                     "test_predictions_*.csv"))
    with open(pred) as f:
        r = list(csv.DictReader(f))
    expected = np.mean([
        (float(x["Actual_Label"]) - float(x["Predicted_Label"])) ** 2 for x in r
    ])
    assert float(row["test_mse"]) == pytest.approx(expected, rel=1e-6)


def test_header_discovery_with_extra_metadata(tmp_path):
    """skip_rows-style header discovery handles arbitrary metadata preambles
    (the reference brute-forces skiprows, analyse_training_results.py:9-22)."""
    log = tmp_path / "training_log_x.csv"
    log.write_text(
        "some,meta\nmore,meta\neven,more,meta\n"
        "epoch,train_loss,val_loss,learning_rate\n"
        "1,0.5,0.4,0.001\n2,0.3,0.35,0.001\n"
    )
    result = analyze_training_log(str(log))
    assert result["min_train_loss"] == 0.3
    assert result["min_train_epoch"] == 2
    assert result["min_val_loss"] == 0.35


def test_missing_files_tolerated(tmp_path, capsys):
    os.makedirs(tmp_path / "training_run_2026-01-01_00-00-00_B8_LR0.1")
    out_csv = str(tmp_path / "out.csv")
    rc = analyse_main(["-d", str(tmp_path), "-o", out_csv])
    assert rc == 0
    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["min_train_loss"] == ""
    assert "Warning: No training log" in capsys.readouterr().out


def test_empty_base_dir(tmp_path, capsys):
    rc = analyse_main(["-d", str(tmp_path)])
    assert rc == 1
    assert "No training directories found" in capsys.readouterr().out


def test_bad_predictions_file(tmp_path):
    bad = tmp_path / "test_predictions_x.csv"
    bad.write_text("not,a,valid\nprediction,file,at all\n")
    assert analyze_test_predictions(str(bad)) is None

"""Training-sweep analysis CLI — the reference's ``analyse_training_results.py``
(all 199 lines) rebuilt.

Scans a base directory for ``training_run_*`` run dirs, extracts batch size /
learning rate from the directory name (the reference's regex contract,
analyse_training_results.py:28), reads each training log by brute-forcing the
header offset exactly like the reference's ``skip_rows`` (lines 9-22, so logs
with a variable number of metadata rows keep working), recomputes the test
MSE from the predictions CSV (lines 71-83), writes a consolidated
``training_analysis_results.csv`` and prints the summary.

Divergence: the reference hardcodes a Windows share as the base directory
(line 166); here it is the ``-d/--base_directory`` flag, default ".".
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from typing import Optional

import numpy as np
import pandas as pd

RUN_DIR_PATTERN = re.compile(r"training_run_.*_B(\d+)_LR([\d\.e\-]+)")

COLUMN_ORDER = [
    "directory",
    "batch_size",
    "learning_rate",
    "min_train_loss",
    "min_train_epoch",
    "min_val_loss",
    "min_val_epoch",
    "test_mse",
]


def extract_run_info_from_dirname(dirname: str):
    match = RUN_DIR_PATTERN.search(dirname)
    if match:
        return int(match.group(1)), float(match.group(2))
    return None, None


def skip_rows(file_path: str, colname: str, max_tries: int = 50) -> int:
    """Find the first skiprows value at which ``colname`` is a CSV header."""
    for skip in range(max_tries):
        try:
            df = pd.read_csv(file_path, skiprows=skip, nrows=1)
        except Exception:
            continue
        if colname in df.columns:
            return skip
    return -1


def analyze_training_log(log_file_path: str) -> Optional[dict]:
    try:
        skip = skip_rows(log_file_path, "epoch")
        if skip < 0:
            raise ValueError("no header row found")
        df = pd.read_csv(log_file_path, skiprows=skip)
        i_train = df["train_loss"].idxmin()
        i_val = df["val_loss"].idxmin()
        return {
            "min_train_loss": df.loc[i_train, "train_loss"],
            "min_train_epoch": df.loc[i_train, "epoch"],
            "min_val_loss": df.loc[i_val, "val_loss"],
            "min_val_epoch": df.loc[i_val, "epoch"],
        }
    except Exception as e:
        print(f"Error reading training log {log_file_path}: {e}")
        return None


def analyze_test_predictions(test_file_path: str) -> Optional[float]:
    try:
        skip = skip_rows(test_file_path, "Actual_Label")
        if skip < 0:
            raise ValueError("no header row found")
        df = pd.read_csv(test_file_path, skiprows=skip)
        actual = df["Actual_Label"].values
        predicted = df["Predicted_Label"].values
        return float(np.mean((actual - predicted) ** 2))
    except Exception as e:
        print(f"Error reading test predictions {test_file_path}: {e}")
        return None


def analyze_training_directory(base_directory: str) -> list:
    results = []
    for training_dir in sorted(glob.glob(os.path.join(base_directory, "training_run_*"))):
        dir_name = os.path.basename(training_dir)
        print(f"Analyzing directory: {dir_name}")
        batch_size, learning_rate = extract_run_info_from_dirname(dir_name)
        result = {
            "directory": dir_name,
            "batch_size": batch_size,
            "learning_rate": learning_rate,
            "min_train_loss": None,
            "min_train_epoch": None,
            "min_val_loss": None,
            "min_val_epoch": None,
            "test_mse": None,
        }
        logs = glob.glob(os.path.join(training_dir, "training_log_*.csv"))
        if logs:
            analysis = analyze_training_log(logs[0])
            if analysis:
                result.update(analysis)
        else:
            print(f"  Warning: No training log found in {dir_name}")
        preds = glob.glob(os.path.join(training_dir, "test_predictions_*.csv"))
        if preds:
            mse = analyze_test_predictions(preds[0])
            if mse is not None:
                result["test_mse"] = mse
        else:
            print(f"  Warning: No test predictions found in {dir_name}")
        results.append(result)
    return results


def save_results_to_csv(results: list, output_file: str) -> None:
    df = pd.DataFrame(results)[COLUMN_ORDER]
    df.to_csv(output_file, index=False)
    print(f"Results saved to: {output_file}")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Consolidate training_run_* sweep results."
    )
    parser.add_argument("-d", "--base_directory", type=str, default=".",
                        help="Directory containing training_run_* subdirectories")
    parser.add_argument("-o", "--output_file", type=str,
                        default="training_analysis_results.csv")
    args = parser.parse_args(argv)

    print("Starting training analysis...")
    print(f"Looking for training directories in: {os.path.abspath(args.base_directory)}")
    results = analyze_training_directory(args.base_directory)
    if not results:
        print("No training directories found!")
        return 1
    print(f"\nFound {len(results)} training directories")
    save_results_to_csv(results, args.output_file)

    print("\nAnalysis Summary:")
    print("=" * 50)
    for r in results:
        print(f"Directory: {r['directory']}")
        print(f"  Batch Size: {r['batch_size']}, Learning Rate: {r['learning_rate']}")
        if r["min_train_loss"] is not None:
            print(f"  Min Train Loss: {r['min_train_loss']:.6f} (Epoch {r['min_train_epoch']})")
            print(f"  Min Val Loss: {r['min_val_loss']:.6f} (Epoch {r['min_val_epoch']})")
        if r["test_mse"] is not None:
            print(f"  Test MSE: {r['test_mse']:.6f}")
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main())

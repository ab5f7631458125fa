"""Parity against the reference's ACTUAL code (not the hand-written twins).

Two layers of proof:

1. In-process numeric parity: import /root/reference/regression_model.py and
   two_branch_regression.py directly, build the instantiated configs the
   reference CLIs use (test-cross-talk-model.py:256-258 — single: 128
   filters / 6 blocks; double: 64 filters/branch), convert the state_dict
   with ``torch_to_flax``, and compare eval-mode predictions on real tiles
   at full 256x256 to well under the 1e-4 MAE budget (BASELINE.md).
   The reference's ``_get_conv_output`` hardcodes 256x256 inputs
   (regression_model.py:31, two_branch_regression.py:60), so full-size
   tiles are mandatory here.

2. CLI-level cross-check: run the reference's actual
   test-cross-talk-model.py as a subprocess on a repo-exported .pth
   and diff its prediction CSV against our eval CLI's on the same data.
   skimage is not installed in this image, so the subprocess gets a tiny
   shim implementing skimage.metrics.structural_similarity (the published
   algorithm, 7x7 uniform window — same rederivation as test_metrics.py).
"""

import csv
import glob
import importlib.util
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from crosstalk_tpu.config import ModelConfig
from crosstalk_tpu.io.torch_convert import save_pth, torch_to_flax
from crosstalk_tpu.models import build_model

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SSIM_SHIM = '''\
"""Minimal stand-in for skimage.metrics (not installed in this image).

structural_similarity follows the published SSIM algorithm with skimage's
defaults: 7x7 uniform window, unbiased covariance, border-cropped mean.
"""
import numpy as np
from scipy.ndimage import uniform_filter


def structural_similarity(im1, im2, data_range=None, win_size=7, K1=0.01, K2=0.03):
    x = np.asarray(im1, dtype=np.float64)
    y = np.asarray(im2, dtype=np.float64)
    if data_range is None:
        raise ValueError("data_range is required")
    n = win_size * win_size
    cov_norm = n / (n - 1)
    f = lambda a: uniform_filter(a, size=win_size)
    ux, uy = f(x), f(y)
    vx = cov_norm * (f(x * x) - ux * ux)
    vy = cov_norm * (f(y * y) - uy * uy)
    vxy = cov_norm * (f(x * y) - ux * uy)
    c1 = (K1 * data_range) ** 2
    c2 = (K2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    pad = (win_size - 1) // 2
    return s[pad:-pad, pad:-pad].mean()
'''


def _import_reference_module(name):
    spec = importlib.util.spec_from_file_location(
        f"reference_{name}", os.path.join(REFERENCE, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize_running_stats(tmodel, seed):
    """Give every BatchNorm non-trivial running statistics so the parity
    check exercises the stats-conversion path, without paying for a full
    train-mode burn-in at 256px."""
    rng = np.random.default_rng(seed)
    sd = tmodel.state_dict()
    for key, value in sd.items():
        if key.endswith("running_mean"):
            sd[key] = torch.from_numpy(
                rng.normal(0, 0.05, value.shape).astype(np.float32))
        elif key.endswith("running_var"):
            sd[key] = torch.from_numpy(
                rng.uniform(0.5, 1.5, value.shape).astype(np.float32))
    tmodel.load_state_dict(sd)
    return tmodel


def _real_tile_batch(reference_data_dirs, n=4):
    """n real tiles from the bundled dataset, min-max normalized per channel
    (the reference's val/test transform, test-cross-talk-model.py:210-225)."""
    from crosstalk_tpu.data.index import PairIndex
    from crosstalk_tpu.data.pipeline import TileStore

    mixed_dir, source_dir = reference_data_dirs
    index = PairIndex(mixed_dir, source_dir, max_samples=n)
    store = TileStore(index.samples, jobs=1)
    tiles = np.asarray(store.tiles, dtype=np.float32)
    lo = tiles.min(axis=(1, 2), keepdims=True)
    hi = tiles.max(axis=(1, 2), keepdims=True)
    return (tiles - lo) / (hi - lo)


def _torch_eval(tmodel, x_nhwc):
    x = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        return tmodel(x).numpy()


@pytest.mark.parametrize("variant", ["single", "double"])
def test_reference_module_numeric_parity(variant, reference_data_dirs):
    """Full instantiated config, real reference nn.Module, real tiles:
    eval-mode predictions must agree to far under the 1e-4 MAE budget."""
    torch.manual_seed(21 if variant == "single" else 22)
    if variant == "single":
        ref = _import_reference_module("regression_model")
        tmodel = ref.AdvancedRegressionModel(initial_filters=128, num_conv_blocks=6)
        cfg = ModelConfig(variant="single", compute_dtype="f32")
    else:
        ref = _import_reference_module("two_branch_regression")
        tmodel = ref.SimplifiedTwoBranchRegressionModel(initial_filters_per_branch=64)
        cfg = ModelConfig(variant="double", compute_dtype="f32")
    tmodel = _randomize_running_stats(tmodel, seed=5)
    tmodel.eval()

    variables = torch_to_flax(tmodel.state_dict(), variant)
    model = build_model(cfg)

    x = _real_tile_batch(reference_data_dirs, n=4)
    ours = np.asarray(
        jax.jit(lambda v, a: model.apply(v, a, train=False))(variables, jnp.asarray(x))
    )
    theirs = _torch_eval(tmodel, x)

    mae = float(np.abs(ours - theirs).mean())
    assert mae < 1e-4, f"{variant}: MAE {mae:.3e} vs reference module"
    assert float(np.abs(ours - theirs).max()) < 5e-4


@pytest.mark.parametrize("variant", ["single", "double"])
def test_torch_style_repr_matches_reference_repr(variant):
    """model_architecture.txt content fidelity: our generated torch-style
    repr must be byte-identical to str() of the actual reference module
    (what the reference writes, train_model.py:556-559)."""
    from crosstalk_tpu.models import torch_style_repr

    if variant == "single":
        ref = _import_reference_module("regression_model")
        tmodel = ref.AdvancedRegressionModel(initial_filters=128, num_conv_blocks=6)
        cfg = ModelConfig(variant="single")
    else:
        ref = _import_reference_module("two_branch_regression")
        tmodel = ref.SimplifiedTwoBranchRegressionModel(initial_filters_per_branch=64)
        cfg = ModelConfig(variant="double")
    assert torch_style_repr(cfg) == str(tmodel)


def test_reference_eval_cli_cross_parity(tmp_path, reference_data_dirs):
    """The reference's actual test-cross-talk-model.py, run as a subprocess
    on a .pth exported by THIS framework, must produce the same predictions
    as our eval CLI on the same data (strict-load proves schema fidelity;
    CSV diff proves numeric fidelity)."""
    mixed_src, source_src = reference_data_dirs

    # small real-data subset (symlinks keep it cheap)
    mixed_dir = tmp_path / "Mixed"
    source_dir = tmp_path / "Source"
    mixed_dir.mkdir()
    source_dir.mkdir()
    n_pairs = 6
    for name in sorted(os.listdir(mixed_src))[:n_pairs]:
        stem = name.replace("_mixed.tif", "")
        os.symlink(os.path.join(mixed_src, name), mixed_dir / name)
        os.symlink(
            os.path.join(source_src, f"{stem}_source.tif"),
            source_dir / f"{stem}_source.tif",
        )

    # a full-size single-branch checkpoint exported by our converter
    torch.manual_seed(23)
    ref = _import_reference_module("regression_model")
    tmodel = _randomize_running_stats(
        ref.AdvancedRegressionModel(initial_filters=128, num_conv_blocks=6), seed=9
    )
    variables = torch_to_flax(tmodel.state_dict(), "single")
    ckpt = str(tmp_path / "exported.pth")
    save_pth(ckpt, variables, "single")

    # reference CLI subprocess (with the skimage shim on its path)
    shim = tmp_path / "shim" / "skimage"
    shim.mkdir(parents=True)
    (shim / "__init__.py").write_text("")
    (shim / "metrics.py").write_text(SSIM_SHIM)
    ref_cwd = tmp_path / "ref_run"
    ref_cwd.mkdir()
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{tmp_path / 'shim'}:{REFERENCE}"
    env["MPLBACKEND"] = "Agg"
    out = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, "test-cross-talk-model.py"),
         "-m", str(mixed_dir), "-s", str(source_dir), "-p", ckpt,
         "-j", "0", "-o", "single"],
        capture_output=True, text=True, timeout=900, env=env, cwd=str(ref_cwd),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    (ref_csv,) = glob.glob(str(ref_cwd / "eval_run_*" / "test_predictions_*.csv"))

    # our eval CLI on the same data + checkpoint
    from crosstalk_tpu.cli.evaluate import main as eval_main

    out_base = str(tmp_path / "ours")
    rc = eval_main([
        "-m", str(mixed_dir), "-s", str(source_dir), "-p", ckpt,
        "-j", "1", "-o", "single", "--output_base", out_base,
        "--batch_size", "4",
    ])
    assert rc == 0
    (our_csv,) = glob.glob(os.path.join(out_base, "eval_run_*", "test_predictions_*.csv"))

    def rows_by_key(path):
        with open(path) as f:
            rows = list(csv.DictReader(f))
        return {
            (int(r["Image_ID"]), round(float(r["Actual_Label"]), 4)): r
            for r in rows
        }

    theirs = rows_by_key(ref_csv)
    ours = rows_by_key(our_csv)
    assert set(theirs) == set(ours) and len(theirs) == n_pairs

    pred_diffs = []
    for key, trow in theirs.items():
        orow = ours[key]
        pred_diffs.append(
            abs(float(trow["Predicted_Label"]) - float(orow["Predicted_Label"]))
        )
        for field in ["Root Mean Squared Error", "Structural Similarity Index",
                      "Histogram Correlation", "Normalized Mutual Information",
                      "Pearsons Correlation"]:
            assert abs(float(trow[field]) - float(orow[field])) < 2e-3, (
                f"{field} mismatch for {key}: {trow[field]} vs {orow[field]}"
            )
    assert float(np.mean(pred_diffs)) < 1e-4, pred_diffs
    assert float(np.max(pred_diffs)) < 5e-4, pred_diffs


TORCHVISION_SHIM = '''\
"""Minimal torchvision.transforms.functional stand-in (torchvision is not
installed in this image). The reference train CLI's only live calls are
hflip/vflip (train_model.py:228-234), whose torchvision tensor
implementations are exactly torch.flip on the last / second-to-last dim."""
import torch


def hflip(img):
    return torch.flip(img, dims=[-1])


def vflip(img):
    return torch.flip(img, dims=[-2])
'''


@pytest.mark.skipif(
    not os.environ.get("CROSSTALK_RUN_SLOW"),
    reason="~3-8 min of torch CPU training; set CROSSTALK_RUN_SLOW=1 to run",
)
@pytest.mark.parametrize("variant", ["single", "double"])
def test_reference_train_cli_artifacts_interop(
    tmp_path, reference_data_dirs, variant
):
    """Run the reference's ACTUAL train_model.py to completion (2 epochs on
    24 bundled pairs; torchvision shimmed to its two live calls) and prove
    its training artifacts interop end-to-end with this framework:

    * the final ``crosstalk_regression_model_trained_*.pth`` loads through
      our converter (strict schema fidelity on reference-TRAINED weights,
      not synthetic ones),
    * our seed-43 split replication reconstructs the reference's test
      split exactly (the CSV's Actual_Label column matches sample-for-
      sample in loader order), and
    * our eval-mode forward reproduces the reference's own
      test_predictions CSV to the cross-framework f32 budget.

    Matches the reference's train->save->reload->evaluate flow at
    /root/reference/train_model.py:640-677.
    """
    from crosstalk_tpu.data.index import PairIndex, split_samples
    from crosstalk_tpu.data.pipeline import load_tiles
    from crosstalk_tpu.data.transforms import normalize_batch_nhwc
    from crosstalk_tpu.io.torch_convert import (
        load_pth,
        model_config_for_checkpoint,
    )

    mixed_src, source_src = reference_data_dirs

    # 24 real pairs: split = 16 train / 3 val / 5 test; at batch 4 the
    # reference's drop_last keeps 4 train batches and 1 test batch (its
    # val pass sees 0 batches and reports val_loss 0.0 — harmless for 2
    # epochs of the plateau scheduler).
    mixed_dir = tmp_path / "Mixed"
    source_dir = tmp_path / "Source"
    mixed_dir.mkdir()
    source_dir.mkdir()
    n_pairs = 24
    for name in sorted(os.listdir(mixed_src))[:n_pairs]:
        stem = name.replace("_mixed.tif", "")
        os.symlink(os.path.join(mixed_src, name), mixed_dir / name)
        os.symlink(
            os.path.join(source_src, f"{stem}_source.tif"),
            source_dir / f"{stem}_source.tif",
        )

    shim = tmp_path / "shim" / "torchvision"
    (shim / "transforms").mkdir(parents=True)
    (shim / "__init__.py").write_text("")
    (shim / "transforms" / "__init__.py").write_text(
        "from . import functional  # noqa: F401\n"
    )
    (shim / "transforms" / "functional.py").write_text(TORCHVISION_SHIM)

    ref_cwd = tmp_path / "ref_run"
    ref_cwd.mkdir()
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{tmp_path / 'shim'}:{REFERENCE}"
    env["MPLBACKEND"] = "Agg"
    out = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, "train_model.py"),
         "-m", str(mixed_dir), "-s", str(source_dir),
         "-b", "4", "-n", "2", "-o", variant, "-r", "aggressive_plateau",
         "-j", "0"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=str(ref_cwd),
    )
    assert out.returncode == 0, out.stderr[-3000:]

    (run_dir,) = glob.glob(str(ref_cwd / "training_run_*"))
    for artifact in ("params.txt", "model_architecture.txt",
                     "best_model_plateau.pth"):
        assert os.path.exists(os.path.join(run_dir, artifact)), artifact
    (log_csv,) = glob.glob(os.path.join(run_dir, "training_log_*.csv"))
    with open(log_csv) as f:
        rows = list(csv.reader(f))
    assert rows[-1][0] == "2"  # both epochs logged
    (final_pth,) = glob.glob(
        os.path.join(run_dir, "crosstalk_regression_model_trained_*.pth")
    )
    (ref_csv,) = glob.glob(os.path.join(run_dir, "test_predictions_*.csv"))
    with open(ref_csv) as f:
        ref_rows = list(csv.DictReader(f))
    assert len(ref_rows) == 4  # 5 test samples, drop_last at batch 4

    # reference-trained weights through our converter + forward
    variables = load_pth(final_pth, variant)
    cfg = model_config_for_checkpoint(variant, variables)
    model = build_model(cfg)

    index = PairIndex(str(mixed_dir), str(source_dir))
    _, _, test_samples = split_samples(index.samples, 0.7, 0.15)
    assert len(test_samples) == 5
    batch = test_samples[:4]  # the reference's one drop_last test batch
    for sample, row in zip(batch, ref_rows):
        assert abs(sample.scalar_label - float(row["Actual_Label"])) < 1e-6

    raw = load_tiles(batch, jobs=1)
    norm = np.asarray(normalize_batch_nhwc(jnp.asarray(raw, jnp.float32)))
    apply = jax.jit(lambda v, a: model.apply(v, a, train=False))
    preds = np.asarray(apply(variables, jnp.asarray(norm))).reshape(-1)
    diffs = [abs(float(p) - float(r["Predicted_Label"]))
             for p, r in zip(preds, ref_rows)]
    # Tolerance note: a 2-epoch model is deliberately ill-conditioned
    # (fresh BN running stats, unsettled head), which amplifies the
    # cross-framework f32 conv noise to ~1e-4-1e-3 in alpha units here
    # (vs <1e-4 for the converged/controlled-weights parity tests, and
    # agreement to every printed digit for fully-trained checkpoints —
    # TRAINING_RESULTS.md "Head-to-head"). This test pins the artifact
    # schema, split replication, and forward-path agreement, not the
    # strict MAE budget (test_reference_eval_cli_cross_parity does that).
    assert float(np.mean(diffs)) < 1.5e-3, diffs
    assert float(np.max(diffs)) < 5e-3, diffs

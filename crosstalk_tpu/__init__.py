"""CrosstalkTPU — a TPU-native (JAX/Flax/optax/Pallas) framework for detecting
cross-talk (bleed-through) between fluorescence-microscopy channels.

This is a from-scratch rebuild of the capabilities of djpbarry/Torch-Unet
("CrosstalkPy", reference mounted at /root/reference): a regression CNN that
predicts the bleed-through coefficient alpha between a "mixed" channel and a
"pure source" channel from paired 256x256 tiles.

Design (TPU-first, not a port):
  * Models are Flax modules in NHWC layout, compiled by XLA onto the MXU
    (reference: regression_model.py, two_branch_regression.py — PyTorch NCHW).
  * The data path is a threaded host decode + packed cache + device-side
    normalize/augment pipeline (reference: torch DataLoader worker forks).
  * Training is optax with torch-formula-exact schedules
    (reference: train_model.py:325-491).
  * Evaluation computes the classical-metric comparison (RMSE / SSIM /
    histogram correlation / NMI / Pearson) as batched JAX ops on device
    (reference: test-cross-talk-model.py:25-121 — per-sample CPU loops).
  * Scaling is a JAX `Mesh` + `shard_map` data-parallel layer with psum
    gradient/BN-stat reduction over ICI, extended to multi-host pods via
    jax.distributed (reference: single device only).
  * A .pth <-> Flax weight converter provides checkpoint interop and the
    eval-mode numeric-parity harness.
  * Serving: an online HTTP server with dynamic request batching (serve/)
    and AOT StableHLO export for model-code-free deployment (io/export.py)
    — the reference is offline-only.

The public CLI surface (train_model.py / test-cross-talk-model.py /
analyse_training_results.py flags and on-disk artifact contract) is preserved.
"""

__version__ = "0.1.0"

# Top-level convenience API. Resolved lazily so `import crosstalk_tpu`
# stays light (no jax import) until a symbol is actually used — the CLIs
# configure jax (platform, compilation cache) before touching the library.
_PUBLIC_API = {
    # config
    "ModelConfig": "crosstalk_tpu.config",
    "OptimConfig": "crosstalk_tpu.config",
    "TrainConfig": "crosstalk_tpu.config",
    # data
    "PairIndex": "crosstalk_tpu.data",
    "Sample": "crosstalk_tpu.data",
    "UnlabeledIndex": "crosstalk_tpu.data",
    "pair_unlabeled": "crosstalk_tpu.data",
    "split_samples": "crosstalk_tpu.data",
    "read_tile": "crosstalk_tpu.data",
    "TileStore": "crosstalk_tpu.data",
    "DeviceDataset": "crosstalk_tpu.data",
    "Batch": "crosstalk_tpu.data",
    # models
    "build_model": "crosstalk_tpu.models",
    "init_model": "crosstalk_tpu.models",
    "count_params": "crosstalk_tpu.models",
    "SingleBranchRegressor": "crosstalk_tpu.models",
    "TwoBranchRegressor": "crosstalk_tpu.models",
    # train
    "train_model": "crosstalk_tpu.train",
    "TrainState": "crosstalk_tpu.train",
    "init_train_state": "crosstalk_tpu.train",
    "make_train_step": "crosstalk_tpu.train",
    "make_val_step": "crosstalk_tpu.train",
    "make_optimizer": "crosstalk_tpu.train",
    # eval / serving
    "evaluate": "crosstalk_tpu.eval",
    "evaluate_and_save": "crosstalk_tpu.eval",
    "make_fast_forward": "crosstalk_tpu.eval",
    # checkpoint / interop
    "save_checkpoint": "crosstalk_tpu.io",
    "load_checkpoint": "crosstalk_tpu.io",
    "read_checkpoint_meta": "crosstalk_tpu.io",
    "load_pth": "crosstalk_tpu.io",
    "save_pth": "crosstalk_tpu.io",
    "torch_to_flax": "crosstalk_tpu.io",
    "flax_to_torch": "crosstalk_tpu.io",
    "export_serving_model": "crosstalk_tpu.io",
    "load_exported": "crosstalk_tpu.io",
}

__all__ = sorted(_PUBLIC_API) + ["__version__"]


def __getattr__(name: str):
    module = _PUBLIC_API.get(name)
    if module is None:
        raise AttributeError(f"module 'crosstalk_tpu' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(module), name)


def __dir__():
    return __all__

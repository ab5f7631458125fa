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

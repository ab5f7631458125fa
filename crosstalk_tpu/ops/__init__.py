from crosstalk_tpu.ops.metrics import (
    classical_metrics,
    hist_correlation,
    nmi,
    pearson,
    rmse,
    ssim,
)

__all__ = [
    "classical_metrics",
    "hist_correlation",
    "nmi",
    "pearson",
    "rmse",
    "ssim",
]

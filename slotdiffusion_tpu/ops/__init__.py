from .metrics import (
    ARI_metric,
    fARI_metric,
    miou_metric,
    fmiou_metric,
    mbo_metric,
    mse_metric,
    psnr_metric,
    ssim_metric,
    adjusted_rand_index,
    postproc_mask,
)

__all__ = [
    "ARI_metric",
    "fARI_metric",
    "miou_metric",
    "fmiou_metric",
    "mbo_metric",
    "mse_metric",
    "psnr_metric",
    "ssim_metric",
    "adjusted_rand_index",
    "postproc_mask",
]

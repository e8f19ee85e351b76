from imagefolder_tpu.eval.fid import (
    FIDStatistics,
    compute_statistics,
    frechet_distance,
    inception_score,
    precision_recall,
)
from imagefolder_tpu.eval.inception import InceptionV3, convert_inception_checkpoint
from imagefolder_tpu.eval.psnr_ssim import psnr, ssim

__all__ = [
    "FIDStatistics", "compute_statistics", "frechet_distance",
    "inception_score", "precision_recall", "InceptionV3",
    "convert_inception_checkpoint", "psnr", "ssim",
]

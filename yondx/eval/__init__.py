"""Evaluation: metrics and dataset harnesses."""
from .metrics import psnr, matlab_ssim, quality_assess, cal_kld

__all__ = ["psnr", "matlab_ssim", "quality_assess", "cal_kld"]

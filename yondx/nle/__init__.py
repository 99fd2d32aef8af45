"""Noise-level estimation: fused box-filter statistics, adaptive flat-region
threshold, masked least-squares Poisson-Gaussian fit.

TPU-native rebuild of the reference NLE stack: `stdfilt` (isp_algos.py:234),
`get_threshold` score3 (YOND_SIDD.py:22-49), `polyfit` (isp_algos.py:345),
`SelfNLF`/`CollabNLF` (YOND_SIDD.py:62-115). The whole estimate runs as one
jitted device computation with static shapes: variable-length flat-region
masking becomes masked weighted sums, and the score3 occupied-histogram scan
becomes a scatter-free per-bucket minimum scan over brightness buckets.
"""
from .boxfilter import (box_mean, stdfilt, varfilt, mean_varfilt,
                        nle_moments)
from .threshold import adaptive_threshold_score3, score3_threshold_with_p25
from .fit import masked_linefit
from .nlf import self_nlf, collab_nlf, simple_nlf

__all__ = [
    "box_mean", "stdfilt", "varfilt", "mean_varfilt", "nle_moments",
    "adaptive_threshold_score3", "score3_threshold_with_p25",
    "masked_linefit", "self_nlf", "collab_nlf", "simple_nlf",
]

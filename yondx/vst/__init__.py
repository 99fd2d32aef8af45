"""Generalized Anscombe VST, exact unbiased inverse, and bias correction.

TPU-native rebuild of the reference's L2 signal-processing layer
(utils/isp_algos.py): `VST` (:5), `inverse_VST` (:17), `close_form_bias`
(:84), `get_bias`/`get_bias_points` (:98/:142), `BiasLUT` (:162).

Design: the per-pixel transforms (`vst`, `inverse_vst`, LUT gather) are pure
jnp and fuse into the denoiser jit; LUT *construction* is a host-side numpy
computation (done once, cached to disk) using an exact separable
decomposition of the Poisson-Gaussian expectation instead of the reference's
per-lambda Monte-Carlo grid convolution — same integral, far faster.
"""
from .vst import vst, inverse_vst
from .bias import (
    close_form_bias, pg_pdf_grid, bias_points_numeric, bias_points,
)
from .lut import (
    BiasLUT, X_LUT, SG_LUT, X_EXT, FULL_X_GRID,
    build_bias_lut, bias_curve_for, lookup_bias_curve,
    cheb_fit_curve, lookup_bias_curve_cheb,
)

__all__ = [
    "vst", "inverse_vst",
    "close_form_bias", "pg_pdf_grid", "bias_points_numeric", "bias_points",
    "BiasLUT", "X_LUT", "SG_LUT", "X_EXT", "FULL_X_GRID",
    "build_bias_lut", "bias_curve_for", "lookup_bias_curve",
    "cheb_fit_curve", "lookup_bias_curve_cheb",
]

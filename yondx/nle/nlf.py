"""Self / collaborative noise-level fitting — one fused device computation.

Reference: SelfNLF (YOND_SIDD.py:62-87), CollabNLF (:89-115),
SimpleNLF dispatch (:117-124). Fits var = beta1 * mean + beta2 over flat
regions of packed RGGB planes.

The reference's SIDD-specific "concat 32 crops along channels" trick
(YOND_SIDD.py:64-65) exists to keep the box filters from straddling crop
boundaries; here crops are simply a leading batch dim — the filters vmap
over it and the statistics pool over all pixels, which is equivalent.

Everything (filters, percentile threshold, occupied-bin scan, masked fit)
runs inside a single jit: no host round-trips, no data-dependent shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .boxfilter import (box_mean, stdfilt, nle_moments, mean_varfilt,
                        varfilt)
from .threshold import score3_threshold_with_p25
from .fit import masked_linefit, nonsat_weights


def _flat_mask_and_fit(var, mean, texture, step: int):
    """Shared tail of Self/Collab NLF: adaptive threshold -> flat mask
    (with the reference's empty-mask 25th-percentile fallback,
    YOND_SIDD.py:77-84) -> saturation filter -> weighted line fit."""
    th, th25 = score3_threshold_with_p25(texture, mean, step=step)
    mask = (texture < th).astype(jnp.float32)
    # fallback: no flat area -> 25th percentile threshold (strict <)
    mask25 = (texture < th25).astype(jnp.float32)
    empty = jnp.sum(mask) == 0
    mask = jnp.where(empty, mask25, mask)
    # if even that is empty (constant texture map), fit over everything
    mask = jnp.where(jnp.sum(mask) == 0, jnp.ones_like(mask), mask)
    w = nonsat_weights(mean, mask)
    return masked_linefit(mean, var, w)


@partial(jax.jit, static_argnames=("k", "step"))
def self_nlf(lr_rggb, k: int = 29, step: int = 5):
    """Self NLE on a noisy RGGB stack [..., h, w, 4] -> (beta1, beta2).

    Reference SelfNLF (YOND_SIDD.py:62-87): local var from stdfilt(k)^2,
    local mean from blur(k), texture map = stdfilt(blur(img, 2k//3+1), k).
    """
    lr = lr_rggb.astype(jnp.float32)
    mean, var, texture = nle_moments(lr, k, k // 3 * 2 + 1)
    return _flat_mask_and_fit(var, mean, texture, step)


@partial(jax.jit, static_argnames=("k", "step"))
def collab_nlf(lr_rggb, dn_rggb, k: int = 29, step: int = 5):
    """Collaborative NLE using a denoised proxy [..., h, w, 4].

    Reference CollabNLF (YOND_SIDD.py:89-115): noise var =
    stdfilt(noisy)^2 - stdfilt(denoised)^2, mean from blur(denoised),
    texture map = stdfilt(denoised).
    """
    lr = lr_rggb.astype(jnp.float32)
    dn = dn_rggb.astype(jnp.float32)
    lr_var = jnp.maximum(varfilt(lr, k), 0.0)
    mean, dn_var = mean_varfilt(dn, k)
    var = lr_var - dn_var
    return _flat_mask_and_fit(var, mean, jnp.sqrt(dn_var), step)


def simple_nlf(lr_bayer, hr_bayer=None, k: int = 29, mode: str = "self"):
    """Bayer-domain dispatch (reference SimpleNLF, YOND_SIDD.py:117-124).

    Accepts a bayer frame [H, W] or a stack [B, H, W]; packs to RGGB then
    runs the requested estimator. Returns host floats (beta1, beta2).
    """
    from ..isp import bayer2rggb
    lr = bayer2rggb(jnp.asarray(lr_bayer))
    if mode == "self":
        b1, b2 = self_nlf(lr, k=k)
    elif mode == "collab":
        hr = bayer2rggb(jnp.asarray(hr_bayer))
        b1, b2 = collab_nlf(lr, hr, k=k)
    else:
        raise ValueError(mode)
    return float(b1), float(b2)

"""Spatial filters: guided filter, row-noise removal, log-domain 1-D blur.

Rebuild of the remaining utils/isp_algos.py filters:
- `guided_filter` / `fast_guided_filter` (:277-317): classic He et al.
  guided filter from box means; the fast variant computes coefficients at
  half resolution;
- `row_denoise` (:319-334): per-Bayer-row mean -> 1-D bilateral smoothing
  (d=25, sigmaColor=10, sigmaSpace=1+iso/200) -> subtract the row residual;
- `blur1d_log` (:266-275): in-place 3-tap smoothing in log2 domain.

All pure jnp (jit-safe).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nle.boxfilter import box_mean
from .bayer import bayer2rows, rows2bayer


def _bm(x, d):
    if x.ndim == 2:
        return box_mean(x, d)
    return box_mean(x, d)


def guided_filter(p, I, d: int = 7, eps: float = 1.0):
    """He et al. guided filter; p: target, I: guide (same shape [H,W] or
    [H,W,C]); box window d, regularizer eps (reference GuidedFilter,
    isp_algos.py:299-317; note the reference uses BORDER_REPLICATE there —
    our box filter uses reflect-101, a boundary-only difference)."""
    mu_p = _bm(p, d)
    mu_I = _bm(I, d)
    II = _bm(I * I, d)
    Ip = _bm(I * p, d)
    var = II - mu_I * mu_I
    cov = Ip - mu_I * mu_p
    a = cov / (var + eps)
    b = mu_p - a * mu_I
    mu_a = _bm(a, d)
    mu_b = _bm(b, d)
    return mu_a * I + mu_b


def _down2(x):
    return 0.25 * (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2]
                   + x[1::2, 1::2])


def _up2(x, H, W):
    y = jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)
    return y[:H, :W]


def fast_guided_filter(p, I, d: int = 7, eps: float = 1.0):
    """Half-resolution coefficient variant (isp_algos.py:277-297)."""
    H, W = I.shape[:2]
    p_lr, I_lr = _down2(p), _down2(I)
    mu_p = _bm(p_lr, d)
    mu_I = _bm(I_lr, d)
    II = _bm(I_lr * I_lr, d)
    Ip = _bm(I_lr * p_lr, d)
    var = II - mu_I * mu_I
    cov = Ip - mu_I * mu_p
    a = cov / (var + eps)
    b = mu_p - a * mu_I
    mu_a = _up2(_bm(a, d), H, W)
    mu_b = _up2(_bm(b, d), H, W)
    return mu_a * I + mu_b


def bilateral_1d(signal, d: int = 25, sigma_color: float = 10.0,
                 sigma_space: float = 1.0):
    """1-D bilateral filter, cv2.bilateralFilter semantics on a [N] signal
    (radius d//2, replicate border)."""
    r = d // 2
    n = signal.shape[0]
    xpad = jnp.pad(signal, (r, r), mode="edge")
    offs = np.arange(-r, r + 1)
    space_w = np.exp(-(offs ** 2) / (2.0 * sigma_space ** 2))
    # windows [N, 2r+1]
    idx = np.arange(n)[:, None] + offs[None, :] + r
    win = xpad[idx]
    color_w = jnp.exp(-((win - signal[:, None]) ** 2)
                      / (2.0 * sigma_color ** 2))
    w = color_w * jnp.asarray(space_w)[None, :]
    return jnp.sum(w * win, axis=1) / jnp.sum(w, axis=1)


def row_denoise(bayer, iso: float):
    """Remove row noise: per even/odd-row-plane row means, smooth them with
    a 1-D bilateral, subtract the residual (isp_algos.py:319-334)."""
    rows = bayer2rows(bayer)  # [2, H/2, W]
    out = []
    for i in range(2):
        means = jnp.mean(rows[i], axis=1)
        smooth = bilateral_1d(means, 25, sigma_color=10.0,
                              sigma_space=1.0 + iso / 200.0)
        out.append(rows[i] - (means - smooth)[:, None])
    return rows2bayer(jnp.stack(out))


def blur1d_log(data, c: float = 0.5, log: bool = True):
    """3-tap smoothing in log2 domain (isp_algos.py:266-275). The reference
    writes in place but reads from a pre-loop copy, so it is a plain
    (non-sequential) filter with the endpoints left untouched."""
    x = jnp.log2(data) if log else jnp.asarray(data)
    if x.shape[0] > 2:
        mid = x[1:-1] * c + (x[:-2] + x[2:]) * (1 - c) / 2
        x = jnp.concatenate([x[:1], mid, x[-1:]])
    return 2.0 ** x if log else x

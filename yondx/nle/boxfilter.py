"""Separable box-filter statistics matching cv2.blur semantics.

cv2.blur uses BORDER_REFLECT_101 by default (edge pixel not duplicated),
which is numpy/jnp `mode='reflect'`. The reference computes local std as
sqrt(max(E[x^2] - E[x]^2, 0)) from two blurs (stdfilt, isp_algos.py:234-242).

Implementation: two 1-D depthwise convolutions (k taps each). For the NLE
window k=29 over multi-megapixel planes this is bandwidth-bound and fuses
well under XLA; a fused Pallas mean+var kernel lives in yondx.nle.pallas_ops
for the perf path.

Layout: [..., H, W, C] (trailing channels) or [..., H, W].
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _sep_blur(x, k: int):
    """Mean filter with reflect-101 border on the two trailing-but-one dims.

    x: [..., H, W, C]. Returns same shape, float32.
    """
    pad = k // 2
    # pad H and W with reflect
    pad_cfg = [(0, 0)] * (x.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)]
    xp = jnp.pad(x, pad_cfg, mode="reflect")
    # collapse leading dims + channels into the batch for a depthwise 1-D conv
    lead = x.shape[:-3]
    H, W, C = x.shape[-3:]
    Hp, Wp = H + 2 * pad, W + 2 * pad
    y = xp.reshape((-1, Hp, Wp, C))
    y = jnp.moveaxis(y, -1, 1).reshape((-1, 1, Hp, Wp))  # [B*C, 1, Hp, Wp]
    # HIGHEST precision: on TPU the default conv path multiplies in
    # bfloat16, which costs ~3 decimal digits on the variance estimates the
    # NLE fit consumes. These convs are bandwidth-bound anyway.
    kern = jnp.full((1, 1, k, 1), 1.0 / k, y.dtype)
    y = lax.conv_general_dilated(y, kern, (1, 1), "VALID",
                                 precision=lax.Precision.HIGHEST)
    kern2 = jnp.full((1, 1, 1, k), 1.0 / k, y.dtype)
    y = lax.conv_general_dilated(y, kern2, (1, 1), "VALID",
                                 precision=lax.Precision.HIGHEST)
    y = y.reshape((-1, C, H, W))
    y = jnp.moveaxis(y, 1, -1)
    return y.reshape(lead + (H, W, C))


def _box1d_cumsum(x, k: int, axis: int):
    """Sliding-window mean along `axis` with reflect-101 border via prefix
    sums: O(1) per pixel instead of the k-tap conv (7-40x faster at k=29 on
    multi-MP planes; the conv path runs at ~10 GFLOP/s on the v5e because a
    single-input-channel depthwise conv cannot use the MXU)."""
    pad = k // 2
    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[axis] = (pad, pad)
    xp = jnp.pad(x, pad_cfg, mode="reflect")
    cs = jnp.cumsum(xp.astype(jnp.float32), axis=axis)
    zshape = list(cs.shape)
    zshape[axis] = 1
    cs = jnp.concatenate([jnp.zeros(zshape, cs.dtype), cs], axis=axis)
    n = x.shape[axis]
    hi = jax.lax.slice_in_dim(cs, k, k + n, axis=axis)
    lo = jax.lax.slice_in_dim(cs, 0, n, axis=axis)
    return (hi - lo) * (1.0 / k)


def _box2d(x, k: int):
    """[..., H, W, C] separable box mean, centered for fp32 accuracy: the
    prefix sums run on (x - mean(x)) so cancellation error stays ~1e-6 even
    on 2k-pixel rows (box_mean is shift-equivariant)."""
    c = jnp.mean(x, axis=(-3, -2), keepdims=True)
    y = _box1d_cumsum(x - c, k, x.ndim - 3)
    y = _box1d_cumsum(y, k, x.ndim - 2)
    return y + c


def box_mean(x, k: int):
    """cv2.blur(x, (k, k)) equivalent.

    [H, W] is treated as a single plane; ndim >= 3 is [..., H, W, C].
    """
    if x.ndim == 2:
        return _box2d(x[..., None], k)[..., 0]
    return _box2d(x, k)


def varfilt(x, k: int):
    """Local variance E[x^2] - E[x]^2 (reference varfilt, isp_algos.py:245).

    Computed on globally-centered data (mathematically identical — variance
    is shift-invariant — but numerically far better in fp32: E[x^2] and
    E[x]^2 of centered data are small, so their difference doesn't cancel).
    x and x^2 ride ONE stacked filter pass (channel concat) so the pad +
    prefix-sum chains run once.
    """
    if x.ndim == 2:
        x = x[..., None]
        squeeze = True
    else:
        squeeze = False
    c = jnp.mean(x, axis=(-3, -2), keepdims=True)
    xc = x - c
    both = _box2d(jnp.concatenate([xc, xc * xc], axis=-1), k)
    n = x.shape[-1]
    m, m2 = both[..., :n], both[..., n:]
    out = m2 - m * m
    return out[..., 0] if squeeze else out


def stdfilt(x, k: int):
    """Local std sqrt(max(var, 0)) (reference stdfilt, isp_algos.py:234)."""
    return jnp.sqrt(jnp.maximum(varfilt(x, k), 0.0))


def mean_varfilt(x, k: int):
    """(mean_k, var_k) of [..., h, w, C] with x and x^2 sharing one
    centered stacked box pass."""
    c = jnp.mean(x, axis=(-3, -2), keepdims=True)
    xc = x - c
    n = x.shape[-1]
    both = _box2d(jnp.concatenate([xc, xc * xc], axis=-1), k)
    m, m2 = both[..., :n], both[..., n:]
    return m + c, jnp.maximum(m2 - m * m, 0.0)


def nle_moments(x, k: int, inner: int):
    """(mean_k, var_k, texture) of [..., h, w, C] in three stacked box
    passes — the SelfNLF statistics (YOND_SIDD.py:66-71) with x/x^2 (and
    t1/t1^2) sharing one prefix-sum chain each:
      mean    = blur_k(x)
      var     = blur_k(x^2) - mean^2        (centered internally)
      texture = stdfilt_k(blur_inner(x))
    Identical results to the box_mean/stdfilt composition."""
    mean, var = mean_varfilt(x, k)
    c = jnp.mean(x, axis=(-3, -2), keepdims=True)
    t1 = _box2d(x - c, inner)
    n = x.shape[-1]
    tb = _box2d(jnp.concatenate([t1, t1 * t1], axis=-1), k)
    tm, tm2 = tb[..., :n], tb[..., n:]
    tex = jnp.sqrt(jnp.maximum(tm2 - tm * tm, 0.0))
    return mean, var, tex


def var_corr(x, k: int):
    """Mean²/mean-of-squares ratio map (reference var_corr,
    isp_algos.py:256-264) — the content-vs-noise correction factor for
    variance fits on textured regions."""
    m = box_mean(x, k)
    m2 = box_mean(x * x, k)
    return (m * m) / jnp.maximum(m2, 1e-20)


def np_box_mean(x: np.ndarray, k: int) -> np.ndarray:
    """Host twin via cv2 (bit-compatible with the reference's cv2.blur)."""
    import cv2
    return cv2.blur(x, (k, k))

"""Masked least-squares line fit var ~ beta1 * mean + beta2.

Reference `polyfit` (isp_algos.py:345-365): drops saturated/dark samples
(1e-4 < x < 0.8) when they leave > 1% of the points, then scipy lstsq on
[x, 1]. Data-dependent gather is jit-hostile, so this is a *weighted*
closed-form fit: with weights w in {0,1},

    beta1 = sum w (x - xbar)(y - ybar) / sum w (x - xbar)^2
    beta2 = ybar - beta1 * xbar

— the centered normal equations, identical to lstsq in exact arithmetic and
float32-stable (two-pass centering).
"""
from __future__ import annotations

import jax.numpy as jnp


def masked_linefit(x, y, w):
    """Weighted line fit; w: 0/1 (or soft) weights, same shape as x/y.

    Returns (beta1, beta2). Degenerate masks (sum w == 0 or zero variance)
    return (0, 0).
    """
    x = x.reshape(-1).astype(jnp.float32)
    y = y.reshape(-1).astype(jnp.float32)
    w = w.reshape(-1).astype(jnp.float32)
    n = jnp.sum(w)
    safe_n = jnp.maximum(n, 1.0)
    xbar = jnp.sum(w * x) / safe_n
    ybar = jnp.sum(w * y) / safe_n
    dx = x - xbar
    dy = y - ybar
    sxx = jnp.sum(w * dx * dx)
    sxy = jnp.sum(w * dx * dy)
    beta1 = jnp.where(sxx > 0, sxy / jnp.maximum(sxx, 1e-30), 0.0)
    beta2 = ybar - beta1 * xbar
    ok = n > 0
    return jnp.where(ok, beta1, 0.0), jnp.where(ok, beta2, 0.0)


def ransac_linefit(x, y, mask=None, min_samples: int | None = None,
                   n_trials: int = 64, seed: int = 2024):
    """Host-side RANSAC line fit (the reference's ransac=True branch,
    isp_algos.py:353-362, seeded 2024 like setup_seed there). Returns
    (beta1, beta2) of the best-consensus model refit on its inliers."""
    import numpy as np
    x = np.asarray(x, np.float64).reshape(-1)
    y = np.asarray(y, np.float64).reshape(-1)
    if mask is not None:
        keep = np.asarray(mask).reshape(-1) > 0
        x, y = x[keep], y[keep]
    n = len(x)
    if n < 2:
        return 0.0, 0.0
    rng = np.random.default_rng(seed)
    m = min_samples or max(int(np.sqrt(n)), 2)
    resid_scale = max(np.median(np.abs(y - np.median(y))), 1e-12)
    best_inl, best = -1, (0.0, 0.0)
    for _ in range(n_trials):
        idx = rng.choice(n, size=m, replace=False)
        A = np.vstack([x[idx], np.ones(m)]).T
        (b1, b2), *_ = np.linalg.lstsq(A, y[idx], rcond=None)
        resid = np.abs(y - (b1 * x + b2))
        inl = resid < resid_scale
        if inl.sum() > best_inl:
            A2 = np.vstack([x[inl], np.ones(int(inl.sum()))]).T
            best = tuple(np.linalg.lstsq(A2, y[inl], rcond=None)[0])
            best_inl = int(inl.sum())
    return float(best[0]), float(best[1])


def nonsat_weights(x, w):
    """Apply the reference's saturation filter (isp_algos.py:348-350):
    keep 1e-4 < x < 0.8 if that retains > 1% of the masked points, else
    keep the original mask."""
    nonsat = (x > 1e-4) & (x < 0.8)
    w2 = w * nonsat
    keep = jnp.sum(w2) > 0.01 * jnp.sum(w)
    return jnp.where(keep, w2, w)

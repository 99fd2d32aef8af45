"""Generalized Anscombe VST and its inverses (pure jnp, jit/grad-safe).

Math (reference utils/isp_algos.py:5-47): for a Poisson-Gaussian observation
x with shot gain K (e- -> DN) and read noise sigma (DN),

    VST(x) = (2/K) * sqrt(max(K*x + (3/8)*K^2 + sigma^2 - K*mu, 0))

approximately stabilizes the variance to 1. The inverse comes in two
flavours:
- asymptotic:      (z/2)^2 - 3/8 - (sigma/K)^2
- exact unbiased (closed-form approximation of Foi's exact inverse):
      (z/2)^2 + (1/4)sqrt(3/2) z^-1 - (11/8) z^-2
      + (5/8)sqrt(3/2) z^-3 - 1/8 - (sigma/K)^2,  with z<=0 -> 0.

Both clamp at 0 and rescale by K.
"""
from __future__ import annotations

import jax.numpy as jnp

_SQ32 = 1.2247448713915890  # sqrt(3/2)


def vst(x, sigma, mu=0.0, gain=1.0):
    """Forward generalized Anscombe transform (isp_algos.py:5-14)."""
    fz = gain * x + (3.0 / 8.0) * gain ** 2 + sigma ** 2 - gain * mu
    fz = jnp.maximum(fz, 0.0)
    return (2.0 / gain) * jnp.sqrt(fz)


def inverse_vst(z, sigma, gain=1.0, exact: bool = False):
    """Inverse VST (isp_algos.py:17-33). `exact` selects the closed-form
    exact-unbiased approximation; z<=0 maps to 0 on that path."""
    s = sigma / gain
    if exact:
        zs = jnp.where(z > 0, z, 1.0)  # avoid 0-division on masked lanes
        inv = 1.0 / zs
        fz = ((zs / 2.0) ** 2 + 0.25 * _SQ32 * inv - (11.0 / 8.0) * inv ** 2
              + (5.0 / 8.0) * _SQ32 * inv ** 3 - 1.0 / 8.0 - s ** 2)
        fz = jnp.where(z > 0, fz, 0.0)
    else:
        fz = (z / 2.0) ** 2 - 3.0 / 8.0 - s ** 2
    fz = jnp.maximum(fz, 0.0)
    return fz * gain

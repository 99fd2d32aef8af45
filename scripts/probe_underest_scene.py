"""Probe: find a content construction where the product's SELF noise
estimate genuinely UNDER-estimates (the rescue policy's designed regime,
pipeline/policy.py) so the held-out suite can carry a scene class where
iteration-1 demonstrably helps — the product analog of the reference's
+0.64 dB collab gain (logs/log_YOND_SIDD_simple+full_pre_grumix_iter.log).

Mechanism under test: black-clip truncation. At mean ~ 0 the Gaussian
read noise is half-clipped by the sensor floor (build_scene clips at 0 =
black level), so every flat window on dark content measures var ~= 0.36
sigma^2 instead of sigma^2, and a dark-dominated frame drags the fit's
intercept (and the MAD envelope) down. Round 0 then under-smooths the
un-clipped midtones; the collab re-estimate (masked on the DENOISED
image, where dark flats are still dark but the var-difference is
computed against the noisy frame's unclipped bright regions too) comes
back higher -> rescue fires -> it1 > it0.

Run (CPU): python scripts/probe_underest_scene.py
"""
import jax
jax.config.update("jax_platforms", "cpu")  # env ignores JAX_PLATFORMS

import numpy as np
import jax.numpy as jnp

from yondx.nle.robust import mad_self_estimate, combine_estimates
from yondx.isp import bayer2rggb


WP, BL = 1023, 64
SCALE = WP - BL


def synth_noisy(clean, K, sigma, rng):
    electrons = np.clip(clean, 0, 1) * SCALE / K
    noisy = (K * rng.poisson(electrons)
             + rng.normal(0, sigma, clean.shape)) / SCALE
    return np.clip(noisy, 0, 1).astype(np.float32)


def darkfield(rng, S=512, bright_frac=0.15, lev=0.45):
    """Near-black field with a few bright flat rectangles (the clipped
    night-scene construction: most flat windows ride the sensor floor)."""
    img = np.full((S, S), 0.004, np.float32)
    area = 0.0
    tries = 0
    while area < bright_frac and tries < 50:
        h, w = rng.integers(40, 120, 2)
        y, x = rng.integers(0, S - h), rng.integers(0, S - w)
        img[y:y + h, x:x + w] = lev * (0.6 + 0.8 * rng.random())
        area = float((img > 0.1).mean())
        tries += 1
    return img


def self_estimate(noisy_bayer):
    """The product's robust self NLE (fused-path ingredients)."""
    from yondx.pipeline.fused import make_fused_blind_denoiser  # noqa
    from yondx.nle.boxfilter import nle_moments
    from yondx.pipeline.fused import _nlf_core
    x = bayer2rggb(jnp.asarray(noisy_bayer)[None])
    k = 29
    inner = k // 3 * 2 + 1
    mean, var, tex = nle_moments(x, k, inner)
    fit = _nlf_core(var, mean, tex, 5)
    mad = mad_self_estimate(x)
    comb = combine_estimates(fit, mad, jnp.mean(jnp.clip(x, 0, 1)))
    return tuple(float(v) for v in fit), tuple(float(v) for v in mad), \
        tuple(float(v) for v in comb)


def main():
    rng = np.random.default_rng(7)
    for name, clean, K, sigma in [
        ("darkfield15", darkfield(np.random.default_rng(1), bright_frac=.15),
         3.0, 14.0),
        ("darkfield08", darkfield(np.random.default_rng(2), bright_frac=.08),
         3.0, 14.0),
        ("darkfield30", darkfield(np.random.default_rng(3), bright_frac=.30),
         3.0, 14.0),
        ("darkfield_hiK", darkfield(np.random.default_rng(4),
                                    bright_frac=.12), 16.0, 10.0),
    ]:
        noisy = synth_noisy(clean, K, sigma, rng)
        fit, mad, comb = self_estimate(noisy)
        b1t, b2t = K / SCALE, (sigma / SCALE) ** 2
        mu = float(np.mean(np.clip(noisy, 0, 1)))
        v_true = b1t * mu + b2t
        v_est = comb[0] * mu + comb[1]
        print(f"{name:14s} K={K:5.1f} sg={sigma:5.1f} "
              f"true(b1,b2)=({b1t:.2e},{b2t:.2e}) "
              f"fit=({fit[0]:.2e},{fit[1]:.2e}) "
              f"mad=({mad[0]:.2e},{mad[1]:.2e}) "
              f"comb=({comb[0]:.2e},{comb[1]:.2e}) "
              f"v_est/v_true={v_est / v_true:.3f}")


if __name__ == "__main__":
    main()

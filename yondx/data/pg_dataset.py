"""Poisson-Gaussian training transform for the noise-estimation nets.

Device-resident rebuild of DIV2K_PG_Dataset (yond_datasets.py:661-764):
unprocess -> mosaic -> CFA rotation -> Poisson-Gaussian corruption with
per-sample (K, sigma) sampled from the IMX686-style log-regression prior
(:664-682), and optionally (command 'est') the feature/target stacks the
EstUnet consumes: [lr_std, lr_blur, lr] features with target
sqrt(beta1 * blur(hr) + beta2) and a flat-region mask from the score2
threshold on the clean std map (:721-751).
"""
from __future__ import annotations

from typing import Dict, Tuple


import jax
import jax.numpy as jnp

from ..nle.boxfilter import box_mean, stdfilt
from ..nle.threshold import adaptive_threshold_score2
from .unprocess import srgb_to_pseudo_raw

# PG prior (yond_datasets.py:664-669) — wider K range than the calibrated
# IMX686 regression for generality.
PG_PRIOR = {
    "Kmin": -2.5, "Kmax": 3.5, "q": 1 / (2 ** 10), "wp": 1023, "bl": 64,
    "sigGsk": 0.85187, "sigGsb": 0.67991, "sigGssig": 0.02921,
}


def sample_pg_prior(key):
    """-> (beta1, beta2) per-call scalars in normalized units."""
    p = PG_PRIOR
    k1, k2, k3, k4 = jax.random.split(key, 4)
    log_K = jax.random.uniform(k1, minval=p["Kmin"], maxval=p["Kmax"])
    slope = p["sigGsk"] + jax.random.uniform(k2, minval=-0.2, maxval=0.2)
    inter = p["sigGsb"] + jax.random.uniform(k3, minval=-1.0, maxval=1.0)
    mu = slope * log_K + inter
    log_sig = mu + jax.random.normal(k4) * p["sigGssig"]
    K = jnp.exp(log_K)
    sigma = jnp.exp(log_sig)
    scale = p["wp"] - p["bl"]
    return K / scale, (sigma / scale) ** 2


def pg_training_batch(key, imgs) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """sRGB [B,H,W,3] -> (noisy rggb, clean rggb, params dict). One (K,
    sigma) per sample."""
    k_un, k_p, k_n1, k_n2 = jax.random.split(key, 4)
    hr, wb, ccm, pattern = srgb_to_pseudo_raw(k_un, imgs)
    B = hr.shape[0]
    b1, b2 = jax.vmap(sample_pg_prior)(jax.random.split(k_p, B))
    bshape = (B,) + (1,) * (hr.ndim - 1)
    b1r = b1.reshape(bshape)
    b2r = b2.reshape(bshape)
    shot = jax.random.poisson(k_n1, jnp.maximum(hr, 0.0) / b1r) * b1r
    lr = shot + jax.random.normal(k_n2, hr.shape) * jnp.sqrt(b2r)
    return lr, hr, {"beta1": b1, "beta2": b2, "pattern": pattern, "wb": wb}


def pg_est_features(lr, hr, beta1, beta2, k: int = 19) -> Dict[str, jnp.ndarray]:
    """EstUnet feature/target stacks (yond_datasets.py:721-751), batched.

    lr/hr: [B, h, w, 4]; beta1/beta2: [B]. Returns features
    [B,h,w,12] = [lr_std | lr_blur | lr], target [B,h,w,4] =
    sqrt(beta1*hr_blur + beta2), flat mask [B,h,w,4] from the score2
    threshold on the clean std map.
    """
    lr_blur = box_mean(lr, k)
    hr_blur = box_mean(hr, k)
    lr_std = stdfilt(lr, k)
    hr_std = stdfilt(hr, k)
    bshape = (lr.shape[0],) + (1,) * (lr.ndim - 1)
    target = jnp.sqrt(jnp.maximum(
        beta1.reshape(bshape) * hr_blur + beta2.reshape(bshape), 0.0))

    def one_mask(hs):
        th, _ = adaptive_threshold_score2(hs)
        m = (hs <= th).astype(jnp.float32)
        return jnp.where(jnp.sum(m) == 0, jnp.ones_like(m), m)

    mask = jax.vmap(one_mask)(hr_std)
    feats = jnp.concatenate([lr_std, lr_blur, lr], axis=-1)
    return {"features": feats, "target": target, "mask": mask,
            "lr_std": lr_std, "hr_std": hr_std, "lr_blur": lr_blur,
            "hr_blur": hr_blur}

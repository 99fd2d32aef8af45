"""Physics-based noise synthesis (jax.random) + calibrated camera tables.

Rebuild of data_process/process.py's noise engine:
- `get_camera_noisy_params` (:215-255) / `get_specific_noise_params`
  (:257-348): calibrated regression and per-ISO tables, stored as data in
  calibrations.json (NikonD850, IMX686, SonyA7S2 low/high + 28 ISOs, CRVD);
- `sample_params` (:394-452): log-uniform K in [Kmin, Kmax], log-linear
  sigTL/sigR/sigGs regressions with Gaussian scatter, exposure ratio;
- `generate_noisy` (:631-713): noise_code characters select components —
  p: Poisson shot, g: Tukey-lambda read, (else Gaussian read), r: row noise,
  q: quantization uniform, d: per-channel bias, b: black frame;
- `awgn_log_uniform`: the AWGN training corruption, sigma = exp(U(ln
  sigma_min, ln sigma_max))/255 (yond_datasets.py:317-324).

Tukey-lambda sampling uses the quantile transform
Q(u; lam) = (u^lam - (1-u)^lam)/lam (lam != 0), logit at lam == 0 — exact
and jit-safe (scipy's rvs is host-only).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

with open(os.path.join(os.path.dirname(__file__), "calibrations.json")) as f:
    CAMERA_NOISE_PARAMS: Dict[str, Any] = json.load(f)

DUAL_ISO_CAMERAS = ("SonyA7S2",)


def get_camera_noisy_params(camera_type: str) -> Dict[str, float]:
    reg = CAMERA_NOISE_PARAMS["regression"]
    if camera_type in reg:
        return reg[camera_type]
    return reg["NikonD850"]


def get_specific_noise_params(camera_type: str, iso) -> Optional[dict]:
    tab = CAMERA_NOISE_PARAMS["per_iso"].get(camera_type, {})
    return tab.get(str(iso))


def sample_params(camera_type: str = "NikonD850", ln_ratio: bool = False,
                  rng: Optional[np.random.Generator] = None) -> dict:
    """Host-side noise-parameter sampler (process.py:394-452)."""
    rng = rng or np.random.default_rng()
    if camera_type in DUAL_ISO_CAMERAS:
        camera_type += "_lowISO" if rng.integers(2) < 1 else "_highISO"
    p = get_camera_noisy_params(camera_type)
    q, wp, bl, lam = p["q"], p["wp"], p["bl"], p["lam"]
    log_K = rng.uniform(p["Kmin"], p["Kmax"])
    K = float(np.exp(log_K))
    mu_TL = p["sigTLk"] * log_K + p["sigTLb"] if "sigTLk" in p else q
    mu_R = p["sigRk"] * log_K + p["sigRb"] if "sigRk" in p else q
    mu_Gs = p["sigGsk"] * log_K + p["sigGsb"] if "sigGsk" in p else q
    sigTL = float(np.exp(rng.normal(mu_TL, p.get("sigTLsig", 0.0))))
    sigR = float(np.exp(rng.normal(mu_R, p.get("sigRsig", 0.0))))
    sigGs = float(np.exp(rng.normal(mu_Gs, p.get("sigGssig", 0.0))))
    if "uReadk" in p:
        mu_b = p["uReadk"] * log_K + p["uReadb"]
        bias = float(np.exp(rng.normal(mu_b, p["uReadsig"])))
    else:
        bias = 0.0
    if ln_ratio:
        high = 1.0 if "CRVD" in camera_type else 5.0
        ratio = float(np.exp(rng.uniform(-0.01, high)))
    else:
        ratio = float(rng.uniform(100, 300))
    return {"K": K, "sigTL": sigTL, "sigR": sigR, "sigGs": sigGs,
            "bias": bias, "lam": lam, "q": q, "ratio": ratio,
            "wp": wp, "bl": bl}


def sample_params_max(camera_type: str = "NikonD850",
                      ratio: Optional[float] = None, iso=None,
                      rng: Optional[np.random.Generator] = None) -> dict:
    """Max-ISO noise-parameter sampler (process.py:351-391): K at Kmax with
    1% jitter, sigmas from the regression at log Kmax (or the per-ISO point
    calibration when `iso` is given), exposure ratio U(100,300) for Sony /
    exp-U(0,2.08) otherwise."""
    rng = rng or np.random.default_rng()
    params = get_specific_noise_params(camera_type, iso) \
        if iso is not None else None
    if params is None:
        cam = camera_type
        if cam in DUAL_ISO_CAMERAS:
            cam += "_lowISO" if rng.integers(2) < 1 else "_highISO"
        p = get_camera_noisy_params(cam)
        log_K = p["Kmax"] + rng.uniform(-0.01, 0.01)
        K = float(np.exp(log_K))
        sigTL = float(np.exp(p["sigTLk"] * log_K + p["sigTLb"]))
        sigR = float(np.exp(p["sigRk"] * log_K + p["sigRb"]))
        mu_Gs = p["sigGsk"] * log_K + p["sigGsb"] if "sigGsk" in p \
            else 2 ** -14
        sigGs = float(np.exp(rng.normal(mu_Gs, p.get("sigGssig", 0.0))))
        bias = 0.0
    else:
        p = params
        K = float(p["Kmax"] * (1 + rng.uniform(-0.01, 0.01)))
        sigGs = float(rng.normal(p["sigGs"], p.get("sigGssig", 0.0)))
        sigTL = float(rng.normal(p["sigTL"], p.get("sigTLsig", 0.0)))
        sigR = float(rng.normal(p["sigR"], p.get("sigRsig", 0.0)))
        bias = p.get("bias", 0.0)
    if ratio is None:
        if "SonyA7S2" in camera_type:
            ratio = float(rng.uniform(100, 300))
        else:
            ratio = float(np.exp(rng.uniform(0, 2.08)))
    return {"K": K, "sigTL": sigTL, "sigR": sigR, "sigGs": sigGs,
            "bias": bias, "lam": p["lam"], "q": p["q"], "ratio": ratio,
            "wp": p["wp"], "bl": p["bl"]}


def brooks_noise_levels(key):
    """Brooks et al. log-log shot/read sampler (reference
    random_noise_levels, unprocess.py:218-229; unused by YOND training but
    part of the surface)."""
    k1, k2 = jax.random.split(key)
    log_shot = jax.random.uniform(k1, minval=np.log(1e-4),
                                  maxval=np.log(0.012))
    shot = jnp.exp(log_shot)
    log_read = 2.18 * log_shot + 1.20 + 0.26 * jax.random.normal(k2)
    return shot, jnp.exp(log_read)


def brooks_add_noise(key, image, shot_noise=0.01, read_noise=0.0005):
    """var = shot*I + read Gaussian corruption (unprocess.py:232-240)."""
    var = image * shot_noise + read_noise
    return image + jax.random.normal(key, image.shape) * jnp.sqrt(var)


def _tukeylambda(key, lam, shape):
    u = jax.random.uniform(key, shape, minval=1e-7, maxval=1 - 1e-7)
    lam = jnp.float32(lam)
    small = jnp.abs(lam) < 1e-6
    safe = jnp.where(small, 1.0, lam)
    q = (u ** safe - (1.0 - u) ** safe) / safe
    return jnp.where(small, jnp.log(u / (1.0 - u)), q)


def generate_noisy(key, y, param: dict, noise_code: str = "p",
                   ori: bool = False, clip: bool = False):
    """Device noise synthesis on a clean normalized frame y [..., h, w, c]
    (RGGB planes, channel-last) — reference generate_noisy_obs/_torch
    (process.py:631-713). noise_code is static."""
    p = param
    code = noise_code.lower()
    scale = p["wp"] - p["bl"]
    ye = y * scale / p["ratio"]
    ks = jax.random.split(key, 5)
    if "p" in code:
        shot = jax.random.poisson(ks[0], ye / p["K"]).astype(jnp.float32) \
            * p["K"]
    else:
        shot = ye + jax.random.normal(ks[0], ye.shape) * jnp.sqrt(
            jnp.maximum(ye / p["K"], 1e-10)) * p["K"]
    if "b" in code:
        read = row = qn = bias = 0.0
    else:
        if "g" in code:
            read = _tukeylambda(ks[1], p["lam"], ye.shape) * p["sigTL"]
        else:
            read = jax.random.normal(ks[1], ye.shape) * p["sigGs"]
        # row noise varies along H (axis -3 of [..., h, w, c])
        row_shape = ye.shape[:-2] + (1, 1)
        row = (jax.random.normal(ks[2], row_shape) * p["sigR"]
               if "r" in code else 0.0)
        qn = (jax.random.uniform(ks[3], ye.shape, minval=-0.5, maxval=0.5)
              if "q" in code else 0.0)
        if "d" in code:
            b = jnp.asarray(np.reshape(np.atleast_1d(p["bias"]), (1, 1, -1)),
                            jnp.float32)
            bias = b
        else:
            bias = 0.0
    z = (shot + read + row + qn + bias) / scale
    z = jnp.clip(z, 0.0, 1.0) if clip else jnp.clip(z, -p["bl"] / p["wp"], 1.0)
    if not ori:
        z = z * p["ratio"]
    return z


def awgn_log_uniform(key, clean, sigma_min: float = 5.0,
                     sigma_max: float = 50.0):
    """Per-sample AWGN with log-uniform sigma in [smin, smax]/255
    (yond_datasets.py:317-324). clean: [B, ...]. Returns (noisy, sigma[B])."""
    B = clean.shape[0]
    k1, k2 = jax.random.split(key)
    lo, hi = np.log(sigma_min), np.log(sigma_max)
    sigma = jnp.exp(jax.random.uniform(k1, (B,), minval=lo, maxval=hi)) / 255.0
    bshape = (B,) + (1,) * (clean.ndim - 1)
    noisy = clean + jax.random.normal(k2, clean.shape) * sigma.reshape(bshape)
    return noisy, sigma


def awgn_log_uniform_lowmix(key, clean, sigma_min: float = 1.0,
                            sigma_max: float = 50.0, p_low: float = 0.5,
                            low_max: float = 8.0):
    """Log-uniform AWGN with EMPHASIS on the low band: with prob p_low
    the per-sample sigma is drawn log-uniform in [smin, low_max] instead
    of [smin, smax]. Plain log-uniform over [1, 50] puts only ~18% of
    draws under sigma 2 — too thin to teach near-identity behavior on
    fine structure (the glyph do-no-harm knife edge; 'low_sigma' command).
    Returns (noisy, sigma[B])."""
    B = clean.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    lo = np.log(sigma_min)
    u = jax.random.uniform(k1, (B,))
    hi = jnp.where(jax.random.uniform(k3, (B,)) < p_low,
                   np.log(low_max), np.log(sigma_max))
    sigma = jnp.exp(lo + u * (hi - lo)) / 255.0
    bshape = (B,) + (1,) * (clean.ndim - 1)
    noisy = clean + jax.random.normal(k2, clean.shape) * sigma.reshape(bshape)
    return noisy, sigma


def awgn_uniform(key, clean, sigma_min: float = 5.0,
                 sigma_max: float = 50.0):
    """Per-sample AWGN with UNIFORM sigma in [smin, smax]/255 — the plain
    sRGB RGB_Img_Dataset's sampler (yond_datasets.py:418-421; the log-
    uniform line there is commented out). Returns (noisy, sigma[B])."""
    B = clean.shape[0]
    k1, k2 = jax.random.split(key)
    sigma = jax.random.uniform(k1, (B,), minval=sigma_min,
                               maxval=sigma_max) / 255.0
    bshape = (B,) + (1,) * (clean.ndim - 1)
    noisy = clean + jax.random.normal(k2, clean.shape) * sigma.reshape(bshape)
    return noisy, sigma


def sample_pg_params(key, k_range=(1e-3, 1e-1), sig_read_range=(1e-4, 1e-2)):
    """Log-uniform Poisson-Gaussian parameter sampler in normalized units
    (DIV2K_PG_Dataset.get_noise_params, yond_datasets.py:672-682 style)."""
    k1, k2 = jax.random.split(key)
    K = jnp.exp(jax.random.uniform(
        k1, minval=np.log(k_range[0]), maxval=np.log(k_range[1])))
    sig = jnp.exp(jax.random.uniform(
        k2, minval=np.log(sig_read_range[0]), maxval=np.log(sig_read_range[1])))
    return K, sig


def add_pg_noise(key, clean, K, sig_read):
    """Poisson-Gaussian corruption in normalized units: var = K*y + sig^2."""
    k1, k2 = jax.random.split(key)
    shot = jax.random.poisson(k1, jnp.maximum(clean, 0.0) / K) * K
    return shot + jax.random.normal(k2, clean.shape) * sig_read

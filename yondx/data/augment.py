"""Poisson-consistent brightness/WB augmentation (SNA) + high-bit recovery
+ illuminance correction.

Rebuild of the remaining data_process components:
- `get_aug_param` (process.py:455-485): per-channel gain offsets sampled
  from the camera WB prior ('augv5') or around identity ('augv2'),
  renormalized so the minimum gain is 0;
- `sna` (SNA_torch, process.py:602-628): shot-noise-aware augmentation —
  brightness added to the GT is matched with extra Poisson noise on the
  noisy frame so the physical noise model stays consistent. The reference's
  BiSNA (negative-gain) branch raises NotImplementedError (:516,:574) and
  is likewise unsupported here;
- `HighBitRecovery` (process.py:715-791): maps quantized low-bit read-noise
  values back to continuous values by inverting the per-code CDF;
- `illuminance_correct` (data_process/__init__.py:140-171): least-squares
  scalar brightness alignment on non-saturated pixels (ELD eval).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .noise import (get_specific_noise_params, get_camera_noisy_params)
from .unprocess import random_gains


def data_aug8(imgs, modes):
    """Device 8-way rot/flip augmentation of square crops (reference
    Dataset.data_aug, yond_datasets.py:258-266): mode%4 = rot90 count,
    mode//4 = width flip. imgs [B, S, S, C], modes [B] int. (Note the
    reference's RGB_Img_Dataset discards the aug result at :395 — a bug;
    here the augmentation is actually applied.)"""
    def one(img, mode):
        img = jax.lax.switch(mode % 4, [
            lambda x: x,
            lambda x: jnp.rot90(x, 1, axes=(0, 1)),
            lambda x: jnp.rot90(x, 2, axes=(0, 1)),
            lambda x: jnp.rot90(x, 3, axes=(0, 1)),
        ], img)
        return jnp.where(mode // 4 > 0, img[:, ::-1], img)

    return jax.vmap(one)(imgs, modes)


def get_aug_param(key, wb, command: str = "augv5",
                  camera_type: str = "SonyA7S2"):
    """-> (aug_r, aug_g, aug_b) per-sample scalars; wb: [B, 3]."""
    b = wb.shape[0]
    ks = jax.random.split(key, 6)
    r = jax.random.randint(ks[0], (), 0, 2).astype(jnp.float32) * 0.25 + 0.25
    apply = jax.random.randint(ks[1], (), 0, 4) > 0
    if "augv5" in command:
        rgb_gain, red_gain, blue_gain = random_gains(ks[2])
        rgb_gain = 1.0 / rgb_gain
        rg = wb[:, 0] / red_gain
        bg = wb[:, 2] / blue_gain
        aug_g = jax.random.uniform(ks[3], (b,)) * r + rgb_gain - 0.9
        aug_r = jax.random.uniform(ks[4], (b,)) * r + rg * (1 + aug_g) - 1.1
        aug_b = jax.random.uniform(ks[5], (b,)) * r + bg * (1 + aug_g) - 1.1
    else:  # augv2
        u = r
        aug_g = jnp.clip(jax.random.normal(ks[3], (b,)) * r, 0, 4 * u)
        aug_r = jnp.clip((1 + jax.random.normal(ks[4], (b,)) * r)
                         * (1 + aug_g) - 1, 0, 4 * u)
        aug_b = jnp.clip((1 + jax.random.normal(ks[5], (b,)) * r)
                         * (1 + aug_g) - 1, 0, 4 * u)
    aug_r = jnp.where(apply, aug_r, 0.0)
    aug_g = jnp.where(apply, aug_g, 0.0)
    aug_b = jnp.where(apply, aug_b, 0.0)
    # renormalize so min gain offset is 0 (non-negative dy)
    daug = jnp.minimum(jnp.minimum(aug_r, aug_g), aug_b)
    daug = jnp.minimum(daug, 0.0)
    aug_r = (1 + aug_r) / (1 + daug) - 1
    aug_g = (1 + aug_g) / (1 + daug) - 1
    aug_b = (1 + aug_b) / (1 + daug) - 1
    return aug_r, aug_g, aug_b


def sna(key, gt, aug_wb, K: float, wp: int, bl: int, ratio: float = 1.0,
        black_lr: bool = False, ori: bool = True):
    """Shot-noise-aware augmentation (SNA_torch, process.py:602-628).

    gt: [h, w, 4] RGGB planes in [0,1]; aug_wb: [4] per-channel gain
    offsets (>= 0). Returns (dn, dy): noise increment for the noisy frame
    and signal increment for the GT, both normalized.
    """
    scale = wp - bl
    gte = gt * scale / ratio
    dy = gte * jnp.reshape(aug_wb, (1, 1, -1))
    dn = jax.random.poisson(key, jnp.maximum(dy, 0.0) / K).astype(
        jnp.float32) * K
    if black_lr:
        dy = dy - gte
    dy = dy * ratio / scale
    dn = dn / scale
    if not ori:
        dn = dn * ratio
    return dn, dy


def illuminance_correct(predict, source):
    """Scalar brightness alignment: argmin_s ||s*pred - src|| over
    non-saturated pixels (data_process/__init__.py:158-171). Shapes
    [..., H, W, C]; batched over leading dims."""
    pred = jnp.clip(predict, 0.0, 1.0)
    mask = (source != 1).astype(pred.dtype)
    axes = tuple(range(pred.ndim - 3, pred.ndim)) if pred.ndim >= 3 \
        else tuple(range(pred.ndim))
    num = jnp.sum(pred * source * mask, axis=axes, keepdims=True)
    den = jnp.sum(pred * pred * mask, axis=axes, keepdims=True)
    return num / jnp.maximum(den, 1e-12) * pred


class HighBitRecovery:
    """Quantized-read-noise de-quantization LUT (process.py:715-791).

    For each integer code x in [-6 sigma, 6 sigma], maps occurrences back
    to continuous values by sampling the read-noise distribution's inverse
    CDF within the code's quantization bin. Host-side (scipy dists), used
    by low-bit training data pipelines.
    """

    def __init__(self, camera_type: str = "IMX686", noise_code: str = "prq",
                 perturb: bool = True, factor: int = 6,
                 use_float: bool = True):
        self.camera_type = camera_type
        self.noise_code = noise_code
        self.perturb = perturb
        self.factor = factor
        self.use_float = use_float
        self.lut = {}

    def _params(self, iso):
        p = get_specific_noise_params(self.camera_type, iso)
        if p is None:
            p = dict(get_camera_noisy_params(self.camera_type))
            p["Kmax"] = np.exp(p["Kmax"])
        p = dict(p)
        p.setdefault("K", p["Kmax"])
        return p

    def get_lut(self, iso_list, blc_mean=None,
                rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        for iso in iso_list:
            bias = 0.0 if blc_mean is None else float(np.mean(blc_mean[iso]))
            if self.perturb:
                bias += rng.standard_normal() * 0.1
            self.lut[iso] = self._build(iso, bias)

    def _build(self, iso, bias):
        from scipy import stats
        p = self._params(iso)
        if "g" in self.noise_code.lower():
            dist = stats.tukeylambda(p["lam"], loc=bias, scale=p["sigTL"])
            sigma = p["sigTL"]
        else:
            dist = stats.norm(loc=bias, scale=p["sigGs"])
            sigma = p["sigGs"]
        low = max(int(-sigma * self.factor + bias), -int(p["bl"]) + 1)
        high = int(sigma * self.factor + bias)
        info = {"param": p, "dist": dist, "low": low, "high": high,
                "bias": bias, "sigma": sigma}
        for x in range(low, high):
            info[x] = {"cdf": dist.cdf(x - 0.5),
                       "range": dist.cdf(x + 0.5) - dist.cdf(x - 0.5)}
        return info

    def map(self, data: np.ndarray, iso=6400, norm: bool = True,
            rng: Optional[np.random.Generator] = None) -> np.ndarray:
        rng = rng or np.random.default_rng()
        info = self.lut[iso]
        p = info["param"]
        scale = p["wp"] - p["bl"]
        data = np.asarray(data, np.float64)
        if data.max() <= 1:
            data = data * scale
        data_float = data.copy()
        data = np.round(data_float)
        delta = data_float - data if self.use_float else 0.0
        rand = rng.uniform(0, 1, size=data.shape)
        for x in range(info["low"], info["high"]):
            keys = data == x
            if not keys.any():
                continue
            c, r = info[x]["cdf"], info[x]["range"]
            data[keys] = info["dist"].ppf(c + rand[keys] * r)
        if self.use_float:
            data = data + delta
        return (data / scale if norm else data + p["bl"]).astype(np.float32)

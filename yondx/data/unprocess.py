"""Device-resident sRGB -> pseudo-raw "unprocessing" (jax.random).

Rebuild of data_process/unprocess.py (Brooks et al. unprocessing):
- random_ccm (:7-47): convex combination of 4 xyz2cam matrices (weights
  U(1e-8, 1e8)) times rgb2xyz, row-normalized;
- random_gains (:50-59): rgb_gain ~ 1/N(0.8, 0.1) (10%: 0.2/N),
  red ~ U(1.4, 2.5), blue ~ U(1.5, 2.4);
- inverse_smoothstep (:80-86), gamma_expansion (:89-95), apply_ccm
  (:98-104), safe_invert_gains (:107-122) with the highlight mask;
- mosaic (:124-145): RGGB plane extraction.

Everything is per-sample vmapped and jit-safe; one PRNG key per sample.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np

# 4 candidate XYZ->Camera CCMs (unprocess.py:10-21)
XYZ2CAMS = np.array([
    [[1.0234, -0.2969, -0.2266],
     [-0.5625, 1.6328, -0.0469],
     [-0.0703, 0.2188, 0.6406]],
    [[0.4913, -0.0541, -0.0202],
     [-0.613, 1.3513, 0.2906],
     [-0.1564, 0.2151, 0.7183]],
    [[0.838, -0.263, -0.0639],
     [-0.2887, 1.0725, 0.2496],
     [-0.0627, 0.1427, 0.5438]],
    [[0.6596, -0.2079, -0.0562],
     [-0.4782, 1.3016, 0.1933],
     [-0.097, 0.1581, 0.5181]],
], np.float32)

RGB2XYZ = np.array([
    [0.4124564, 0.3575761, 0.1804375],
    [0.2126729, 0.7151522, 0.0721750],
    [0.0193339, 0.1191920, 0.9503041],
], np.float32)


def random_ccm(key):
    """-> (rgb2cam [3,3], cam2rgb [3,3])."""
    w = jax.random.uniform(key, (4, 1, 1), minval=1e-8, maxval=1e8)
    xyz2cam = jnp.sum(jnp.asarray(XYZ2CAMS) * w, axis=0) / jnp.sum(w)
    rgb2cam = xyz2cam @ jnp.asarray(RGB2XYZ)
    rgb2cam = rgb2cam / jnp.sum(rgb2cam, axis=-1, keepdims=True)
    return rgb2cam, jnp.linalg.inv(rgb2cam)


def random_gains(key):
    """-> (rgb_gain, red_gain, blue_gain) scalars."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = 0.8 + 0.1 * jax.random.normal(k1)
    dark = jax.random.uniform(k2) >= 0.9
    rgb_gain = jnp.where(dark, 0.2 / n, 1.0 / n)
    red = jax.random.uniform(k3, minval=1.4, maxval=2.5)
    blue = jax.random.uniform(k4, minval=1.5, maxval=2.4)
    return rgb_gain, red, blue


def inverse_smoothstep(x):
    x = jnp.clip(x, 0.0, 1.0)
    return 0.5 - jnp.sin(jnp.arcsin(1.0 - 2.0 * x) / 3.0)


def gamma_expansion(x):
    return jnp.clip(x, 1e-8, None) ** 2.2


def apply_ccm(img, ccm):
    """img [..., 3] x ccm [3,3] (contraction over the last img dim)."""
    return jnp.einsum("...c,dc->...d", img, ccm)


def safe_invert_gains(img, rgb_gain, red, blue):
    gains = jnp.stack([1.0 / red, jnp.float32(1.0), 1.0 / blue]) / rgb_gain
    gray = jnp.mean(img, axis=-1, keepdims=True)
    inflection = 0.9
    mask = (jnp.clip(gray - inflection, 0.0, None) / (1.0 - inflection)) ** 2
    safe_gains = jnp.maximum(mask + (1.0 - mask) * gains, gains)
    return img * safe_gains


def mosaic(img):
    """[H, W, 3] RGB -> [H/2, W/2, 4] RGGB planes (unprocess.py:124-145)."""
    r = img[0::2, 0::2, 0]
    gr = img[0::2, 1::2, 1]
    gb = img[1::2, 0::2, 1]
    b = img[1::2, 1::2, 2]
    return jnp.stack([r, gr, gb, b], axis=-1)


def _unprocess_one(key, img):
    """One sRGB [H,W,3] float -> (raw rggb [H/2,W/2,4], wb, cam2rgb)."""
    k_ccm, k_gain = jax.random.split(key)
    rgb2cam, cam2rgb = random_ccm(k_ccm)
    rgb_gain, red, blue = random_gains(k_gain)
    x = inverse_smoothstep(img)
    x = gamma_expansion(x)
    x = apply_ccm(x, rgb2cam)
    x = safe_invert_gains(x, rgb_gain, red, blue)
    x = jnp.clip(x, 0.0, 1.0)
    raw = mosaic(x)
    wb = jnp.stack([red, jnp.float32(1.0), blue])
    return raw, wb, cam2rgb


def unprocess_batch(key, imgs):
    """Batched unprocess: imgs [B,H,W,3] float in [0,1] -> (raw [B,h,w,4],
    wb [B,3], cam2rgb [B,3,3]). One independent random camera per sample."""
    keys = jax.random.split(key, imgs.shape[0])
    return jax.vmap(_unprocess_one)(keys, imgs)


def _rot_bayer_rggb(rggb, k):
    """bayer_aug with traced k (0..3): rot90 of the underlying mosaic."""
    from ..isp import bayer_aug
    return jax.lax.switch(k, [lambda z: bayer_aug(z, i) for i in range(4)],
                          rggb)


def srgb_to_pseudo_raw(key, imgs, bayer_aug_enabled: bool = True):
    """Full training-data transform (RGB_Img2Raw_Dataset.__getitem__,
    yond_datasets.py:277-333, minus the noise): unprocess + random CFA phase
    rotation. Returns (clean_rggb [B,h,w,4], wb, cam2rgb, pattern [B])."""
    k_un, k_pat = jax.random.split(key)
    raw, wb, cam2rgb = unprocess_batch(k_un, imgs)
    if bayer_aug_enabled:
        pattern = jax.random.randint(k_pat, (imgs.shape[0],), 0, 4)
        raw = jax.vmap(_rot_bayer_rggb)(raw, pattern)
    else:
        pattern = jnp.zeros((imgs.shape[0],), jnp.int32)
    return raw, wb, cam2rgb, pattern

"""Bayer <-> packed-plane transforms and CFA normalization.

Semantics match the reference exactly (verified by round-trip and
golden-value tests):
- bayer2rggb / rggb2bayer: reshape-style 2x2 block packing, RGGB channel
  order = [x[0::2,0::2], x[0::2,1::2], x[1::2,0::2], x[1::2,1::2]]
  (reference utils/isp_ops.py:57-71).
- bayer_aug(rggb, k): rot90 in the *bayer* domain, used to synthesize the
  four CFA phases during training (reference yond_datasets.py:15-19).
- rot_bayer(image, pattern): rot90 by a pattern-dependent k so any CFA
  becomes RGGB, reversible (reference utils/sidd_utils.py:198-213).
- flip_bayer: flip-based CFA normalization to BGGR conventions
  (reference utils/sidd_utils.py:182-196).

All functions accept arbitrary leading batch dims; the bayer plane is the
trailing [H, W] (or [..., H, W]) and packed planes are [..., H/2, W/2, 4].
They are jnp-generic: passing numpy arrays works too (operations used are
reshape/transpose/rot90/flip, available in both).
"""
from __future__ import annotations

import jax.numpy as jnp


def bayer2rggb(bayer):
    """[..., H, W] -> [..., H/2, W/2, 4] 2x2-block packing."""
    xp = jnp
    shp = bayer.shape
    H, W = shp[-2], shp[-1]
    x = bayer.reshape(shp[:-2] + (H // 2, 2, W // 2, 2))
    x = xp.moveaxis(x, -3, -2)  # [..., H/2, W/2, 2, 2]
    return x.reshape(shp[:-2] + (H // 2, W // 2, 4))


def rggb2bayer(rggb):
    """[..., H/2, W/2, 4] -> [..., H, W] inverse of bayer2rggb."""
    xp = jnp
    shp = rggb.shape
    h, w = shp[-3], shp[-2]
    x = rggb.reshape(shp[:-3] + (h, w, 2, 2))
    x = xp.moveaxis(x, -2, -3)  # [..., h, 2, w, 2]
    return x.reshape(shp[:-3] + (h * 2, w * 2))


def bayer_aug(rggb, k: int = 0):
    """Rotate the underlying bayer mosaic by 90*k degrees (CFA phase aug).

    Matches reference `bayer_aug` (yond_datasets.py:15-19):
    rggb -> bayer -> rot90(k, axes=(-2,-1)) -> rggb. k is static.
    """
    if k % 4 == 0:
        return rggb
    bayer = rggb2bayer(rggb)
    bayer = jnp.rot90(bayer, k=k % 4, axes=(-2, -1))
    return bayer2rggb(bayer)


# SIDD bayer_2by2 patterns (1=R, 2=G, 3=B), reference sidd_utils.py:199-210.
_PATTERN_TO_K = {
    ((1, 2), (2, 3)): 0,  # RGGB
    ((2, 1), (3, 2)): 3,  # GRBG
    ((2, 3), (1, 2)): 1,  # GBRG
    ((3, 2), (2, 1)): 2,  # BGGR
}


def rot_bayer_k(bayer_2by2) -> int:
    """Pattern -> rot90 count that maps the CFA to RGGB."""
    key = tuple(tuple(int(v) for v in row) for row in bayer_2by2)
    if key not in _PATTERN_TO_K:
        raise ValueError(f"Unknown Bayer pattern: {bayer_2by2}")
    return _PATTERN_TO_K[key]


def rot_bayer(image, bayer_2by2, rev: bool = False, axes=(-2, -1)):
    """Rotate a bayer-domain image so its CFA reads RGGB (reference
    utils/sidd_utils.py:198-213); `rev=True` undoes it."""
    k = rot_bayer_k(bayer_2by2)
    if rev:
        k = (4 - k) % 4
    if k == 0:
        return image
    return jnp.rot90(image, k=k, axes=axes)


def flip_bayer(image, bayer_2by2):
    """Flip-based CFA normalization to RGGB (reference sidd_utils.py:182-196;
    used by the SIDD sRGB render)."""
    key = tuple(tuple(int(v) for v in row) for row in bayer_2by2)
    if key == ((1, 2), (2, 3)):
        return image
    if key == ((2, 1), (3, 2)):
        return jnp.flip(image, axis=-1)
    if key == ((2, 3), (1, 2)):
        return jnp.flip(image, axis=-2)
    if key == ((3, 2), (2, 1)):
        return jnp.flip(jnp.flip(image, axis=-1), axis=-2)
    raise ValueError(f"Unknown Bayer pattern: {bayer_2by2}")


def bayer2rows(bayer):
    """[..., H, W] -> [..., 2, H/2, W] even/odd row split (reference
    isp_ops.py:73-76), used by row-noise removal."""
    return jnp.stack((bayer[..., 0::2, :], bayer[..., 1::2, :]), axis=-3)


def rows2bayer(rows):
    """Inverse of bayer2rows (reference isp_ops.py:84-89)."""
    shp = rows.shape
    H2, W = shp[-2], shp[-1]
    out = jnp.stack((rows[..., 0, :, :], rows[..., 1, :, :]), axis=-2)
    return out.reshape(shp[:-3] + (H2 * 2, W))


def bayer2gray(bayer):
    """Bilinear-equivalent bayer->gray: 3x3 [1,2,1]x[1,2,1]/16 filter with
    reflect border (reference isp_ops.py:78-82 uses cv2.filter2D with
    BORDER_REFLECT)."""
    x = jnp.pad(bayer, [(0, 0)] * (bayer.ndim - 2) + [(1, 1), (1, 1)],
                mode="symmetric")
    k1 = jnp.array([1.0, 2.0, 1.0]) / 4.0
    # separable 3-tap in each dim
    x = (x[..., :-2, :] * k1[0] + x[..., 1:-1, :] * k1[1] + x[..., 2:, :] * k1[2])
    x = (x[..., :, :-2] * k1[0] + x[..., :, 1:-1] * k1[1] + x[..., :, 2:] * k1[2])
    return x

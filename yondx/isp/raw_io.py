"""Stride-style raw packing + DN normalization + bad-pixel repair.

Rebuild of the remaining utils/isp_ops.py surface:
- `pack_raw`/`unpack_raw` (:91-118): RGBG channel order (R@00, G1@01,
  B@11, G2@10) — the noise-modeling community convention, vs the
  reshape-style RGGB of bayer2rggb;
- `raw2bayer` (:121-133): RGBG planes channel-first with (x-bl)/(wp-bl)
  normalization and per-channel bias, `bayer2raw` (:135-149) inverse to
  uint16 DN;
- `repair_bad_pixels` (:152-160): per-plane 3x3 median at listed coords;
- `space_to_depth`/`depth_to_space` (sidd_utils.py:137-153) and the
  BGGR-convention tensor helpers (toTensor/toPatch, :76-135).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def pack_raw(bayer):
    """[H, W] -> [H/2, W/2, 4] RGBG order (R, G1, B, G2)."""
    x = jnp.asarray(bayer)
    return jnp.stack([x[0::2, 0::2], x[0::2, 1::2],
                      x[1::2, 1::2], x[1::2, 0::2]], axis=-1)


def unpack_raw(raw4ch):
    """[h, w, 4] RGBG -> [2h, 2w] bayer."""
    x = jnp.asarray(raw4ch)
    h, w = x.shape[:2]
    out = jnp.zeros((h * 2, w * 2), x.dtype)
    out = out.at[0::2, 0::2].set(x[..., 0])
    out = out.at[0::2, 1::2].set(x[..., 1])
    out = out.at[1::2, 1::2].set(x[..., 2])
    out = out.at[1::2, 0::2].set(x[..., 3])
    return out


def raw2bayer(raw, wp: int = 1023, bl: int = 64, norm: bool = True,
              clip: bool = False, bias=np.zeros(4)):
    """DN bayer -> channel-first RGBG planes [4, h, w], normalized."""
    x = np.asarray(raw, np.float32)
    out = np.stack([x[0::2, 0::2], x[0::2, 1::2],
                    x[1::2, 1::2], x[1::2, 0::2]], axis=0)
    if norm:
        b = (np.asarray(bias) + bl).reshape(4, 1, 1)
        out = (out - b) / (wp - b)
    if clip:
        out = np.clip(out, 0, 1)
    return out.astype(np.float32)


def bayer2raw(packed, wp: int = 16383, bl: int = 512) -> np.ndarray:
    """[4, h, w] normalized RGBG -> uint16 DN bayer [2h, 2w]."""
    x = np.clip(np.asarray(packed, np.float32), 0, 1) * (wp - bl) + bl
    _, h, w = x.shape
    out = np.empty((h * 2, w * 2), np.uint16)
    out[0::2, 0::2] = x[0]
    out[0::2, 1::2] = x[1]
    out[1::2, 1::2] = x[2]
    out[1::2, 0::2] = x[3]
    return out


def repair_bad_pixels(raw: np.ndarray, bad_points) -> np.ndarray:
    """Replace listed (y, x) bayer coords with the per-plane 3x3 median
    (reference repair_bad_pixels, isp_ops.py:152-160)."""
    from .bayer import bayer2rggb, rggb2bayer
    import cv2
    rggb = np.asarray(bayer2rggb(jnp.asarray(raw))).copy()
    for c in range(4):
        rggb[:, :, c] = cv2.medianBlur(rggb[:, :, c], 3)
    fixed = np.asarray(rggb2bayer(jnp.asarray(rggb)))
    out = np.asarray(raw).copy()
    for (y, x) in bad_points:
        out[y, x] = fixed[y, x]
    return out


def space_to_depth(x, block: int = 2):
    """[H, W, C] -> [H/b, W/b, b*b*C] (sidd_utils.py:137-144 order)."""
    x = np.asarray(x)
    H, W, C = x.shape
    y = x.reshape(H // block, block, W // block, block, C)
    return np.swapaxes(y, 1, 2).reshape(H // block, W // block, -1)


def depth_to_space(x, block: int = 2):
    x = np.asarray(x)
    h, w, _ = x.shape
    y = x.reshape(h, w, block, block, -1)
    return np.swapaxes(y, 1, 2).reshape(h * block, w * block, -1)


# SIDD camera -> BGGR normalization (sidd_utils.py:76-107): rotate/flip a
# bayer patch so its CFA reads BGGR, and back.
def to_bggr(patch: np.ndarray, cam: str) -> np.ndarray:
    if cam == "IP":      # RGGB
        return np.rot90(patch, 2)
    if cam == "S6":      # GBRG
        return np.flip(patch, axis=1)
    return patch         # GP, N6, G4 already BGGR


def from_bggr(patch: np.ndarray, cam: str) -> np.ndarray:
    if cam == "IP":
        return np.rot90(patch, 2)
    if cam == "S6":
        return np.flip(patch, axis=1)
    return patch

"""Static-shape padding and overlap tiling.

TPU-first replacements for the reference's spatial-scaling helpers:
- `pad_to_multiple` / `unpad`: reflect pad H/W up to a multiple so a UNet's
  5-scale down/upsampling divides evenly (reference `get_p2d`,
  utils/utils.py:246-252, used YOND_SIDD.py:242,281).
- `tile_overlap` / `untile_overlap`: split a huge frame into a *static* grid
  of overlapping tiles and blend them back (reference
  `big_image_split/big_image_merge`, utils/utils.py:254-268). Static tile
  counts/shapes mean one XLA compilation for any frame of a given size
  class; the halo is cropped on merge, so per-tile UNet inference is exact
  in the interior.

All functions work on NHWC or HWC or HW arrays; spatial dims are always the
two trailing dims before the (optional) channel dim.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _axes(ndim: int, channels_last: bool) -> Tuple[int, int]:
    return (ndim - 3, ndim - 2) if channels_last else (ndim - 2, ndim - 1)


def pad_to_multiple(x, base: int = 32, channels_last: bool = True):
    """Reflect-pad trailing spatial dims up to a multiple of `base`.

    Returns (padded, p2d) where p2d = (top, bottom, left, right). The split
    puts the larger half at bottom/right like the reference's F.pad order
    (get_p2d, utils/utils.py:246-252 pads (left, right, top, bottom) with
    symmetric halves).
    """
    hax, wax = _axes(x.ndim, channels_last)
    H, W = x.shape[hax], x.shape[wax]
    ph = (-H) % base
    pw = (-W) % base
    top, bottom = ph // 2, ph - ph // 2
    left, right = pw // 2, pw - pw // 2
    pad = [(0, 0)] * x.ndim
    pad[hax] = (top, bottom)
    pad[wax] = (left, right)
    xp = jnp.pad(x, pad, mode="reflect") if (ph or pw) else x
    return xp, (top, bottom, left, right)


def unpad(x, p2d, channels_last: bool = True):
    """Invert `pad_to_multiple`."""
    top, bottom, left, right = p2d
    hax, wax = _axes(x.ndim, channels_last)
    idx = [slice(None)] * x.ndim
    idx[hax] = slice(top, x.shape[hax] - bottom)
    idx[wax] = slice(left, x.shape[wax] - right)
    return x[tuple(idx)]


def tile_grid(H: int, W: int, tile: int, halo: int):
    """Compute the static tiling plan for an HxW frame.

    Each tile covers `tile` interior pixels plus a `halo` ring; tiles are
    placed on a stride-`tile` grid and the frame is reflect-padded so every
    tile is full-size. Returns (ny, nx, padded_H, padded_W).
    """
    ny = max(1, math.ceil(H / tile))
    nx = max(1, math.ceil(W / tile))
    return ny, nx, ny * tile + 2 * halo, nx * tile + 2 * halo


def tile_overlap(x, tile: int = 512, halo: int = 64):
    """Split an HW or HWC image into [ny*nx, tile+2*halo, tile+2*halo, C?].

    Reference semantics: big_image_split (utils/utils.py:254-263) chunks into
    an n-by-n grid with a 64 px reflect-pad ring. Here the grid is rectangular
    and the result is a single batched array so one jitted model call covers
    all tiles (no per-tile Python loop / recompiles).
    """
    has_c = x.ndim == 3
    H, W = x.shape[:2]
    ny, nx, _, _ = tile_grid(H, W, tile, halo)
    ph = ny * tile - H
    pw = nx * tile - W
    pad = [(halo, halo + ph), (halo, halo + pw)] + ([(0, 0)] if has_c else [])
    xp = jnp.pad(x, pad, mode="reflect")
    ts = tile + 2 * halo
    tiles = []
    for iy in range(ny):
        for ix in range(nx):
            tiles.append(xp[iy * tile:iy * tile + ts, ix * tile:ix * tile + ts])
    return jnp.stack(tiles, axis=0), (ny, nx, H, W)


def untile_overlap(tiles, plan, halo: int = 64):
    """Merge tiles produced by `tile_overlap`, cropping the halo ring."""
    ny, nx, H, W = plan
    ts = tiles.shape[1]
    tile = ts - 2 * halo
    rows = []
    for iy in range(ny):
        row = [tiles[iy * nx + ix, halo:halo + tile, halo:halo + tile]
               for ix in range(nx)]
        rows.append(jnp.concatenate(row, axis=1))
    out = jnp.concatenate(rows, axis=0)
    return out[:H, :W]


def np_tile_overlap(x: np.ndarray, tile: int = 512, halo: int = 64):
    """Host (numpy) twin of tile_overlap for IO-side pipelines."""
    has_c = x.ndim == 3
    H, W = x.shape[:2]
    ny, nx, _, _ = tile_grid(H, W, tile, halo)
    ph = ny * tile - H
    pw = nx * tile - W
    pad = [(halo, halo + ph), (halo, halo + pw)] + ([(0, 0)] if has_c else [])
    xp = np.pad(x, pad, mode="reflect")
    ts = tile + 2 * halo
    out = np.empty((ny * nx, ts, ts) + x.shape[2:], x.dtype)
    for iy in range(ny):
        for ix in range(nx):
            out[iy * nx + ix] = xp[iy * tile:iy * tile + ts,
                                   ix * tile:ix * tile + ts]
    return out, (ny, nx, H, W)

"""Overlap-tiled full-frame runner for huge (12-50 MP) Bayer frames.

The reference handles full-resolution frames with pad-to-multiple +
big_image_split/merge (utils/utils.py:254-268) and per-tile Python loops.
Here the frame is cut into a static grid of halo-padded tiles
(yondx.core.tiling), the entire tile batch goes through the fused VST
denoiser in chunks of a fixed batch size (one XLA compilation per size
class), and the halos are cropped on merge — per-pixel results in the tile
interiors are identical to whole-frame inference for any network whose
receptive field fits in the halo.

This is the single-chip version of the spatial-sharding scheme in
yondx.parallel (the ICI multi-chip path).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..core.tiling import np_tile_overlap, tile_grid
from ..isp import bayer2rggb, rggb2bayer
from .denoiser import VSTDenoiser


class TiledRunner:
    """Run a VSTDenoiser over an arbitrarily large bayer frame.

    tile/halo are in *bayer* pixels and must be even (RGGB phase). halo=64
    matches the reference's 64-px reflect pad (utils/utils.py:258).
    """

    def __init__(self, denoiser: VSTDenoiser, tile: int = 1024,
                 halo: int = 64, batch: int = 8):
        assert tile % 2 == 0 and halo % 2 == 0
        self.denoiser = denoiser
        self.tile = tile
        self.halo = halo
        self.batch = batch

    def __call__(self, bayer: np.ndarray, curve, K, sigma, scale):
        return self.run_pair(bayer, curve, K, sigma, scale)[0]

    def run_pair(self, bayer: np.ndarray, curve, K, sigma, scale):
        """-> (output, raw_net_output) full frames: the raw (un-refined)
        one feeds the whole-frame collab NLE of an iterated tiled run
        (same contract as VSTDenoiser.denoise_pair)."""
        H, W = bayer.shape
        tiles, plan = np_tile_overlap(bayer, self.tile, self.halo)
        ny, nx, _, _ = tile_grid(H, W, self.tile, self.halo)
        n = tiles.shape[0]
        # adaptive sigma_corr must be resolved at FRAME scope: letting
        # each tile batch re-read the rule from its own pixels risks a
        # guidance-scale step (1.08 vs 1.25) between neighboring tiles
        # when batches straddle the clip threshold — a visible seam.
        # Compute once on the whole frame, pass as a traced override.
        corr = None
        if getattr(self.denoiser, "sigma_corr", None) == "adaptive":
            from .denoiser import adaptive_sigma_corr
            corr = float(adaptive_sigma_corr(
                bayer2rggb(jnp.asarray(bayer, jnp.float32)),
                jnp.float32(K), jnp.float32(sigma), jnp.float32(scale)))
        # pad the batch to a multiple of self.batch (static shapes)
        nb = -(-n // self.batch) * self.batch
        if nb != n:
            tiles = np.concatenate(
                [tiles, np.repeat(tiles[-1:], nb - n, axis=0)], axis=0)
        pair = getattr(self.denoiser, "denoise_pair", None)
        outs, raws = [], []
        for s in range(0, nb, self.batch):
            chunk = jnp.asarray(tiles[s:s + self.batch])
            if pair is not None and corr is not None:
                dn, dn_raw = pair(chunk, curve, K, sigma, scale,
                                  corr=corr)
            elif pair is not None:
                dn, dn_raw = pair(chunk, curve, K, sigma, scale)
            else:
                dn = self.denoiser(chunk, curve, K, sigma, scale)
                dn_raw = dn
            outs.append(np.asarray(dn))
            raws.append(np.asarray(dn_raw))

        def merge(tiles_list):
            out_tiles = np.concatenate(tiles_list, axis=0)[:n]
            t, h = self.tile, self.halo
            out = np.empty((ny * t, nx * t), np.float32)
            for iy in range(ny):
                for ix in range(nx):
                    out[iy * t:(iy + 1) * t, ix * t:(ix + 1) * t] = \
                        out_tiles[iy * nx + ix, h:h + t, h:h + t]
            return out[:H, :W]

        return merge(outs), merge(raws)

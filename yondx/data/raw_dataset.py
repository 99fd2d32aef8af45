"""Real-raw AWGN training data: SID-style long-exposure crops.

Rebuild of SID_Raw_Dataset (yond_datasets.py:46-212): normalized raw
frames -> CFA-phase rotation -> RGGB pack -> optional VST-range sqrt aug
(50%) -> non-overlapped-grid or random crops -> optional WB re-gain aug
(50%, rescales R/B toward a random camera prior) -> AWGN with log-uniform
sigma. The crop-index plumbing is host-side; the per-batch augmentation
(vst/wb/awgn) runs on device.
"""
from __future__ import annotations

import glob
import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..core.io import dataload
from ..isp import bayer2rggb
from .unprocess import random_gains


class SIDRawDataset:
    """Host side: yields clean RGGB crop stacks [crops, ps/2, ps/2, 4].

    root layout: {root}/{mode}/*.{npy|mat} raw bayer frames in DN, plus an
    optional per-frame sidecar {name}.wb.npy with [3] camera wb gains.
    """

    def __init__(self, root_dir: str, mode: str = "train",
                 patch_size: int = 256, crop_per_image: int = 8,
                 croptype: str = "non-overlapped", wp: int = 16383,
                 bl: int = 512, seed: int = 0):
        self.dir = os.path.join(root_dir, mode)
        self.paths = sorted(glob.glob(os.path.join(self.dir, "*.npy")) +
                            glob.glob(os.path.join(self.dir, "*.mat")))
        if not self.paths:
            raise FileNotFoundError(f"no raw frames under {self.dir}")
        self.mode = mode
        self.ps = patch_size
        self.cpi = crop_per_image
        self.croptype = croptype
        self.wp, self.bl = wp, bl
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.paths)

    def _crop_points(self, h, w):
        ps2 = self.ps // 2  # rggb domain
        starts = []
        if self.croptype == "non-overlapped":
            nh, nw = h // ps2, w // ps2
            h0 = self.rng.integers(0, h - nh * ps2 + 1)
            w0 = self.rng.integers(0, w - nw * ps2 + 1)
            for i in range(nh):
                for j in range(nw):
                    starts.append((h0 + i * ps2, w0 + j * ps2))
        else:
            for _ in range(self.cpi):
                starts.append((self.rng.integers(0, h - ps2 + 1),
                               self.rng.integers(0, w - ps2 + 1)))
        return starts

    def __getitem__(self, idx: int):
        raw = dataload(self.paths[idx]).astype(np.float32)
        raw = (raw - self.bl) / (self.wp - self.bl)
        pattern = int(self.rng.integers(4)) if self.mode == "train" \
            else idx % 4
        raw = np.rot90(raw, k=pattern, axes=(-2, -1))
        rggb = np.clip(np.asarray(bayer2rggb(jnp.asarray(raw.copy()))), 0, 1)
        h, w = rggb.shape[:2]
        ps2 = self.ps // 2
        if self.mode == "train":
            starts = self._crop_points(h, w)[: self.cpi]
            crops = np.stack([rggb[y:y + ps2, x:x + ps2]
                              for (y, x) in starts])
        else:
            crops = rggb[None, :h // ps2 * ps2, :w // ps2 * ps2]
        return crops.astype(np.float32)


def raw_awgn_batch(key, hr_crops, sigma_min: float = 5.0,
                   sigma_max: float = 50.0, vst_aug: bool = True,
                   wb_aug: bool = True, clip: bool = True):
    """Device augmentation for raw crops [B, h, w, 4] (RGGB):
    50% sqrt VST-range aug (yond_datasets.py:124-126), 50% WB re-gain
    toward a random camera prior (:183-191), AWGN with per-sample
    log-uniform sigma. Returns (lr, hr, sigma)."""
    k_v, k_w, k_g, k_n = jax.random.split(key, 4)
    hr = hr_crops
    if vst_aug:
        do_v = jax.random.randint(k_v, (), 0, 2) > 0
        hr = jnp.where(do_v, jnp.sqrt(jnp.maximum(hr, 0.0)), hr)
    if wb_aug:
        do_w = jax.random.randint(k_w, (), 0, 2) > 0
        rgb_gain, red, blue = random_gains(k_g)
        # rescale R/B toward the sampled prior relative to neutral wb=1
        gains = jnp.stack([1.0 / red, jnp.float32(1.0),
                           jnp.float32(1.0), 1.0 / blue]) * rgb_gain
        hr = jnp.where(do_w, hr * gains[None, None, None, :], hr)
    from .noise import awgn_log_uniform
    lr, sigma = awgn_log_uniform(k_n, hr, sigma_min, sigma_max)
    if clip:
        lr = jnp.clip(lr, 0.0, 1.0)
        hr = jnp.clip(hr, 0.0, 1.0)
    return lr, hr, sigma


def awgn_one_channel_batch(key, hr_crops, sigma_min: float = 5.0,
                           sigma_max: float = 50.0, channel: int = 2):
    """The 3-clean+1-noisy variant (RGB_Img2Raw3c1n_Dataset,
    yond_datasets.py:550-657): AWGN applied to a single RGGB channel."""
    from .noise import awgn_log_uniform
    lr, sigma = awgn_log_uniform(key, hr_crops, sigma_min, sigma_max)
    mask = jnp.zeros((hr_crops.shape[-1],)).at[channel].set(1.0)
    lr = hr_crops + (lr - hr_crops) * mask
    return lr, sigma

"""Multi-frame index plumbing for video/burst denoising (reference
utils/video_ops.py): sliding nframes windows over a 7-frame burst with
reflect or clip boundary handling."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def num_clip(nums, lo, hi):
    return np.clip(np.array(nums), lo, hi)


def num_reflect(nums, lo, hi):
    nums = np.abs(np.array(nums) - lo)
    return hi - np.abs(hi - nums)


def frame_index_splitor(nframes: int = 1, pad: bool = True,
                        reflect: bool = True):
    """Index groups for a 7-frame burst (video_ops.py:3-22)."""
    r = nframes // 2
    length = 7 if pad else 8 - nframes
    frames = [[None] * nframes for _ in range(length)]
    if pad:
        for i in range(7):
            for k in range(nframes):
                frames[i][k] = i + k - r
    else:
        for i in range(8 - nframes):
            for k in range(nframes):
                frames[i][k] = i + k
    return num_reflect(frames, 0, 6) if reflect else num_clip(frames, 0, 6)


def multi_frame_loader(frames, index, gt: bool = False,
                       keepdims: bool = False):
    """Gather [B, 7, h, w, c] burst frames into per-window stacks
    (video_ops.py:24-39): -> [n_windows, B, nframes, h, w, c] (or the
    center frame per window when gt=True)."""
    out = []
    for ind in index:
        if gt:
            r = len(index[0]) // 2
            t = frames[:, ind[r]]
            if keepdims:
                t = t[:, None]
        else:
            t = jnp.stack([frames[:, i] for i in ind], axis=1)
        out.append(t)
    return jnp.stack(out, axis=0)

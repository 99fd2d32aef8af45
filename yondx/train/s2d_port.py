"""Warm-start a GuidedResUnetS2D from a trained GuidedResUnet checkpoint.

The packed net (models/unets.py GuidedResUnetS2D) starts one scale down,
so every encoder/decoder stage from the reference net's scale 2 onward has
an exact shape twin: flagship conv2/3/4/5 (64/128/256/512-feature guided
blocks) <-> s2d conv1/2/3/4, pools 2/3/4 <-> 1/2/3, deconvs upv6/7/8 <->
upv5/6/7 and decoder blocks conv6/7/8 (256/128/64) <-> conv5/6/7. Only the
packing boundary layers (conv_in 16->64, conv_out 64->16) and the
flagship's own boundary layers (conv_in/conv1/pool1/upv9/conv9/conv10)
have no counterpart and keep their fresh init. ~95% of the 11.1M params
port; the fine-tune then only has to relearn the pixel packing, not the
denoising prior. Reference anchor: the shipped SNR-Net
(archs/Unet.py:380-470); motivation: the v5e lane-geometry roofline
(docs/STATUS.md).
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np

# s2d layer -> flagship layer (inside the flagship's 'unet' scope)
S2D_PORT_MAP = {
    "conv1": "conv2", "conv2": "conv3", "conv3": "conv4",
    "conv4": "conv5",
    "pool1": "pool2", "pool2": "pool3", "pool3": "pool4",
    "upv5": "upv6", "upv6": "upv7", "upv7": "upv8",
    "conv5": "conv6", "conv6": "conv7", "conv7": "conv8",
}


def _as_mutable(d):
    try:  # FrozenDict -> plain dict (no-op on plain dicts)
        return jax.tree_util.tree_map(lambda x: x, dict(d))
    except TypeError:
        return d


def extend_with_tail(src_params: Any, dst_params: Any) -> Any:
    """Port a tail-less GuidedResUnetS2D checkpoint into the tail_nf>0
    variant: every pre-existing stage copies over verbatim; the tail
    stages keep `dst_params`'s fresh init (tail_2 is zero-init in the
    arch, so the extended net's output is BIT-IDENTICAL to the source
    checkpoint's until the tail trains). Raises on any non-tail mismatch."""
    src = jax.device_get(src_params)["params"]
    dst = jax.device_get(dst_params)["params"]
    dst = {k: _as_mutable(v) for k, v in dict(dst).items()}
    for name in dst:
        if name.startswith("tail_"):
            continue
        if name not in src:
            raise KeyError(f"stage {name} missing from source checkpoint")
        for (p_d, l_d), (p_s, l_s) in zip(
                jax.tree_util.tree_leaves_with_path(dst[name]),
                jax.tree_util.tree_leaves_with_path(src[name])):
            if p_d != p_s or np.shape(l_d) != np.shape(l_s):
                raise ValueError(f"stage {name} is not a shape twin: "
                                 f"{p_d}{np.shape(l_d)} vs "
                                 f"{p_s}{np.shape(l_s)}")
        dst[name] = jax.tree_util.tree_map(np.asarray, src[name])
    return {"params": dst}


def port_guidedresunet_to_s2d(src_params: Any, dst_params: Any
                              ) -> Tuple[Any, List[str], List[str]]:
    """Copy every shape-twin subtree of `src_params` (GuidedResUnet, with
    its single 'unet' submodule scope) into `dst_params`
    (GuidedResUnetS2D). Returns (merged_params, ported, fresh) where
    ported/fresh list the s2d layer names. Raises on any shape mismatch —
    the twin structure is exact by construction, so a mismatch means the
    architectures diverged."""
    src = jax.device_get(src_params)["params"]["unet"]
    dst = jax.device_get(dst_params)["params"]
    dst = {k: _as_mutable(v) for k, v in dict(dst).items()}

    ported, fresh = [], []
    for name in dst:
        if name not in S2D_PORT_MAP:
            fresh.append(name)
            continue
        twin = src[S2D_PORT_MAP[name]]
        d_leaves = jax.tree_util.tree_leaves_with_path(dst[name])
        s_leaves = dict(jax.tree_util.tree_leaves_with_path(twin))
        for path, leaf in d_leaves:
            if path not in s_leaves:
                raise KeyError(f"{name}{jax.tree_util.keystr(path)} has no "
                               f"twin in flagship {S2D_PORT_MAP[name]}")
            s_leaf = s_leaves[path]
            if np.shape(s_leaf) != np.shape(leaf):
                raise ValueError(
                    f"shape mismatch at {name}{jax.tree_util.keystr(path)}: "
                    f"{np.shape(s_leaf)} vs {np.shape(leaf)}")
        dst[name] = jax.tree_util.tree_map(lambda s: np.asarray(s), twin)
        ported.append(name)
    return {"params": dst}, sorted(ported), sorted(fresh)

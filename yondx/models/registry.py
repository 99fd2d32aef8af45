"""Model registry: YAML arch name -> Flax module.

Replaces the reference's `globals()[arch['name']](arch)` dispatch
(trainer_AWGN.py:19, YOND_SIDD.py:177) with an explicit mapping. Names match
the reference YAML runfiles exactly.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import unets, comp

MODEL_REGISTRY = {
    "UNetSeeInDark": unets.UNetSeeInDark,
    "ResUnet": unets.ResUnet,
    "ResUnet2": unets.ResUnet2,
    "SNRnet": unets.SNRnet,
    "GuidedResUnet": unets.GuidedResUnet,
    "GuidedResUnetS2D": unets.GuidedResUnetS2D,
    "EstUnet": unets.EstUnet,
    "DnCNN": comp.DnCNN,
    "est_UNet": comp.est_UNet,
    "FBI_Net": comp.FBI_Net,
    "SelfSupUNet": comp.SelfSupUNet,
    "SelfResUNet": comp.SelfResUNet,
    "GuidedSelfUnet": comp.GuidedSelfUnet,
    "N2NF_Unet": comp.N2NF_Unet,
}

# Models whose __call__ takes (x, t); mirrors `'guided' in arch` checks
# (trainer_AWGN.py:101, YOND_SIDD.py:283).
GUIDED_MODELS = {"GuidedResUnet", "GuidedResUnetS2D", "SNRnet",
                 "GuidedSelfUnet"}


def build_model(arch: Dict[str, Any], dtype=None):
    """arch: the YAML `arch:` block (must contain 'name')."""
    name = arch["name"]
    if name not in MODEL_REGISTRY:
        raise KeyError(f"Unknown arch name {name!r}; known: "
                       f"{sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](args=arch, dtype=dtype)


def is_guided(arch: Dict[str, Any]) -> bool:
    return arch.get("guided", arch["name"] in GUIDED_MODELS)


def init_params(model, rng, input_shape: Tuple[int, ...],
                guided: bool | None = None):
    """Initialize params with a dummy batch. input_shape: [B, h, w, C]."""
    x = jnp.zeros(input_shape, jnp.float32)
    if guided is None:
        guided = model.__class__.__name__ in GUIDED_MODELS
    if guided:
        t = jnp.full((input_shape[0],), 0.1, jnp.float32)
        return model.init(rng, x, t)
    return model.init(rng, x)


def initialize_weights(params, rng, std: float = 0.02):
    """Reference N(0, 0.02) init (archs/__init__.py:10-17, applied to a
    freshly-built net by trainer_AWGN.py:33): every Conv2d weight AND bias
    ~ N(0, std); ConvTranspose2d weights too (their biases untouched). The
    reference's FiLM 1x1 convs are Dense layers here — same treatment
    (kernel rank 2). Non-conv leaves (PReLU alphas, norms) are untouched."""
    import jax
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in leaves:
        names = [str(getattr(p, "key", p)) for p in path]
        last = names[-1] if names else ""
        is_deconv = any("deconv" in n for n in names)
        rng, sub = jax.random.split(rng)
        if last == "kernel":
            out.append(jax.random.normal(sub, leaf.shape, leaf.dtype) * std)
        elif last == "bias" and not is_deconv:
            out.append(jax.random.normal(sub, leaf.shape, leaf.dtype) * std)
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def param_count(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))

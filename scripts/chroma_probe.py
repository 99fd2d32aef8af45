"""Chroma-bias probe: the chart-ceiling root-cause metric (round 3).

Measures the net's per-channel DC bias on chroma-extreme FLAT patches:
feed a constant RGGB patch with white-balance ratio B/G = r (and R/G =
1/r) plus AWGN at the guided sigma, and report mean(out - clean) per
channel. The round-2 "26 dB saturated-block ceiling" root-caused to this
(docs/STATUS.md): nets trained on the procedural generator carry a
gray-world prior and desaturate colored flats (R +0.089 / B -0.090 at
r=2.8, sigma-independent). A chroma_aug fine-tune should drive these
biases toward 0.

Usage: python scripts/chroma_probe.py [ckpt ...]   (default: shipped
flagship); add --cpu off-TPU.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpts", nargs="*",
                    default=["checkpoints/Gaussian/"
                             "Gaussian_GRU_mix_1to50_norm_best_model.ckpt"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sigma", type=float, default=5.0, help="/255 AWGN")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/yondx_xla_cache")

    from yondx.models import build_model
    from yondx.models.registry import init_params
    from yondx.train.ckpt import load_checkpoint

    arch = {"name": "GuidedResUnet", "guided": True, "in_nc": 4,
            "out_nc": 4, "nf": 32, "nframes": 1, "res": True, "norm": True}
    model = build_model(arch)
    sig = args.sigma / 255.0
    rng = np.random.default_rng(0)
    apply = jax.jit(lambda p, x, t: model.apply(p, x, t))

    for path in args.ckpts:
        params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
        params = load_checkpoint(path, params)["params"]
        print(f"== {path} (sigma {args.sigma}/255)")
        worst = 0.0
        for r in (1.0, 1.5, 2.0, 2.8, 4.0):
            g = 0.30
            clean = np.stack([np.full((128, 128), min(g / r, 1.0)),
                              np.full((128, 128), g),
                              np.full((128, 128), g),
                              np.full((128, 128), min(g * r, 1.0))],
                             axis=-1)[None].astype(np.float32)  # R G G B
            noisy = clean + rng.normal(0, sig, clean.shape).astype(
                np.float32)
            t = jnp.full((1,), sig, jnp.float32)
            out = np.asarray(apply(params, jnp.asarray(noisy), t))
            bias = (out - clean).mean(axis=(0, 1, 2))
            worst = max(worst, float(np.abs(bias).max()))
            print(f"  B/G={r:>3}: bias R {bias[0]:+.4f}  G "
                  f"{(bias[1] + bias[2]) / 2:+.4f}  B {bias[3]:+.4f}")
        print(f"  worst |bias| = {worst:.4f}")


if __name__ == "__main__":
    main()

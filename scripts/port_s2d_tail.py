"""Extend a trained tail-less GuidedResUnetS2D checkpoint with the
zero-init full-res tail (arch key tail_nf) and save it under a new model
name, ready for the tail-only distillation phase
(runfiles/Gaussian/GRUS2DT_distill_tail.yml).

The tail's second conv is zero-init (models/unets.py), so the saved
checkpoint's output is bit-identical to the source until the tail trains
— verified here by a forward-pass check.

Run: python scripts/port_s2d_tail.py [--src Gaussian_GRUS2D3_mix_1to50c_norm]
         [--dst Gaussian_GRUS2DT_mix_1to50c_norm] [--tail-nf 16]
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
    ap.add_argument("--src", default="Gaussian_GRUS2D3_mix_1to50c_norm")
    ap.add_argument("--dst", default="Gaussian_GRUS2DT_mix_1to50c_norm")
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--out-k", type=int, default=3)
    ap.add_argument("--tail-nf", type=int, default=16)
    args = ap.parse_args()
    jax.config.update("jax_platforms", "cpu")

    from yondx.models import build_model
    from yondx.models.registry import init_params
    from yondx.train.ckpt import (find_checkpoint, load_checkpoint,
                                  save_checkpoint)
    from yondx.train.s2d_port import extend_with_tail

    base = {"name": "GuidedResUnetS2D", "guided": True, "in_nc": 4,
            "out_nc": 4, "nf": args.nf, "nframes": 1, "res": True,
            "norm": True, "out_k": args.out_k}
    src_m = build_model(base)
    src_p = init_params(src_m, jax.random.PRNGKey(0), (1, 128, 128, 4))
    ck = find_checkpoint("checkpoints/Gaussian", args.src)
    assert ck, args.src
    src_p = load_checkpoint(ck, src_p)["params"]

    tail_m = build_model(dict(base, tail_nf=args.tail_nf))
    tail_p = init_params(tail_m, jax.random.PRNGKey(1), (1, 128, 128, 4))
    merged = extend_with_tail(src_p, tail_p)

    x = jnp.asarray(np.random.default_rng(0).random((1, 128, 128, 4)),
                    jnp.float32)
    t = jnp.full((1,), 0.05, jnp.float32)
    y0 = np.asarray(src_m.apply(src_p, x, t))
    y1 = np.asarray(tail_m.apply(merged, x, t))
    np.testing.assert_array_equal(y0, y1)
    n_tail = sum(int(np.prod(v.shape))
                 for k, v in merged["params"].items() if k.startswith("tail_")
                 for v in jax.tree_util.tree_leaves(v))
    out = f"checkpoints/Gaussian/{args.dst}_last_model.ckpt"
    save_checkpoint(out, merged, epoch=0)
    print(f"saved {out} (tail params: {n_tail}); identity check PASSED")


if __name__ == "__main__":
    main()

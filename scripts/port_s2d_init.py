"""Build the GuidedResUnetS2D warm-start checkpoint from the flagship.

Copies the shape-twin stages of the trained GuidedResUnet flagship into a
fresh S2D net (yondx/train/s2d_port.py) and writes it as the fine-tune's
resume checkpoint (epoch 0, no opt state).

Run: python scripts/port_s2d_init.py \
        [--src Gaussian_GRU_mix_1to50c_norm] \
        [--dst Gaussian_GRUS2D_mix_1to50c_norm]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")   # pure host work
import jax.numpy as jnp

from yondx.core.logging import log
from yondx.models import build_model
from yondx.models.registry import init_params
from yondx.train.ckpt import find_checkpoint, load_checkpoint, \
    save_checkpoint
from yondx.train.s2d_port import port_guidedresunet_to_s2d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="Gaussian_GRU_mix_1to50c_norm")
    ap.add_argument("--dst", default="Gaussian_GRUS2D_mix_1to50c_norm")
    ap.add_argument("--ckpt-dir", default="checkpoints/Gaussian")
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--out-k", type=int, default=1,
                    help="conv_out kernel size (1 or 3)")
    args = ap.parse_args()

    src_arch = {"name": "GuidedResUnet", "guided": True, "in_nc": 4,
                "out_nc": 4, "nf": 32, "nframes": 1, "res": True,
                "norm": True}
    src_model = build_model(src_arch)
    src_params = init_params(src_model, jax.random.PRNGKey(0),
                             (1, 128, 128, 4))
    path = find_checkpoint(args.ckpt_dir, args.src)
    assert path, f"no checkpoint for {args.src} under {args.ckpt_dir}"
    src_params = load_checkpoint(path, src_params)["params"]
    log(f"flagship: {path}")

    dst_arch = {"name": "GuidedResUnetS2D", "guided": True, "in_nc": 4,
                "out_nc": 4, "nf": args.nf, "nframes": 1, "res": True,
                "norm": True, "out_k": args.out_k}
    dst_model = build_model(dst_arch)
    dst_params = init_params(dst_model, jax.random.PRNGKey(1),
                             (1, 128, 128, 4))
    merged, ported, fresh = port_guidedresunet_to_s2d(src_params,
                                                      dst_params)
    log(f"ported stages: {ported}")
    log(f"fresh stages:  {fresh}")

    # smoke: the merged tree drives a forward pass
    y = dst_model.apply(merged, jnp.zeros((1, 64, 64, 4), jnp.float32),
                        jnp.full((1,), 0.1, jnp.float32))
    assert y.shape == (1, 64, 64, 4)

    out = os.path.join(args.ckpt_dir, f"{args.dst}_last_model.ckpt")
    save_checkpoint(out, merged, None, epoch=0, best_psnr=0.0)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()

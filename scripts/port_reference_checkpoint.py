"""Port a reference PyTorch checkpoint (.pth) into a yondx .ckpt.

Usage:
    python scripts/port_reference_checkpoint.py \
        --pth checkpoints/Gaussian/Gaussian_GRU_mix_5to50_norm_best_model.pth \
        --arch GuidedResUnet --nf 32 \
        --out checkpoints/Gaussian/Gaussian_GRU_mix_5to50_norm_best_model.ckpt

Users of the reference drop their trained weights in and every yondx entry
point (yond, trainer-awgn eval, bench.py) picks them up through the
best/last checkpoint search.
"""
import argparse

import jax

from yondx.models import build_model, param_count
from yondx.models.registry import init_params, is_guided
from yondx.models.torch_port import port_checkpoint
from yondx.train.ckpt import save_checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--arch", default="GuidedResUnet")
    ap.add_argument("--nf", type=int, default=32)
    ap.add_argument("--in-nc", type=int, default=4)
    ap.add_argument("--out-nc", type=int, default=4)
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")
    arch = {"name": args.arch, "guided": args.arch in
            ("GuidedResUnet", "SNRnet", "GuidedSelfUnet"),
            "in_nc": args.in_nc, "out_nc": args.out_nc, "nf": args.nf,
            "nframes": 1, "res": True, "norm": True}
    params = port_checkpoint(args.arch, args.pth)
    # sanity: shapes must match a fresh init
    model = build_model(arch)
    ref = init_params(model, jax.random.PRNGKey(0), (1, 64, 64, 4),
                      guided=is_guided(arch))
    n_ref, n_got = param_count(ref), param_count(params)
    assert n_ref == n_got, f"param count mismatch: {n_got} vs {n_ref}"
    save_checkpoint(args.out, params)
    print(f"ported {n_got / 1e6:.2f}M params -> {args.out}")


if __name__ == "__main__":
    main()

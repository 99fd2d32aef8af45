"""Sweep the guidance calibration sigma_corr at the TRUE (K, sigma).

Round-3 verdict Next #2(b): on radial_mid even the TRUE noise model
loses ~0.1 dB at iteration 1 vs the (self-estimated) round 0 — which is
only possible if the net's t-response is miscalibrated so that the
self-NLE's small over-estimate accidentally compensates. This probe
denoises each scene ONCE per sigma_corr value at the frozen true
(K, sigma) and prints the PSNR curve; the argmax is the calibrated
guidance gain for this checkpoint (the reference uses a fixed 1.03,
YOND_SIDD.py:283-288).

Run: python scripts/probe_sigma_corr.py [--scenes radial_mid ...] [--cpu]
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
    ap.add_argument("--scenes", nargs="+",
                    default=["radial_mid", "satdisk_mid", "voronoi_mid",
                             "zone_mid", "bubbles_mid", "glyphs_mid",
                             "ramp_mid", "chart_anchor"])
    ap.add_argument("--model", default="Gaussian_GRU_mix_1to50c_norm")
    ap.add_argument("--arch", default="GuidedResUnet")
    ap.add_argument("--nf", type=int, default=32)
    ap.add_argument("--corrs", nargs="+", type=float,
                    default=[0.90, 0.95, 1.00, 1.03, 1.06, 1.10, 1.15,
                             1.25])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/yondx_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yondx.eval.heldout import SUITES, build_scene, WP, BL
    from yondx.eval.metrics import psnr
    from yondx.models import build_model
    from yondx.models.registry import init_params
    from yondx.pipeline import VSTDenoiser
    from yondx.train.ckpt import find_checkpoint, load_checkpoint
    from yondx.vst.lut import BiasLUT

    arch = {"name": args.arch, "guided": True, "in_nc": 4, "out_nc": 4,
            "nf": args.nf, "nframes": 1, "res": True, "norm": True}
    if args.arch == "GuidedResUnetS2D":
        arch.update(out_k=3, nf=64)
        if "S2DT" in args.model:
            arch["tail_nf"] = 16
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
    ck = find_checkpoint("checkpoints/Gaussian", args.model)
    assert ck, args.model
    params = load_checkpoint(ck, params)["params"]
    lut = BiasLUT()

    specs = {s.name: s for s in SUITES["v2"]}
    print(f"{'scene':13s} " + " ".join(f"sc={c:5.2f}" for c in args.corrs))
    best = []
    for name in args.scenes:
        spec = specs[name]
        clean, noisy = build_scene(spec)
        p = {"wp": WP, "bl": BL, "ratio": 1, "scale": float(WP - BL),
             "gain": 1.0, "sigma": 0.0}
        K = spec.K
        sig = spec.sigma
        curve = lut.curve(K, sig)
        row = []
        for corr in args.corrs:
            den = VSTDenoiser(model, params, guided=True,
                              bias_corr="pre", vst_type="exact")
            den.sigma_corr = corr
            dn = den(noisy, curve, K, sig, p["scale"])
            row.append(float(psnr(np.asarray(dn), clean)))
        best.append(args.corrs[int(np.argmax(row))])
        print(f"{name:13s} " + " ".join(f"{v:8.3f}" for v in row)
              + f"   best={best[-1]:.2f}")
    print(f"median best sigma_corr over scenes: {np.median(best):.3f}")


if __name__ == "__main__":
    main()

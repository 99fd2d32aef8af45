"""Dissect an iteration-1 PSNR droop on a held-out scene.

For each named scene, runs round 0 (self-est + denoise), then denoises
round 1 under several (K, sigma) sources:
  - collab: the product path (robust collab NLE on (noisy, dn0));
  - true:   the scene's frozen ground-truth (K, sigma);
  - self:   round-0's own self estimate re-used.
If `true` droops below it0 too, the estimate is exonerated and the droop
is a second-pass model property (the right fix is an iteration policy,
not a better estimator). If only `collab` droops, the estimator is the
cause and the gap to `true` bounds the available gain.

Run: python scripts/probe_droop.py --scenes radial_mid zone_lo [--cpu]
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
    ap.add_argument("--scenes", nargs="+", default=["radial_mid"])
    ap.add_argument("--model", default="Gaussian_GRU_mix_1to50c_norm")
    ap.add_argument("--arch", default="GuidedResUnet")
    ap.add_argument("--nf", type=int, default=32)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/yondx_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yondx.core.logging import log
    from yondx.eval.heldout import HELDOUT_SCENES, build_scene, WP, BL
    from yondx.eval.metrics import psnr
    from yondx.isp import bayer2rggb
    from yondx.models import build_model
    from yondx.models.registry import init_params
    from yondx.nle.robust import (collab_nlf_robust, mad_collab_estimate,
                                  self_nlf_robust)
    from yondx.nle.nlf import collab_nlf
    from yondx.pipeline import VSTDenoiser
    from yondx.train.ckpt import find_checkpoint, load_checkpoint
    from yondx.vst.lut import BiasLUT

    arch = {"name": args.arch, "guided": True, "in_nc": 4, "out_nc": 4,
            "nf": args.nf, "nframes": 1, "res": True, "norm": True}
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
    ck = find_checkpoint("checkpoints/Gaussian", args.model)
    assert ck, args.model
    params = load_checkpoint(ck, params)["params"]
    den = VSTDenoiser(model, params, guided=True, bias_corr="pre",
                      vst_type="exact")
    lut = BiasLUT()
    scale = float(WP - BL)

    def denoise(lr, K, sigma):
        curve = lut.curve(max(K, 1e-4), sigma)
        return np.asarray(den(jnp.asarray(lr, jnp.float32), curve,
                              max(K, 1e-4), sigma, scale))

    specs = {s.name: s for s in HELDOUT_SCENES}
    for name in args.scenes:
        spec = specs[name]
        clean, noisy = build_scene(spec)
        p_in = float(psnr(noisy, clean))
        # round 0
        rggb = bayer2rggb(jnp.asarray(noisy, jnp.float32))
        b1s, b2s = (float(v) for v in self_nlf_robust(rggb, k=29))
        K0, s0 = b1s * scale, float(np.sqrt(max(b2s, 0.0))) * scale
        dn0 = denoise(noisy, K0, s0)
        p0 = float(psnr(dn0, clean))

        # round-1 candidates
        rggb_dn = bayer2rggb(jnp.asarray(dn0, jnp.float32))
        b1c, b2c = (float(v) for v in collab_nlf_robust(
            rggb, rggb_dn, k=29, self_reg=(b1s, b2s)))
        b1f, b2f = (float(v) for v in collab_nlf(rggb, rggb_dn, k=29))
        b1m, b2m = (float(v) for v in mad_collab_estimate(rggb, rggb_dn))
        cands = {
            "collab": (b1c * scale, float(np.sqrt(max(b2c, 0.0))) * scale),
            "true": (spec.K, spec.sigma),
            "self": (K0, s0),
        }
        log(f"== {name}: true K={spec.K} sig={spec.sigma} "
            f"noisy={p_in:.2f} it0={p0:.2f} "
            f"(self K={K0:.2f} sig={s0:.2f})")
        log(f"   collab fit  K={b1f * scale:7.3f} b2={b2f:.3e}")
        log(f"   collab mad  K={b1m * scale:7.3f} b2={b2m:.3e}")
        log(f"   collab comb K={b1c * scale:7.3f} b2={b2c:.3e}")
        for tag, (K, sig) in cands.items():
            dn1 = denoise(noisy, K, sig)
            p1 = float(psnr(dn1, clean))
            log(f"   it1[{tag:6s}] K={K:7.3f} sig={sig:7.3f} "
                f"psnr={p1:.2f} ({p1 - p0:+.2f} vs it0)")


if __name__ == "__main__":
    main()

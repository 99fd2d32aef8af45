"""Synthetic SIDD-style blind-denoise eval: the data-free quality gate.

Builds N scenes of 32x 256x256 Bayer crops (flat-patch content + calibrated
Poisson-Gaussian noise at random (K, sigma) drawn from the IMX686-like
prior), runs the full iterative engine with the trained SNR-Net, and
reports per-iteration PSNR/SSIM — the stand-in for the SIDD 51.60 dB
anchor while the real validation .mat files are unavailable.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from yondx.core.logging import log
from yondx.eval.metrics import psnr, matlab_ssim
from yondx.models import build_model
from yondx.models.registry import init_params
from yondx.pipeline import VSTDenoiser, YONDEngine, PipelineConfig
from yondx.train.ckpt import find_checkpoint, load_checkpoint
from yondx.vst.lut import BiasLUT
from yondx.data.datasets import SyntheticSRGBDataset
from yondx.data.unprocess import srgb_to_pseudo_raw
from yondx.isp import rggb2bayer


def make_scene(i, n_crops=8, wp=1023, bl=64, rng=None, content="flat"):
    """n_crops clean bayer crops + PG noise at a scene-level (K, sigma).

    content='flat': SIDD-like scenes dominated by flat regions (the regime
    YOND's patch-statistics NLE is built for — reference SIDD scenes are
    indoor charts/objects with large uniform areas).
    content='texture': procedural multi-octave scenes with gradient energy
    at every scale — deliberately adversarial for the flat-region fit; K
    over-estimates there (content leaks into the variance), matching the
    reference's behavior on texture-only content.
    """
    rng = rng or np.random.default_rng(1000 + i)
    if content == "flat":
        S = 512
        imgs = np.zeros((n_crops, S, S, 3), np.float32)
        for n in range(n_crops):
            img = np.ones((S, S, 3), np.float32) * rng.random(3)
            for _ in range(rng.integers(6, 14)):  # big flat patches
                y0, x0 = rng.integers(0, S - 32, 2)
                h, w = rng.integers(S // 8, S // 2, 2)
                img[y0:y0 + h, x0:x0 + w] = rng.random(3)
            if rng.random() < 0.5:                # one textured region
                y0, x0 = rng.integers(0, S // 2, 2)
                t = int(rng.integers(S // 8, S // 4))
                img[y0:y0 + t, x0:x0 + t] *= rng.random((t, t, 1)) * 0.5 + 0.5
            imgs[n] = np.clip(img * (0.4 + rng.random() * 0.6), 0, 1)
    else:
        ds = SyntheticSRGBDataset(length=n_crops, size=512, seed=31 * i + 7)
        imgs = np.stack([ds[j] for j in range(n_crops)]).astype(np.float32)
        if imgs.max() > 1.5:
            imgs = imgs / 255.0
    key = jax.random.PRNGKey(i)
    rggb, _, _, _ = srgb_to_pseudo_raw(key, jnp.asarray(imgs),
                                       bayer_aug_enabled=False)
    clean = np.asarray(rggb2bayer(rggb))  # [n, 512, 512]
    scale = wp - bl
    # SIDD-like noise range: input PSNR roughly 22-34 dB
    K = float(np.exp(rng.uniform(np.log(2.0), np.log(24.0))))
    sigma = float(K * np.exp(rng.uniform(np.log(0.5), np.log(3.0))))
    electrons = np.clip(clean, 0, 1) * scale / K
    noisy = (K * rng.poisson(electrons) +
             rng.normal(0, sigma, clean.shape)) / scale
    return clean, np.clip(noisy, 0, 1).astype(np.float32), K, sigma


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=10)
    ap.add_argument("--nf", type=int, default=32)
    ap.add_argument("--arch", default="GuidedResUnet",
                    help="arch name (e.g. GuidedResUnetS2D with --nf 64)")
    ap.add_argument("--model", default="Gaussian_GRU_mix_5to50_norm")
    ap.add_argument("--ckpt-dir", default="checkpoints/Gaussian")
    ap.add_argument("--out-k", type=int, default=None,
                    help="conv_out kernel size override (S2D archs)")
    ap.add_argument("--tail-nf", type=int, default=None,
                    help="full-res tail width (S2D tail variant)")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--content", default="flat",
                    choices=["flat", "texture"])
    ap.add_argument("--heldout", action="store_true",
                    help="run the frozen generator-disjoint suite "
                         "(yondx.eval.heldout) instead of ad-hoc scenes")
    ap.add_argument("--suite", default="v1", choices=["v1", "v2", "v3"],
                    help="held-out suite version: v1 = the 15 round-3 "
                         "scenes (cross-round comparable), v2 = 36 "
                         "scenes incl. second seeds, high-noise band "
                         "and a 1024-px tier, v3 = v2 + the frozen "
                         "photographic class (docs/heldout_photo)")
    ap.add_argument("--json", default=None, metavar="PATH",
                    help="with --heldout: also dump the per-scene rows + "
                         "summary as JSON (cross-round tracking artifact)")
    ap.add_argument("--est", default="robust",
                    choices=["robust", "simple", "pge"],
                    help="round-1 estimator column: 'robust' = flat-mask "
                         "fit + wavelet-MAD cross-check (product), "
                         "'simple' = plain flat-mask fit (reference "
                         "SimpleNLF), 'pge' = the shipped est_UNet "
                         "scalar net (runfiles/Gaussian/EstPGE.yml)")
    ap.add_argument("--refine", default=None,
                    choices=["local", "fixed", "bucket"],
                    help="method-noise Wiener refinement (pipeline/refine"
                         ".py) with the given noise floor — the product "
                         "config of runfiles/YOND/SIDD_refine_pre_grumix")
    ap.add_argument("--shrink", default=None, choices=["on", "off"],
                    help="with --refine: noise-suppress the restored "
                         "residual in the à-trous domain before the "
                         "Wiener blend (pipeline/refine.py "
                         "shrink_residual_atrous). Default: on whenever "
                         "--refine is given (the round-5 product "
                         "config)")
    ap.add_argument("--shrink-full-alpha", type=float, default=1.0,
                    help="alpha above which the ramp hands back the raw "
                         "residual; >= 1.0 (default) = shrink "
                         "everywhere + full-weight coherent-structure "
                         "restore (the round-5 product scheme)")
    ap.add_argument("--shrink-lam", type=float, default=1.0,
                    help="à-trous shrink threshold scale (lower = "
                         "gentler, keeps more structure)")
    ap.add_argument("--shrink-mode", default="oriented",
                    choices=["iso", "oriented"],
                    help="shrink gain: 'iso' = isotropic empirical "
                         "Wiener, 'oriented' (default) = + orientation-"
                         "coherence structure gate (keeps strokes/edges "
                         "at the band noise floor)")
    ap.add_argument("--sigma-corr", default=None,
                    help="guidance scale: unset = the reference fixed "
                         "1.03, a float = that fixed value, 'adaptive' "
                         "= the measured blind rule (pipeline/denoiser"
                         ".py, artifact docs/sigma_corr_blind_r5.json)")
    ap.add_argument("--scene-filter", default=None,
                    help="with --heldout: comma-separated substring "
                         "filter on scene names (fast probe loops)")
    ap.add_argument("--denoiser", default="net", choices=["net", "bm3d"],
                    help="'bm3d' = the native two-stage BM3D in VST "
                         "space (host C++, yondx.native; reference "
                         "capability YOND_SIDD.py:272) instead of the "
                         "network — gives the oracle-validated kernels "
                         "a measured quality column")
    args = ap.parse_args()
    if (args.shrink == "on" or args.shrink_lam != 1.0
            or args.shrink_full_alpha != 1.0) and args.refine is None:
        ap.error("--shrink/--shrink-lam/--shrink-full-alpha require "
                 "--refine (they would be silently ignored)")
    args.shrink = (args.shrink == "on") if args.shrink is not None \
        else (args.refine is not None)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent XLA cache: the engine's graphs cost ~10 min of compiles
    # over the tunnel on a cold process (bench.py does the same)
    jax.config.update("jax_compilation_cache_dir", "/tmp/yondx_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.denoiser == "bm3d":
        from yondx.pipeline import BM3DVSTDenoiser
        den = BM3DVSTDenoiser(bias_corr="pre", vst_type="exact")
        log("denoiser: native BM3D (VST space)")
    else:
        arch = {"name": args.arch, "guided": True, "in_nc": 4,
                "out_nc": 4, "nf": args.nf, "nframes": 1, "res": True,
                "norm": True}
        if args.out_k is not None:
            arch["out_k"] = args.out_k
        if args.tail_nf is not None:
            arch["tail_nf"] = args.tail_nf
        model = build_model(arch, dtype=jnp.bfloat16 if args.bf16 else None)
        params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
        ck = find_checkpoint(args.ckpt_dir, args.model)
        if ck:
            params = load_checkpoint(ck, params)["params"]
            log(f"loaded {ck}")
        else:
            log("WARNING: random weights")

        sc = args.sigma_corr
        if sc is not None and sc != "adaptive":
            sc = float(sc)
        den = VSTDenoiser(model, params, guided=True, bias_corr="pre",
                          vst_type="exact", refine=args.refine is not None,
                          refine_floor=args.refine or "bucket",
                          refine_shrink=args.shrink,
                          refine_shrink_lam=args.shrink_lam,
                          refine_shrink_full_alpha=args.shrink_full_alpha,
                          refine_shrink_mode=args.shrink_mode,
                          sigma_corr=sc)
    est_models = {}
    extras = {}
    est_type = "simple"
    if args.est == "simple":
        extras["robust_nle"] = False
    elif args.est == "pge":
        est_type = "pge"
        earch = {"name": "est_UNet", "in_nc": 4, "out_nc": 2,
                 "nf": 16, "depth": 3}
        emodel = build_model(earch)
        eparams = init_params(emodel, jax.random.PRNGKey(1),
                              (1, 64, 64, 4), guided=False)
        eck = find_checkpoint(args.ckpt_dir, "EstPGE_d3nf16")
        assert eck, "--est pge needs the EstPGE_d3nf16 checkpoint"
        eparams = load_checkpoint(eck, eparams)["params"]

        def _est(raw, _m=emodel, _p=eparams):
            from yondx.isp import bayer2rggb
            x = bayer2rggb(jnp.asarray(raw, jnp.float32))
            if x.ndim == 3:
                x = x[None]
            out = np.asarray(_m.apply(_p, jnp.clip(x, 0.0, 1.0)))
            return out.mean(axis=0) if out.ndim == 2 else out

        est_models["est_net"] = _est
    eng = YONDEngine(den, PipelineConfig(est_type=est_type, max_iter=1,
                                         extras=extras),
                     biaslut=BiasLUT(), est_models=est_models)

    if args.heldout:
        from yondx.eval.heldout import run_heldout
        flt = (args.scene_filter.split(",")
               if args.scene_filter else None)
        rows = run_heldout(eng, suite=args.suite, scene_filter=flt)
        if args.json:
            import json
            with open(args.json, "w") as f:
                json.dump({"model": args.model, "arch": args.arch,
                           "refine": args.refine, "shrink": args.shrink,
                           "shrink_lam": args.shrink_lam,
                           "shrink_full_alpha": args.shrink_full_alpha,
                           "shrink_mode": args.shrink_mode,
                           "sigma_corr": args.sigma_corr,
                           "suite": args.suite,
                           "est": args.est, "rows": rows}, f, indent=1)
            log(f"wrote {args.json}")
        return

    stats = {0: [], 1: []}
    ssims = {0: [], 1: []}
    noisy_psnr = []
    for i in range(args.scenes):
        clean, noisy, K, sigma = make_scene(i, content=args.content)
        p = {"wp": 1023, "bl": 64, "ratio": 1, "scale": 959.0,
             "gain": 1.0, "sigma": 0.0}
        res = eng.iter_denoise({"lr": noisy}, p)
        noisy_psnr.append(float(psnr(noisy, clean)))
        for it, dn in enumerate(res["raw_dns"]):
            stats[it].append(float(psnr(dn, clean)))
            ssims[it].append(float(matlab_ssim(
                jnp.asarray(dn) * 255, jnp.asarray(clean) * 255)))
        K_est = res["regs"][0][0] * 959
        log(f"scene {i}: K={K:.2f} est={K_est:.2f} "
            f"noisy={noisy_psnr[-1]:.2f} "
            + " ".join(f"iter{it}={stats[it][-1]:.2f}"
                       for it in stats if stats[it]))
    log(f"noisy PSNR: {np.mean(noisy_psnr):.2f}")
    for it in stats:
        if stats[it]:
            log(f"Iter{it}: PSNR={np.mean(stats[it]):.2f}, "
                f"SSIM={np.mean(ssims[it]):.4f}")


if __name__ == "__main__":
    main()

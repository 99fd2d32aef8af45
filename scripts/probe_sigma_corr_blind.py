"""Blind-signal dissection for ADAPTIVE sigma_corr (round-4 verdict
Next #2).

probe_sigma_corr.py established that the optimal guidance scale is
content-dependent (0.90-1.25, +-0.3 dB) at the TRUE (K, sigma). The
product never sees the true parameters, so this probe sweeps sigma_corr
in the PRODUCT configuration (robust self-NLE estimate + bucket refine +
oriented shrink) and records, per held-out scene, the best corr next to
candidate BLIND predictors measured from the same inputs the pipeline
already computes:

- mad_ratio   sqrt(MAD-based variance / fit-based variance) at the scene
              mean intensity (robust NLE internals): < 1 flags a
              content-inflated fit (stroke/texture-dense scenes).
- clip_lo/hi  fraction of pixels within 2% of the black/white points
              (clipped noise changes the effective t response).
- nsr         the VST normalization width (noise level proxy).
- tex_q50     median texture statistic over the flat-mask field.

Output: one row per scene -> docs/sigma_corr_blind_r5.json; the rule
shipped in pipeline/denoiser.py must cite this artifact.

Run: python scripts/probe_sigma_corr_blind.py [--cpu] [--scenes ...]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="+", default=None,
                    help="default: every v1 scene + the v2 second seeds")
    ap.add_argument("--model", default="Gaussian_GRU_mix_1to50c_norm")
    ap.add_argument("--corrs", nargs="+", type=float,
                    default=[0.85, 0.90, 0.95, 1.00, 1.03, 1.08, 1.15,
                             1.25])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="docs/sigma_corr_blind_r5.json")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/yondx_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yondx.eval.heldout import SUITES, build_scene, WP, BL
    from yondx.eval.metrics import psnr
    from yondx.models import build_model
    from yondx.models.registry import init_params
    from yondx.pipeline import VSTDenoiser, YONDEngine, PipelineConfig
    from yondx.train.ckpt import find_checkpoint, load_checkpoint
    from yondx.vst.lut import BiasLUT
    from yondx.isp import bayer2rggb
    from yondx.nle.robust import mad_self_estimate
    from yondx.vst import vst

    arch = {"name": "GuidedResUnet", "guided": True, "in_nc": 4,
            "out_nc": 4, "nf": 32, "nframes": 1, "res": True, "norm": True}
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
    ck = find_checkpoint("checkpoints/Gaussian", args.model)
    assert ck, args.model
    params = load_checkpoint(ck, params)["params"]
    lut = BiasLUT()

    specs = {s.name: s for s in SUITES["v2"]}
    names = args.scenes or [s.name for s in SUITES["v2"]
                            if s.size == 512]
    rows = []
    for name in names:
        spec = specs[name]
        clean, noisy = build_scene(spec)
        p = {"wp": WP, "bl": BL, "ratio": 1, "scale": float(WP - BL),
             "gain": 1.0, "sigma": 0.0}
        den0 = VSTDenoiser(model, params, guided=True, bias_corr="pre",
                           vst_type="exact", refine=True,
                           refine_floor="bucket")
        eng = YONDEngine(den0, PipelineConfig(est_type="simple",
                                              max_iter=0), biaslut=lut)
        fit = eng._estimate_self(noisy)          # product self estimate
        scale = float(WP - BL)
        K = max(fit[0], 1e-4 / scale) * scale
        sig = float(np.sqrt(max(fit[1], 0.0))) * scale
        curve = lut.curve(K, sig)
        # blind signals
        rggb = bayer2rggb(jnp.asarray(noisy))
        mu = float(jnp.mean(jnp.clip(rggb, 0.0, 1.0)))
        mad = mad_self_estimate(rggb)
        v_fit = fit[0] * mu + fit[1]
        v_mad = float(mad[0]) * mu + float(mad[1])
        mad_ratio = float(np.sqrt(max(v_mad, 0.0)
                                  / max(v_fit, 1e-30)))
        clip_lo = float(jnp.mean(rggb < 0.02))
        clip_hi = float(jnp.mean(rggb > 0.98))
        lower = float(vst(jnp.zeros(()), sig, gain=K))
        upper = float(vst(jnp.full((), 1.0) * scale, sig, gain=K))
        nsr = 1.0 / (upper - lower)
        psnrs = []
        for corr in args.corrs:
            den = VSTDenoiser(model, params, guided=True, bias_corr="pre",
                              vst_type="exact", refine=True,
                              refine_floor="bucket")
            den.sigma_corr = corr
            dn = den(noisy, curve, K, sig, scale)
            psnrs.append(float(psnr(np.asarray(dn), clean)))
        best_i = int(np.argmax(psnrs))
        rows.append({
            "scene": name, "kind": spec.kind,
            "K_true": spec.K, "sigma_true": spec.sigma,
            "K_est": K, "sigma_est": sig,
            "mad_ratio": mad_ratio, "clip_lo": clip_lo,
            "clip_hi": clip_hi, "nsr": nsr,
            "corrs": args.corrs, "psnrs": psnrs,
            "best_corr": args.corrs[best_i],
            "gain_vs_103": psnrs[best_i]
            - psnrs[args.corrs.index(1.03)],
        })
        r = rows[-1]
        print(f"{name:13s} best={r['best_corr']:.2f} "
              f"(+{r['gain_vs_103']:.2f} dB vs 1.03) "
              f"mad_ratio={mad_ratio:.2f} clip=({clip_lo:.2f},"
              f"{clip_hi:.2f}) nsr={nsr:.4f}")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"model": args.model, "rows": rows}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

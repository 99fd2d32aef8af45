"""Dissect the refine alpha map on scenes where the net destroys
structure (satdisk_mid, glyphs_mid) vs scenes where it is near-oracle
(radial_mid, chart_anchor).

Question: with the CORRECT (bucket) noise floor, the Wiener weight
alpha = sigma_d^2/(sigma_d^2+N) under-restores destroyed structure
(local's too-low floor accidentally boosts alpha and wins +3.8 dB on
satdisk_mid). Is there an alpha -> alpha' transform that recovers that
win without hurting the near-oracle scenes? Candidates:
  gamma:  alpha' = alpha ** g                (boosts everything incl 0+)
  poly:   alpha' = min(1, alpha*(1+b*alpha)) (keeps small alpha small)

Run: python scripts/probe_alpha_boost.py [--cpu]
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
                    default=["satdisk_mid", "glyphs_mid", "radial_mid",
                             "chart_anchor", "ramp_mid", "bubbles_mid"])
    ap.add_argument("--model", default="Gaussian_GRU_mix_1to50c_norm")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/yondx_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yondx.eval.heldout import SUITES, build_scene, WP, BL
    from yondx.eval.metrics import psnr
    from yondx.isp import bayer2rggb, rggb2bayer
    from yondx.models import build_model
    from yondx.models.registry import init_params
    from yondx.nle.robust import self_nlf_robust
    from yondx.pipeline.refine import _bucket_noise_floor
    from yondx.nle.boxfilter import box_mean
    from yondx.pipeline import VSTDenoiser
    from yondx.train.ckpt import find_checkpoint, load_checkpoint
    from yondx.vst.lut import BiasLUT
    from yondx.vst import vst, inverse_vst
    from yondx.vst.lut import cheb_fit_curve, lookup_bias_curve_cheb

    arch = {"name": "GuidedResUnet", "guided": True, "in_nc": 4,
            "out_nc": 4, "nf": 32, "nframes": 1, "res": True, "norm": True}
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
    ck = find_checkpoint("checkpoints/Gaussian", args.model)
    params = load_checkpoint(ck, params)["params"]
    lut = BiasLUT()
    den = VSTDenoiser(model, params, guided=True, bias_corr="pre",
                      vst_type="exact")
    scale = float(WP - BL)
    specs = {s.name: s for s in SUITES["v2"]}

    for name in args.scenes:
        spec = specs[name]
        clean, noisy = build_scene(spec)
        rggb = bayer2rggb(jnp.asarray(noisy, jnp.float32))
        b1, b2 = (float(v) for v in self_nlf_robust(rggb, k=29))
        K = max(b1 * scale, 1e-4)
        sig = float(np.sqrt(max(b2, 0.0))) * scale
        curve = lut.curve(K, sig)
        # replicate the denoiser's z-space quantities
        x = rggb * scale
        z_noisy = vst(x, sig, gain=K)
        coeffs = cheb_fit_curve(curve)
        z_noisy = z_noisy - lookup_bias_curve_cheb(jnp.maximum(x, 0.0),
                                                   coeffs, K)
        lower = vst(jnp.zeros(()), sig, gain=K)
        upper = vst(jnp.full((), 1.0) * scale, sig, gain=K)
        nsr = float(1.0 / (upper - lower))
        z_noisy = (z_noisy - lower) * nsr
        dn_raw = den(noisy, curve, K, sig, scale)   # un-refined net output
        z_dn = (vst(bayer2rggb(jnp.asarray(dn_raw)) * scale, sig, gain=K)
                - lookup_bias_curve_cheb(
                    jnp.maximum(bayer2rggb(jnp.asarray(dn_raw)) * scale,
                                0.0), coeffs, K) - lower) * nsr

        N = _bucket_noise_floor(z_noisy, z_dn, nsr ** 2)
        r = z_noisy - z_dn
        local_pow = box_mean(r * r, 15)
        allowance = N * (1.0 + 2.0 * float(np.sqrt(2.0) / 15))
        sd2 = jnp.maximum(local_pow - allowance, 0.0)
        alpha = sd2 / (sd2 + N)
        a = np.asarray(alpha).reshape(-1)
        qs = np.percentile(a, [50, 90, 99])
        frac_hi = float((a > 0.5).mean())

        def finish(zz):
            zz = zz / nsr + lower
            xx = inverse_vst(zz, sig, gain=K, exact=False)
            return np.asarray(rggb2bayer(jnp.clip(xx / scale, 0.0, 1.0)))

        print(f"== {name}: alpha q50/90/99 = {qs[0]:.3f}/{qs[1]:.3f}/"
              f"{qs[2]:.3f}  frac>0.5 = {frac_hi:.3f}")
        base = None
        for tag, fn in [("wiener", lambda al: al),
                        ("poly b=1", lambda al: jnp.minimum(
                            1.0, al * (1 + 1.0 * al))),
                        ("poly b=2", lambda al: jnp.minimum(
                            1.0, al * (1 + 2.0 * al))),
                        ("poly b=4", lambda al: jnp.minimum(
                            1.0, al * (1 + 4.0 * al))),
                        ("hard>.3", lambda al: jnp.where(al > 0.3,
                                                         1.0, al))]:
            out = finish(z_dn + fn(alpha) * r)
            p = float(psnr(out, clean))
            if base is None:
                base = p
            print(f"   {tag:9s} psnr={p:6.2f} ({p - base:+.2f})")


if __name__ == "__main__":
    main()

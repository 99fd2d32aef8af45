"""Iteration-policy lab: what second-round rule actually beats it0?

Round-3 verdict (Next #2): on this stack it1 <= it0 on most held-out
scenes — the collab estimate is accurate (golden-gate-proven), so a
second pass at a slightly different (K, sigma) mostly re-rolls method
noise. probe_droop.py showed even the TRUE (K, sigma) droops on
radial_mid, i.e. the droop is a second-pass model property. This script
measures candidate ROUND-1 POLICIES per scene so the engine can ship one
that satisfies: it1 >= it0 - 0.05 dB everywhere AND it1 > it0 at
mid/high noise (reference iteration semantics, YOND_SIDD.py:419-467,
whose log gains +0.64 dB from the collab round).

Policies measured (all blind):
  collab   second pass at the robust collab estimate (current product)
  true     second pass at frozen GT (K, sigma)  [oracle diagnostic]
  avg      0.5*dn0 + 0.5*dn(collab)   (self-ensemble over estimates)
  wavg     precision-weighted: w*dn(collab) + (1-w)*dn0, w=0.5 unless
           the collab and self regs agree to <3% (then keep dn0)
  tboost   second pass at collab (K, sigma*1.05) — tests whether the
           net is under-guided at the accurate estimate
  avg_tb   0.5*dn0 + 0.5*dn(collab tboost)

Run: python scripts/probe_iter_policy.py [--cpu] [--scenes ...]
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
    ap.add_argument("--scenes", nargs="+", default=[
        "voronoi_mid", "radial_mid", "zone_mid", "glyphs_mid",
        "bubbles_mid", "ramp_mid", "satdisk_mid", "chart_anchor",
        "glyphs_lo", "zone_lo"])
    ap.add_argument("--model", default="Gaussian_GRU_mix_1to50c_norm")
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
    from yondx.nle.robust import collab_nlf_robust, self_nlf_robust
    from yondx.pipeline import VSTDenoiser
    from yondx.train.ckpt import find_checkpoint, load_checkpoint
    from yondx.vst.lut import BiasLUT

    arch = {"name": "GuidedResUnet", "guided": True, "in_nc": 4,
            "out_nc": 4, "nf": 32, "nframes": 1, "res": True, "norm": True}
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
    ck = find_checkpoint("checkpoints/Gaussian", args.model)
    assert ck, args.model
    params = load_checkpoint(ck, params)["params"]
    # product config: refine=local (the round-3 flagship ship config,
    # docs/heldout/r3_flagship_tpu.json) — the Wiener refinement rescues
    # ~10 dB on thin-stroke content, so policies MUST be measured with it
    den = VSTDenoiser(model, params, guided=True, bias_corr="pre",
                      vst_type="exact", refine=True, refine_floor="local")
    lut = BiasLUT()
    scale = float(WP - BL)

    def denoise(lr, K, sigma):
        """-> (refined output, raw net output) — collab NLE must see the
        raw one (engine contract)."""
        curve = lut.curve(max(K, 1e-4), sigma)
        out, raw = den.denoise_pair(jnp.asarray(lr, jnp.float32), curve,
                                    max(K, 1e-4), sigma, scale)
        return np.asarray(out), np.asarray(raw)

    specs = {s.name: s for s in HELDOUT_SCENES}
    table = {}
    for name in args.scenes:
        spec = specs[name]
        clean, noisy = build_scene(spec)
        rggb = bayer2rggb(jnp.asarray(noisy, jnp.float32))
        b1s, b2s = (float(v) for v in self_nlf_robust(rggb, k=29))
        K0, s0 = b1s * scale, float(np.sqrt(max(b2s, 0.0))) * scale
        dn0, dn0_raw = denoise(noisy, K0, s0)
        p0 = float(psnr(dn0, clean))
        rggb_dn = bayer2rggb(jnp.asarray(dn0_raw, jnp.float32))
        b1c, b2c = (float(v) for v in collab_nlf_robust(
            rggb, rggb_dn, k=29, self_reg=(b1s, b2s)))
        Kc = b1c * scale
        sc = float(np.sqrt(max(b2c, 0.0))) * scale
        dn_c, _ = denoise(noisy, Kc, sc)
        dn_t, _ = denoise(noisy, spec.K, spec.sigma)
        dn_tb, _ = denoise(noisy, Kc, sc * 1.05)
        # agreement between self and collab estimates (total-var proxy at
        # the scene's mean intensity)
        mu = float(np.mean(dn0_raw))   # engine uses the raw proxy's mean
        v_self = b1s * mu + b2s
        v_col = b1c * mu + b2c
        agree = abs(v_col - v_self) / max(v_self, 1e-12)
        pols = {
            "collab": dn_c,
            "true": dn_t,
            "avg": 0.5 * dn0 + 0.5 * dn_c,
            "wavg": dn0 if agree < 0.03 else 0.5 * dn0 + 0.5 * dn_c,
            "tboost": dn_tb,
            "avg_tb": 0.5 * dn0 + 0.5 * dn_tb,
        }
        row = {"noisy": float(psnr(noisy, clean)), "it0": p0,
               "agree": agree}
        for tag, dn in pols.items():
            row[tag] = float(psnr(dn, clean))
        table[name] = row
        log(f"{name:13s} noisy={row['noisy']:6.2f} it0={p0:6.2f} "
            f"agree={agree:5.3f} | " + " ".join(
                f"{t}={row[t] - p0:+.2f}" for t in pols))
    # summary: per-policy mean delta over mid scenes
    mids = [n for n in table if n.endswith("_mid")]
    for tag in ("collab", "true", "avg", "wavg", "tboost", "avg_tb"):
        d_all = [table[n][tag] - table[n]["it0"] for n in table]
        d_mid = [table[n][tag] - table[n]["it0"] for n in mids]
        log(f"policy {tag:7s} mean_delta all={np.mean(d_all):+.3f} "
            f"mid={np.mean(d_mid):+.3f} min={np.min(d_all):+.3f}")


if __name__ == "__main__":
    main()

"""Dissect WHERE the packed S2D net loses PSNR vs the flagship.

Hypothesis: space-to-depth processing is phase-INCONSISTENT — the 2x2
packing phases (and the bayer channels riding them) get slightly
different transfer functions, so smooth content (ramps, bubbles) picks
up grid-frequency artifacts that the full-res flagship does not have.
High-PSNR smooth scenes are exactly where such a floor dominates, which
matches the held-out gap profile (ramp_mid -7.25 dB, glyphs ~0).

For each scene, denoise one crop with BOTH nets at the TRUE (K, sigma)
and decompose the error e = dn - clean:
  - per-2x2-phase mean of e (a phase-DC offset -> d2s grid artifact);
  - low-frequency part: 2x2 box-filtered error energy;
  - grid part: e minus its 2x2 phase-mean-consistent version, i.e. the
    energy attributable to phase disagreement within each 2x2 cell;
  - PSNR of each net and PSNR of s2d AFTER forcing 2x2-phase-mean
    agreement with itself (replace each phase's DC by the cross-phase
    mean): if that alone recovers most of the gap, a cheap full-res
    output coupling fixes it.

Run: python scripts/probe_s2d_phase.py --cpu --scenes ramp_mid bubbles_mid
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def build_denoiser(arch_name, nf, model_name, out_k=None):
    from yondx.models import build_model
    from yondx.models.registry import init_params
    from yondx.pipeline import VSTDenoiser
    from yondx.train.ckpt import find_checkpoint, load_checkpoint
    arch = {"name": arch_name, "guided": True, "in_nc": 4, "out_nc": 4,
            "nf": nf, "nframes": 1, "res": True, "norm": True}
    if out_k:
        arch["out_k"] = out_k
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
    ck = find_checkpoint("checkpoints/Gaussian", model_name)
    assert ck, model_name
    params = load_checkpoint(ck, params)["params"]
    return VSTDenoiser(model, params, guided=True, bias_corr="pre",
                       vst_type="exact")


def phase_stats(err):
    """err: [H, W] bayer-domain error. Returns per-phase means and the
    decomposition energies (low, grid) in MSE units."""
    ph = [err[i::2, j::2] for i in (0, 1) for j in (0, 1)]
    means = [float(p.mean()) for p in ph]
    # 2x2 cell view: [H/2, W/2, 4]
    cells = np.stack([p for p in ph], axis=-1)
    cell_mean = cells.mean(-1, keepdims=True)
    grid = cells - cell_mean                     # within-cell disagreement
    return means, float((cell_mean ** 2).mean()), float((grid ** 2).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="+",
                    default=["ramp_mid", "bubbles_mid", "ramp_lo",
                             "voronoi_mid", "glyphs_mid"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/yondx_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yondx.core.logging import log
    from yondx.eval.heldout import HELDOUT_SCENES, build_scene, WP, BL
    from yondx.eval.metrics import psnr
    from yondx.vst.lut import BiasLUT

    flag = build_denoiser("GuidedResUnet", 32, "Gaussian_GRU_mix_1to50c_norm")
    s2d = build_denoiser("GuidedResUnetS2D", 64,
                         "Gaussian_GRUS2D3_mix_1to50c_norm", out_k=3)
    lut = BiasLUT()
    scale = float(WP - BL)
    specs = {s.name: s for s in HELDOUT_SCENES}

    for name in args.scenes:
        spec = specs[name]
        clean, noisy = build_scene(spec, n_crops=1)
        clean, noisy = clean[0], noisy[0]
        curve = lut.curve(spec.K, spec.sigma)
        outs = {}
        for tag, den in (("flag", flag), ("s2d", s2d)):
            dn = np.asarray(den(jnp.asarray(noisy[None], jnp.float32),
                                curve, spec.K, spec.sigma, scale))[0]
            outs[tag] = dn
        log(f"== {name} (K={spec.K}, sigma={spec.sigma}) "
            f"noisy={float(psnr(noisy, clean)):.2f}")
        for tag, dn in outs.items():
            err = dn - clean
            means, e_low, e_grid = phase_stats(err)
            p = float(psnr(dn, clean))
            log(f"  {tag:5s} psnr={p:6.2f}  phase_means="
                + " ".join(f"{m:+.2e}" for m in means)
                + f"  low_mse={e_low:.3e} grid_mse={e_grid:.3e} "
                f"grid_share={e_grid / (e_low + e_grid + 1e-30):.2f}")
        # counterfactual: force the s2d output's within-cell structure to
        # match the flagship's (keep s2d cell means, graft flag's grid part)
        for fix, donor in (("cellfix", "flag"),):
            e = outs["s2d"] - clean
            d = outs[donor] - clean
            ec = np.stack([e[i::2, j::2] for i in (0, 1) for j in (0, 1)], -1)
            dc = np.stack([d[i::2, j::2] for i in (0, 1) for j in (0, 1)], -1)
            hyb = ec.mean(-1, keepdims=True) + (dc - dc.mean(-1, keepdims=True))
            mse = float((hyb ** 2).mean())
            log(f"  s2d with {donor}'s grid part: psnr={-10*np.log10(mse):6.2f}"
                f"  (isolates the within-cell disagreement cost)")


if __name__ == "__main__":
    main()

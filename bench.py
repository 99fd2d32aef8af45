"""Benchmark: end-to-end blind raw denoise throughput on one chip.

Measures the COMPLETE YOND iteration — self NLE (stdfilt/threshold/fit),
device-side bias-LUT curve, VST, SNR-Net (GuidedResUnet nf=32, bf16
compute), exact-unbiased inverse, collaborative re-estimation and the
second denoise pass (max_iter=1, the reference's headline config) — on a
synthetic SIDD-like 4096x3072 (12.6 MP) Bayer frame, as ONE fused XLA
dispatch (yondx.pipeline.fused). The second denoise pass is ADAPTIVE
(pipeline/policy.py): the collab re-estimate always runs, but the pass
itself executes (lax.cond) only when its output would carry weight —
the directional rescue regime. On this frame the round-0 estimate is
accurate, the rescue correctly holds round 0, and the graph runs
2xNLE + 1x denoise; forcing the dead second pass (the pre-adaptive
graph) measured 81.7 MP/s at the same PSNR. Prints ONE JSON line:
  {"metric": ..., "value": MP/s, "unit": "MP/s", "vs_baseline": value/50}
vs_baseline is against the 50 MP/s/chip north star (BASELINE.json); the
reference implementation's measured equivalent is ~2.5 MP/s (40 scenes x
2.1 MP in ~3.5 min on one GPU, BASELINE.md) *for the same iter=1 pipeline*.
"""
from __future__ import annotations

import json
import time

import numpy as np


def make_frame(H=3072, W=4096, seed=7):
    """Synthetic SIDD-like noisy Bayer frame in [0,1] (PG noise)."""
    rng = np.random.default_rng(seed)
    levels = rng.random((12, 16)) * 0.7 + 0.05
    clean = np.kron(levels, np.ones((H // 12, W // 16))).astype(np.float32)
    K, sig, scale = 8.74, 12.81, 959.0
    electrons = clean * scale / K
    noisy = (K * rng.poisson(electrons) +
             rng.normal(0, sig, clean.shape)).astype(np.float32) / scale
    return np.clip(noisy, 0, 1), clean


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="s2dt16",
                    choices=["gru32", "s2d64", "s2dt16"],
                    help="s2dt16 (default) = GuidedResUnetS2D + full-res "
                         "tail, the shipped epoch-200 joint-distilled "
                         "artifact (held-out v1: 44.58 dB with the bucket "
                         "refine floor vs the gru32 flagship's 44.46, "
                         "do-no-harm PASS — docs/heldout/r4_*.json); "
                         "gru32 = reference-topology flagship")
    ap.add_argument("--refine", default="on", choices=["on", "off"],
                    help="method-noise Wiener refinement (bucket floor) "
                         "inside the fused graph — 'on' is the product "
                         "config; 'off' isolates its cost")
    ap.add_argument("--nle-max-px", type=int, default=None,
                    help="override the fused path's banded-NLE sample "
                         "budget (0 = full-frame moments, i.e. banding "
                         "off; default = the library default)")
    ap.add_argument("--sigma-corr", default="adaptive",
                    help="guidance scale: 'adaptive' (default, the "
                         "product config — blind per-frame rule, "
                         "pipeline/denoiser.py, v2 A/B +0.10/+0.12 dB "
                         "with no do-no-harm regressions) or a fixed "
                         "float (1.03 = reference parity)")
    ap.add_argument("--pallas-nle", default="off", choices=["on", "off"],
                    help="compute the NLE box statistics with the Pallas "
                         "band kernel (nle/pallas_ops.py, one HBM pass) "
                         "instead of the fused XLA conv path — hardware "
                         "A/B flag; 'off' (default) = the shipped XLA "
                         "path")
    ap.add_argument("--frames", type=int, default=1,
                    help="N > 1 = the multi-frame product path "
                         "(video/burst): N independent frames with "
                         "per-frame NLE, lax.map'd inside ONE dispatch "
                         "(fused batch_mode='frames') — peak HBM stays "
                         "at one frame's working set and the extra "
                         "frames amortize dispatch overhead")
    cli = ap.parse_args()
    import jax
    # persistent compilation cache: repeated bench runs skip the 20-40 s
    # tunnel compile
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/yondx_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from yondx.isp import bayer2rggb, rggb2bayer
    from yondx.models import build_model
    from yondx.models.registry import init_params
    from yondx.pipeline.fused import make_fused_blind_denoiser
    from yondx.vst.lut import BiasLUT
    from yondx.train.ckpt import find_checkpoint, load_checkpoint

    if cli.arch in ("s2d64", "s2dt16"):
        arch = {"name": "GuidedResUnetS2D", "guided": True, "in_nc": 4,
                "out_nc": 4, "nf": 64, "nframes": 1, "res": True,
                "norm": True, "out_k": 3}
        # the two-phase distillation ckpt (out_k=3 conv_out); s2dt16 adds
        # the zero-init full-res tail trained in the tail-only phase
        names = ["Gaussian_GRUS2D3_mix_1to50c_norm"]
        if cli.arch == "s2dt16":
            arch["tail_nf"] = 16
            names = ["Gaussian_GRUS2DT_mix_1to50c_norm"]
    else:
        arch = {"name": "GuidedResUnet", "guided": True, "in_nc": 4,
                "out_nc": 4, "nf": 32, "nframes": 1, "res": True,
                "norm": True}
        # flagship weights: the round-3 chroma + thin-stroke fine-tune
        # (chroma_aug raw-gain jitter + v6 stroke class; held-out suite
        # mean 40.41 -> 43.47 dB, do-no-harm 0 below input on all 14
        # scenes, chart anchor 36.15 -> 40.42 — docs/STATUS.md), falling
        # back to the earlier recipes
        names = ["Gaussian_GRU_mix_1to50c_norm",
                 "Gaussian_GRU_mix_1to50_norm",
                 "Gaussian_GRU_mix_5to50_norm"]
    # bf16 compute, fp32 params (MXU-native; PSNR impact is reported below)
    model = build_model(arch, dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
    ck = None
    for n in names:
        ck = find_checkpoint("checkpoints/Gaussian", n)
        if ck:
            break
    if ck:
        params = load_checkpoint(ck, params)["params"]
    lut = BiasLUT()

    kw = {}
    if cli.nle_max_px is not None:
        kw["nle_max_px"] = cli.nle_max_px or None
    # full PRODUCT config: robust NLE + method-noise Wiener refinement
    # (bucket floor) + the directional iteration policy, in ONE dispatch
    if cli.frames > 1:
        kw["batch_mode"] = "frames"
    kw["sigma_corr"] = cli.sigma_corr if cli.sigma_corr == "adaptive" \
        else float(cli.sigma_corr)
    if cli.pallas_nle == "on":
        kw["use_pallas_nle"] = True
    fused = make_fused_blind_denoiser(model, params, lut.lut, guided=True,
                                      bias_corr="pre", max_iter=1,
                                      refine=cli.refine == "on", **kw)

    noisy, clean = make_frame()
    H, W = noisy.shape
    mp = H * W / 1e6 * cli.frames
    rggb1 = jnp.asarray(bayer2rggb(jnp.asarray(noisy)))
    rggb = jnp.stack([rggb1] * cli.frames) if cli.frames > 1 \
        else rggb1[None]
    scale = jnp.float32(959.0)

    # warmup/compile
    dn, regs = fused(rggb, scale)
    jax.block_until_ready(dn)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        dn, regs = fused(rggb, scale)
        jax.block_until_ready(dn)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    value = mp / dt

    from yondx.eval import psnr
    out = np.asarray(rggb2bayer(dn[0]))
    p_in = float(psnr(noisy, clean))
    p_out = float(psnr(out, clean))
    regs = np.asarray(regs)
    k_est = float((regs[0, 0, 0] if cli.frames > 1 else regs[0, 0]) * 959)

    print(json.dumps({
        "metric": "fused blind Bayer denoise iter=1 "
                  "(2xNLE + adaptive 1-2x[VST+SNR-Net+iVST]) on "
                  + (f"{cli.frames}x" if cli.frames > 1 else "")
                  + f"{H * W / 1e6:.1f}MP frame"
                  + ("s" if cli.frames > 1 else "")
                  + f"; psnr {p_in:.2f}->{p_out:.2f}dB; "
                  f"K_est={k_est:.2f}",
        "value": round(value, 2),
        "unit": "MP/s",
        "vs_baseline": round(value / 50.0, 3),
    }))


if __name__ == "__main__":
    main()

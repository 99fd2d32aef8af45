"""Benchmark: end-to-end blind raw denoise throughput on one chip.

Measures the full YOND chain — self NLE (stdfilt/threshold/fit) + bias-LUT
VST + SNR-Net (GuidedResUnet nf=32) + exact-unbiased inverse — on a
synthetic full-resolution Bayer frame (SIDD-like 4096x3072 ~ 12.6 MP),
entirely on-device, and prints ONE JSON line:
  {"metric": ..., "value": MP/s, "unit": "MP/s", "vs_baseline": value/50}
vs_baseline is against the 50 MP/s/chip north star (BASELINE.json);
the reference implementation's measured equivalent is ~2.5 MP/s
(40 scenes x 2.1 MP in ~3.5 min on one GPU, BASELINE.md).
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
    import jax
    import jax.numpy as jnp
    from yondx.isp import bayer2rggb, rggb2bayer
    from yondx.models import build_model
    from yondx.models.registry import init_params
    from yondx.nle import self_nlf
    from yondx.pipeline import VSTDenoiser
    from yondx.vst.lut import BiasLUT

    arch = {"name": "GuidedResUnet", "guided": True, "in_nc": 4,
            "out_nc": 4, "nf": 32, "nframes": 1, "res": True, "norm": True}
    model = build_model(arch)
    # use trained weights when available, else random init (throughput is
    # weight-independent)
    from yondx.train.ckpt import find_checkpoint, load_checkpoint
    params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
    ck = find_checkpoint("checkpoints/Gaussian", "Gaussian_GRU_mix_5to50_norm")
    if ck:
        params = load_checkpoint(ck, params)["params"]
    den = VSTDenoiser(model, params, guided=True, bias_corr="pre",
                      vst_type="exact")
    lut = BiasLUT()

    noisy, clean = make_frame()
    H, W = noisy.shape
    mp = H * W / 1e6
    rggb = jnp.asarray(bayer2rggb(jnp.asarray(noisy)))

    def run_once():
        b1, b2 = self_nlf(rggb, k=29)
        b1 = float(b1)
        b2 = float(max(b2, 0.0))
        K = max(b1 * 959.0, 1e-4)
        sigma = float(np.sqrt(b2)) * 959.0
        curve = lut.curve(K, sigma)
        out = den.denoise_rggb(rggb[None], jnp.asarray(curve),
                               jnp.float32(K), jnp.float32(sigma),
                               jnp.float32(959.0))
        return jax.block_until_ready(out)[0]

    # warmup/compile
    out = run_once()
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = run_once()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    value = mp / dt

    # correctness sanity on the synthetic frame
    from yondx.eval import psnr
    dn_bayer = rggb2bayer(out)
    p_in = float(psnr(noisy, clean))
    p_out = float(psnr(np.asarray(dn_bayer), clean))

    print(json.dumps({
        "metric": "end-to-end blind Bayer denoise (selfNLE+VST+SNR-Net+iVST)"
                  f" on {mp:.1f}MP frame; psnr_gain={p_out - p_in:.2f}dB",
        "value": round(value, 2),
        "unit": "MP/s",
        "vs_baseline": round(value / 50.0, 3),
    }))


if __name__ == "__main__":
    main()

"""Benchmark matrix on the local chip: fused vs orchestrated, fp32 vs
bf16, XLA vs Pallas NLE — throughput + quality deltas on the 12.6 MP
synthetic frame. Informs bench.py defaults."""
import time

import numpy as np
import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as benchmod
from yondx.isp import bayer2rggb, rggb2bayer
from yondx.models import build_model
from yondx.models.registry import init_params
from yondx.pipeline.fused import make_fused_blind_denoiser
from yondx.vst.lut import BiasLUT
from yondx.train.ckpt import find_checkpoint, load_checkpoint
from yondx.eval import psnr

jax.config.update("jax_compilation_cache_dir", "/tmp/yondx_xla_cache")

ARCH = {"name": "GuidedResUnet", "guided": True, "in_nc": 4, "out_nc": 4,
        "nf": 32, "nframes": 1, "res": True, "norm": True}


def load(dtype):
    model = build_model(ARCH, dtype=dtype)
    params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
    ck = find_checkpoint("checkpoints/Gaussian",
                         "Gaussian_GRU_mix_5to50_norm")
    if ck:
        params = load_checkpoint(ck, params)["params"]
    return model, params


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    noisy, clean = benchmod.make_frame()
    mp = noisy.size / 1e6
    rggb = jnp.asarray(bayer2rggb(jnp.asarray(noisy)))
    lut = BiasLUT()
    p_in = float(psnr(noisy, clean))
    print(f"frame {mp:.1f}MP, noisy psnr {p_in:.2f}")

    results = {}
    for tag, dtype in (("fp32", None), ("bf16", jnp.bfloat16)):
        model, params = load(dtype)
        for nle_tag, use_pallas, th in (
                ("xla-sort", False, "sort"), ("xla-hist", False, "hist"),
                ("pallas-hist", True, "hist")):
            fused = make_fused_blind_denoiser(
                model, params, lut.lut, guided=True, max_iter=1,
                use_pallas_nle=use_pallas, th_impl=th)
            try:
                dt, (dn, regs) = timeit(
                    lambda r: fused(r, jnp.float32(959.0)), rggb[None])
            except Exception as e:
                print(f"{tag}/{nle_tag}: FAILED {type(e).__name__}: {e}")
                continue
            out = np.asarray(rggb2bayer(dn[0]))
            p_out = float(psnr(out, clean))
            results[(tag, nle_tag)] = (mp / dt, p_out)
            print(f"{tag}/{nle_tag}: {mp / dt:.1f} MP/s, "
                  f"psnr {p_in:.2f}->{p_out:.2f} "
                  f"(K_est={float(regs[0, 0]) * 959:.2f})")

    # orchestrated engine for comparison (fp32)
    from yondx.pipeline import VSTDenoiser, YONDEngine, PipelineConfig
    model, params = load(None)
    den = VSTDenoiser(model, params, guided=True, bias_corr="pre")
    eng = YONDEngine(den, PipelineConfig(est_type="simple", max_iter=1),
                     biaslut=lut)
    p = {"wp": 1023, "bl": 64, "ratio": 1, "scale": 959.0,
         "gain": 1.0, "sigma": 0.0}
    eng.iter_denoise({"lr": noisy}, dict(p))  # warmup
    t0 = time.perf_counter()
    res = eng.iter_denoise({"lr": noisy}, dict(p))
    dt = time.perf_counter() - t0
    p_out = float(psnr(res["raw_dns"][-1], clean))
    print(f"orchestrated fp32/xla: {mp / dt:.1f} MP/s, psnr -> {p_out:.2f}")


if __name__ == "__main__":
    main()

"""End-to-end probe for the rescue regime on clipped-dark content: run
the PRODUCT config (robust NLE + bucket refine + rescue policy) on
darkfield constructions and report it0/it1 PSNR + whether the rescue
fired. Complements scripts/probe_underest_scene.py (estimator-only).

Run (CPU): python scripts/probe_underest_e2e.py [--arch gru32]
"""
import argparse

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

WP, BL = 1023, 64
SCALE = WP - BL


def darkfield(rng, S=512, bright_frac=0.3, lev=0.45):
    img = np.full((S, S), 0.004, np.float32)
    area, tries = 0.0, 0
    while area < bright_frac and tries < 80:
        h, w = rng.integers(40, 140, 2)
        y, x = rng.integers(0, S - h), rng.integers(0, S - w)
        img[y:y + h, x:x + w] = lev * (0.6 + 0.8 * rng.random())
        area = float((img > 0.1).mean())
        tries += 1
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="gru32")
    cli = ap.parse_args()

    from yondx.models import build_model
    from yondx.models.registry import init_params
    from yondx.pipeline import VSTDenoiser, YONDEngine, PipelineConfig
    from yondx.train.ckpt import find_checkpoint, load_checkpoint
    from yondx.vst.lut import BiasLUT
    from yondx.eval import psnr

    arch = {"name": "GuidedResUnet", "guided": True, "in_nc": 4,
            "out_nc": 4, "nf": 32, "nframes": 1, "res": True, "norm": True}
    model = build_model(arch, dtype=jnp.bfloat16)
    params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
    ck = find_checkpoint("checkpoints/Gaussian", "Gaussian_GRU_mix_1to50c_norm")
    params = load_checkpoint(ck, params)["params"]
    den = VSTDenoiser(model, params, guided=True, bias_corr="pre",
                      vst_type="exact", refine=True, refine_floor="bucket")
    eng = YONDEngine(den, PipelineConfig(est_type="simple", max_iter=1),
                     biaslut=BiasLUT())

    rng = np.random.default_rng(7)
    for name, seed, bf, K, sigma in [
        ("darkclip_a", 3, 0.30, 3.0, 14.0),
        ("darkclip_b", 5, 0.25, 2.0, 20.0),
        ("darkclip_c", 9, 0.35, 4.0, 18.0),
        ("darkclip_d", 11, 0.20, 2.5, 24.0),
    ]:
        clean = darkfield(np.random.default_rng(seed), bright_frac=bf)
        electrons = np.clip(clean, 0, 1) * SCALE / K
        noisy = np.clip((K * rng.poisson(electrons)
                         + rng.normal(0, sigma, clean.shape)) / SCALE,
                        0, 1).astype(np.float32)
        p = {"wp": WP, "bl": BL, "ratio": 1, "scale": float(SCALE),
             "gain": 1.0, "sigma": 0.0}
        res = eng.iter_denoise({"lr": noisy}, p)
        p_n = float(psnr(noisy, clean))
        p0 = float(psnr(res["raw_dns"][0], clean))
        p1 = float(psnr(res["raw_dns"][-1], clean))
        r0, r1 = res["regs"][0], res["regs"][-1]
        b1t, b2t = K / SCALE, (sigma / SCALE) ** 2
        print(f"{name} K={K} sg={sigma}: noisy {p_n:.2f} it0 {p0:.2f} "
              f"it1 {p1:.2f} (d={p1 - p0:+.2f}) | "
              f"self=({r0[0]:.2e},{r0[1]:.2e}) "
              f"collab=({r1[0]:.2e},{r1[1]:.2e}) "
              f"true=({b1t:.2e},{b2t:.2e})", flush=True)


if __name__ == "__main__":
    main()

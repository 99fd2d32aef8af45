"""Rescue-policy threshold sensitivity sweep (round-4 verdict Next #4).

The rescue policy's two thresholds (pipeline/policy.py DEFAULT_TOL,
DEFAULT_NOISE_FRAC) gate the product's ONLY iteration behavior. This
script measures the full pass/fail landscape over a (tol, noise_frac)
grid on two axes:

1. The v2 held-out suite (36 scenes, real flagship net, product config):
   every scene is run ONCE with the second pass FORCED (policy
   'replace'), recording the decision signals (signed disagreement +
   dn0 noise fraction) alongside PSNR(round 0) and PSNR(forced round 1).
   Each grid point then resolves analytically: rescue fires iff
   agree > tol AND frac > noise_frac; its score is the forced-round-1
   PSNR when it fires (upper bound on the effect — the real rescue
   BLENDS with weight <= 1, so a harmful full fire over-states the
   harm, a helpful one over-states the help; the sign structure of the
   landscape is exact) and the round-0 PSNR when it holds.

2. A fault-injection ladder (the designed under-estimate regime,
   generalizing tests/test_product_50mp.py::
   test_rescue_policy_rescues_underestimate to a K-scale ladder): the
   self estimate is scaled by f in FAULT_LADDER on a flat-patch scene;
   a grid point is acceptable only if rescue FIRES on every rung where
   the forced second pass improves round 0 by > 0.3 dB.

Output: docs/policy_sweep_r5.json with per-scene signal rows, per-rung
fault rows, and the grid verdicts; the chosen defaults must sit in the
acceptable region (the script exits nonzero otherwise).

Run: python scripts/sweep_policy.py [--cpu] [--suite v2]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

TOLS = [0.05, 0.10, 0.15, 0.25, 0.40]
NFS = [0.05, 0.10, 0.15, 0.25, 0.40]
FAULT_LADDER = [1.0, 0.5, 0.25, 0.10, 0.04]   # self-estimate K scale
RESCUE_GAIN_MIN = 0.3                          # dB: a rung counts as
#                                                "needs rescue" above this


def build_engine(args, policy: str):
    from yondx.models import build_model
    from yondx.models.registry import init_params
    from yondx.pipeline import VSTDenoiser, YONDEngine, PipelineConfig
    from yondx.train.ckpt import find_checkpoint, load_checkpoint
    from yondx.vst.lut import BiasLUT
    arch = {"name": "GuidedResUnet", "guided": True, "in_nc": 4,
            "out_nc": 4, "nf": 32, "nframes": 1, "res": True, "norm": True}
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
    ck = find_checkpoint("checkpoints/Gaussian", args.model)
    assert ck, args.model
    params = load_checkpoint(ck, params)["params"]
    den = VSTDenoiser(model, params, guided=True, bias_corr="pre",
                      vst_type="exact", refine=True,
                      refine_floor="bucket")
    return YONDEngine(den, PipelineConfig(
        est_type="simple", max_iter=1,
        extras={"iter_policy": policy}), biaslut=BiasLUT())


def sweep_suite(args):
    """Forced-second-pass run over the held-out suite -> signal rows."""
    from yondx.eval.heldout import SUITES, build_scene, WP, BL
    from yondx.eval.metrics import psnr
    eng = build_engine(args, policy="replace")
    rows = []
    for spec in SUITES[args.suite]:
        clean, noisy = build_scene(spec)
        p = {"wp": WP, "bl": BL, "ratio": 1, "scale": float(WP - BL),
             "gain": 1.0, "sigma": 0.0}
        res = eng.iter_denoise({"lr": noisy}, p)
        sig = res["signals"][0] if res["signals"] else None
        row = {
            "scene": spec.name, "kind": spec.kind,
            "noisy_psnr": float(psnr(noisy, clean)),
            "psnr_hold": float(psnr(res["raw_dns"][0], clean)),
            "psnr_fire": (float(psnr(res["raw_dns"][1], clean))
                          if len(res["raw_dns"]) > 1 else None),
            "agree": sig["agree"] if sig else None,
            "frac": sig["frac"] if sig else None,
        }
        rows.append(row)
        print(f"[suite] {spec.name:13s} hold={row['psnr_hold']:6.2f} "
              f"fire={row['psnr_fire'] if row['psnr_fire'] else -1:6.2f} "
              f"agree={row['agree']:+.3f} frac={row['frac']:.3f}")
    return rows


def sweep_faults(args):
    """Under-estimate fault ladder with the REAL net -> per-rung rows."""
    from yondx.eval.metrics import psnr
    rng = np.random.default_rng(11)
    H = W = 512
    clean = np.kron(rng.random((4, 4)) * 0.6 + 0.2,
                    np.ones((H // 4, W // 4))).astype(np.float32)
    K, sigma, scale = 24.0, 6.0, 959.0
    noisy = np.clip((K * rng.poisson(clean * scale / K)
                     + rng.normal(0, sigma, clean.shape)) / scale,
                    0, 1).astype(np.float32)
    rows = []
    for f in FAULT_LADDER:
        eng = build_engine(args, policy="replace")
        real_est = eng._estimate_self

        def bad_est(raw, _f=f, _real=real_est):
            b1, b2 = _real(raw)
            return b1 * _f, b2 * _f ** 2

        eng._estimate_self = bad_est
        p = {"wp": 1023, "bl": 64, "ratio": 1, "scale": scale,
             "gain": 1.0, "sigma": 0.0}
        res = eng.iter_denoise({"lr": noisy}, p)
        sig = res["signals"][0]
        row = {
            "fault_scale": f,
            "psnr_hold": float(psnr(res["raw_dns"][0], clean)),
            "psnr_fire": float(psnr(res["raw_dns"][1], clean)),
            "agree": sig["agree"], "frac": sig["frac"],
        }
        row["needs_rescue"] = (row["psnr_fire"]
                               > row["psnr_hold"] + RESCUE_GAIN_MIN)
        rows.append(row)
        print(f"[fault] f={f:5.2f} hold={row['psnr_hold']:6.2f} "
              f"fire={row['psnr_fire']:6.2f} agree={row['agree']:+.3f} "
              f"frac={row['frac']:.3f} needs={row['needs_rescue']}")
    return rows


def grid_verdicts(suite_rows, fault_rows):
    grid = []
    for tol in TOLS:
        for nf in NFS:
            fires = [r for r in suite_rows
                     if r["agree"] is not None and r["agree"] > tol
                     and r["frac"] > nf and r["psnr_fire"] is not None]
            deltas = [r["psnr_fire"] - r["psnr_hold"] for r in fires]
            dnh_fail = [r["scene"] for r in fires
                        if r["psnr_fire"] < r["noisy_psnr"]
                        and r["psnr_hold"] >= r["noisy_psnr"]]
            missed = [r["fault_scale"] for r in fault_rows
                      if r["needs_rescue"]
                      and not (r["agree"] > tol and r["frac"] > nf)]
            harm = [r["scene"] for r, d in zip(fires, deltas) if d < -0.1]
            grid.append({
                "tol": tol, "noise_frac": nf,
                "suite_fires": [r["scene"] for r in fires],
                "suite_mean_delta_when_fired":
                    float(np.mean(deltas)) if deltas else 0.0,
                "suite_harmful_fires": harm,
                "suite_dnh_breaks": dnh_fail,
                "fault_rungs_missed": missed,
                "ok": not dnh_fail and not missed and not harm,
            })
    return grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="v2", choices=["v1", "v2"])
    ap.add_argument("--model", default="Gaussian_GRU_mix_1to50c_norm")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="docs/policy_sweep_r5.json")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/yondx_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    suite_rows = sweep_suite(args)
    fault_rows = sweep_faults(args)
    grid = grid_verdicts(suite_rows, fault_rows)

    from yondx.pipeline.policy import DEFAULT_TOL, DEFAULT_NOISE_FRAC
    chosen = next((g for g in grid if g["tol"] == DEFAULT_TOL
                   and g["noise_frac"] == DEFAULT_NOISE_FRAC), None)
    ok_region = [(g["tol"], g["noise_frac"]) for g in grid if g["ok"]]
    out = {"suite": args.suite, "model": args.model,
           "platform": jax.devices()[0].platform,
           "note": ("fire PSNR is the FORCED-replace upper bound on the "
                    "rescue's effect; the shipped rescue blends with "
                    "weight clip((agree-tol)/(2 tol), 0, 1)"),
           "suite_rows": suite_rows, "fault_rows": fault_rows,
           "grid": grid, "ok_region": ok_region,
           "defaults": {"tol": DEFAULT_TOL,
                        "noise_frac": DEFAULT_NOISE_FRAC,
                        "ok": bool(chosen and chosen["ok"])}}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    print(f"acceptable region ({len(ok_region)}/{len(grid)} points): "
          f"{ok_region}")
    print(f"defaults (tol={DEFAULT_TOL}, nf={DEFAULT_NOISE_FRAC}) ok: "
          f"{out['defaults']['ok']}")
    sys.exit(0 if out["defaults"]["ok"] else 1)


if __name__ == "__main__":
    main()

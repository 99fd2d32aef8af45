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
   a grid point is acceptable only if rescue FIRES on every FAULTED
   rung (f < 1) where the forced second pass improves round 0 by
   > 0.3 dB. The f = 1.0 rung is the CONTROL: no fault is injected, so
   the policy's design is to hold round 0 + refine there (the first
   sweep run measured the control's forced fire at +0.31 dB on this one
   scene — within the probe-to-probe spread of a second net pass and
   exactly the "accurate second pass forfeits the refine ensemble"
   regime the directional policy is built on, pipeline/policy.py top
   docstring), and a grid point is NOT penalized for holding it.

The first run of this sweep (round 5) retired the dn0-based
noise-fraction gate: its ordering was wrong with a real net (fault
rungs 0.006-0.12 vs impostor scenes 0.15-2.5 — an under-guided net
still cleans the flattest cells, leaving its error at edges). The gate
axis is now `input_floor_frac` (floor(lr)^2 / v_self, a
certified-under-estimate signal; see pipeline/policy.py and
scripts/probe_floor_discriminator.py).

Output: docs/policy_sweep_r5.json with per-scene signal rows, per-rung
fault rows, and the grid verdicts; the chosen defaults must sit in the
acceptable region (the script exits nonzero otherwise).

Run: python scripts/sweep_policy.py [--cpu] [--suite v2]
 or: python scripts/sweep_policy.py --regrid docs/policy_sweep_r5.json
     (recompute the grid from an existing artifact's hold/fire PSNRs —
     those don't depend on the gate signal — plus freshly computed
     ffrac per row, which needs no denoiser: scenes + NLE only)
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
FFS = [1.1, 1.3, 1.5, 2.0, 3.0]               # input_floor_frac gate
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
            "ffrac": sig["ffrac"] if sig else None,
        }
        rows.append(row)
        print(f"[suite] {spec.name:13s} hold={row['psnr_hold']:6.2f} "
              f"fire={row['psnr_fire'] if row['psnr_fire'] else -1:6.2f} "
              f"agree={row['agree']:+.3f} frac={row['frac']:.3f} "
              f"ffrac={row['ffrac']:.3f}")
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
            "ffrac": sig["ffrac"],
        }
        # f = 1.0 is the CONTROL rung (no injected fault): the policy's
        # design holds round 0 + refine there, so it carries no
        # must-fire requirement (see module docstring)
        row["needs_rescue"] = f < 1.0 and (
            row["psnr_fire"] > row["psnr_hold"] + RESCUE_GAIN_MIN)
        rows.append(row)
        print(f"[fault] f={f:5.2f} hold={row['psnr_hold']:6.2f} "
              f"fire={row['psnr_fire']:6.2f} agree={row['agree']:+.3f} "
              f"frac={row['frac']:.3f} ffrac={row['ffrac']:.3f} "
              f"needs={row['needs_rescue']}")
    return rows


def grid_verdicts(suite_rows, fault_rows):
    grid = []
    for tol in TOLS:
        for ff in FFS:
            fires = [r for r in suite_rows
                     if r["agree"] is not None and r["agree"] > tol
                     and r["ffrac"] > ff and r["psnr_fire"] is not None]
            deltas = [r["psnr_fire"] - r["psnr_hold"] for r in fires]
            dnh_fail = [r["scene"] for r in fires
                        if r["psnr_fire"] < r["noisy_psnr"]
                        and r["psnr_hold"] >= r["noisy_psnr"]]
            missed = [r["fault_scale"] for r in fault_rows
                      if r["needs_rescue"]
                      and not (r["agree"] > tol and r["ffrac"] > ff)]
            harm = [r["scene"] for r, d in zip(fires, deltas) if d < -0.1]
            grid.append({
                "tol": tol, "floor_frac": ff,
                "suite_fires": [r["scene"] for r in fires],
                "suite_mean_delta_when_fired":
                    float(np.mean(deltas)) if deltas else 0.0,
                "suite_harmful_fires": harm,
                "suite_dnh_breaks": dnh_fail,
                "fault_rungs_missed": missed,
                "ok": not dnh_fail and not missed and not harm,
            })
    return grid


def _compute_ffrac(lr, reg):
    """input_floor_frac from scene bytes + NLE only (no denoiser) —
    must mirror yondx.pipeline.engine._input_floor_frac."""
    from yondx.isp.bayer import bayer2rggb
    from yondx.nle.robust import flat_floor_stats
    rggb = bayer2rggb(jnp.asarray(lr, jnp.float32))
    fl, mu_mid = flat_floor_stats(rggb)
    v_self = reg[0] * float(mu_mid) + max(reg[1], 0.0)
    return float(fl) ** 2 / max(v_self, 1e-30)


def regrid(args):
    """Recompute the grid of an existing artifact under the ffrac gate.

    The hold/fire PSNRs and agree signals are gate-independent (the
    artifact ran policy='replace', which always fires), so only ffrac
    needs computing — scenes + self NLE, no net, seconds on CPU."""
    from yondx.eval.heldout import SUITES, build_scene
    from yondx.nle.robust import self_nlf_robust
    from yondx.isp.bayer import bayer2rggb
    with open(args.regrid) as f:
        art = json.load(f)
    specs = {s.name: s for s in SUITES[art["suite"]]}
    for row in art["suite_rows"]:
        _, lr = build_scene(specs[row["scene"]])
        reg = self_nlf_robust(bayer2rggb(jnp.asarray(lr, jnp.float32)))
        row["ffrac"] = _compute_ffrac(lr, (float(reg[0]), float(reg[1])))
    # the fault scene construction must match sweep_faults exactly
    rng = np.random.default_rng(11)
    H = W = 512
    clean = np.kron(rng.random((4, 4)) * 0.6 + 0.2,
                    np.ones((H // 4, W // 4))).astype(np.float32)
    K, sigma, scale = 24.0, 6.0, 959.0
    noisy = np.clip((K * rng.poisson(clean * scale / K)
                     + rng.normal(0, sigma, clean.shape)) / scale,
                    0, 1).astype(np.float32)
    reg = self_nlf_robust(bayer2rggb(jnp.asarray(noisy, jnp.float32)))
    b1, b2 = float(reg[0]), float(reg[1])
    for row in art["fault_rows"]:
        f = row["fault_scale"]
        row["ffrac"] = _compute_ffrac(noisy, (b1 * f, b2 * f * f))
        row["needs_rescue"] = f < 1.0 and (
            row["psnr_fire"] > row["psnr_hold"] + RESCUE_GAIN_MIN)
    return art["suite_rows"], art["fault_rows"], art


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="v2", choices=["v1", "v2", "v3"])
    ap.add_argument("--model", default="Gaussian_GRU_mix_1to50c_norm")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--regrid", default=None,
                    help="path to an existing sweep artifact: recompute "
                         "ffrac + the grid without re-running the "
                         "denoiser (see module docstring)")
    ap.add_argument("--out", default="docs/policy_sweep_r5.json")
    args = ap.parse_args()
    if args.cpu or args.regrid:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/yondx_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.regrid:
        suite_rows, fault_rows, art = regrid(args)
        args.suite = art["suite"]
        args.model = art["model"]
        platform = art.get("platform", "cpu") + "+regrid"
    else:
        suite_rows = sweep_suite(args)
        fault_rows = sweep_faults(args)
        platform = jax.devices()[0].platform
    grid = grid_verdicts(suite_rows, fault_rows)

    from yondx.pipeline.policy import DEFAULT_TOL, DEFAULT_FLOOR_FRAC
    chosen = next((g for g in grid if g["tol"] == DEFAULT_TOL
                   and g["floor_frac"] == DEFAULT_FLOOR_FRAC), None)
    ok_region = [(g["tol"], g["floor_frac"]) for g in grid if g["ok"]]
    out = {"suite": args.suite, "model": args.model,
           "platform": platform,
           "note": ("fire PSNR is the FORCED-replace upper bound on the "
                    "rescue's effect; the shipped rescue blends with "
                    "weight clip((agree-tol)/(2 tol), 0, 1); gate axis "
                    "= input_floor_frac (pipeline/policy.py)"),
           "suite_rows": suite_rows, "fault_rows": fault_rows,
           "grid": grid, "ok_region": ok_region,
           "defaults": {"tol": DEFAULT_TOL,
                        "floor_frac": DEFAULT_FLOOR_FRAC,
                        "ok": bool(chosen and chosen["ok"])}}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    print(f"acceptable region ({len(ok_region)}/{len(grid)} points): "
          f"{ok_region}")
    print(f"defaults (tol={DEFAULT_TOL}, ff={DEFAULT_FLOOR_FRAC}) ok: "
          f"{out['defaults']['ok']}")
    sys.exit(0 if out["defaults"]["ok"] else 1)


if __name__ == "__main__":
    main()

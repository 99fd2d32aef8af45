"""YOND iterative engine: self-calibration -> VST denoise -> collaborative
re-calibration -> denoise again.

Rebuild of `IterDenoise` (reference YOND_SIDD.py:301-483) with the same
pipeline-config surface (the YAML `pipeline:` block: full_est / est_type /
k / full_dn / vst_type / bias_corr / denoiser_type / iter / max_iter) and
the same algorithmic guards:
- beta2 < 0 in a collab round -> fall back to beta1^2 (:438-440);
- beta1 < 0 -> abort iteration, keep the round-0 result (:445-447).

Data layout: crops are a leading batch dim [N, H, W] (bayer) throughout —
the reference's strip-concat / re-split gymnastics (:315, :354, :460) exist
only because cv2/bm3d want single 2-D images. One jitted call denoises the
whole crop batch.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from ..core.logging import log
from ..isp import bayer2rggb, rot_bayer
from ..nle import self_nlf, collab_nlf
from ..vst.lut import BiasLUT, FULL_X_GRID
from .denoiser import VSTDenoiser, SimpleDenoiser


@dataclasses.dataclass
class PipelineConfig:
    """The YAML `pipeline:` block (reference runfiles/YOND/*.yml:10-22)."""
    full_est: bool = True
    est_type: str = "simple+full"
    k: int = 29
    full_dn: bool = False
    vst_type: str = "exact"
    bias_corr: Optional[str] = "pre"
    denoiser_type: str = "gru32n"
    iter: str = "iter"
    max_iter: int = 1
    clip: bool = False
    data_type: str = "SIDD"
    cal_est: Optional[str] = None
    extras: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "PipelineConfig":
        d = dict(d)
        if d.get("bias_corr") == "none":
            d["bias_corr"] = None
        fields = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in d.items() if k in fields}
        known["extras"] = {k: v for k, v in d.items() if k not in fields}
        return cls(**known)


class YONDEngine:
    """Orchestrates NLE + denoise rounds for one scene.

    Parameters
    ----------
    denoiser : VSTDenoiser (the jitted NLE->net chain)
    pipe : PipelineConfig
    biaslut : BiasLUT or None (None -> curves computed on demand; the LUT
        is strongly recommended — reference regenerates per image otherwise,
        get_bias YOND_SIDD.py:254-259)
    est_models : optional dict of ('est_self'/'est_collab'/'est_net') ->
        callable(raw)->reg for the neural-NLE est_types.
    """

    def __init__(self, denoiser: VSTDenoiser, pipe: PipelineConfig,
                 biaslut: Optional[BiasLUT] = None,
                 est_models: Optional[Dict[str, Any]] = None,
                 logfile: Optional[str] = None):
        self.denoiser = denoiser
        self.pipe = pipe
        self.biaslut = biaslut or BiasLUT()
        self.est_models = est_models or {}
        self.logfile = logfile

    # ---------------------------------------------------------------- NLE
    def _estimate_self(self, raw_bayer) -> tuple:
        """Self NLE on a bayer frame or crop stack (est_type 'simple').

        With `robust_nle` (pipeline extras, default on) the flat-mask fit
        is cross-checked against the wavelet-MAD estimator (nle/robust.py)
        — identical on reference-like content, 5-50x better on content
        with no flat regions."""
        rggb = bayer2rggb(jnp.asarray(raw_bayer, jnp.float32))
        if self.pipe.extras.get("robust_nle", True):
            from ..nle.robust import self_nlf_robust
            b1, b2 = self_nlf_robust(rggb, k=self.pipe.k)
        else:
            b1, b2 = self_nlf(rggb, k=self.pipe.k)
        return float(b1), float(b2)

    def _estimate_collab(self, lr_bayer, dn_bayer, self_reg=None) -> tuple:
        rggb_lr = bayer2rggb(jnp.asarray(lr_bayer, jnp.float32))
        rggb_dn = bayer2rggb(jnp.asarray(dn_bayer, jnp.float32))
        if self.pipe.extras.get("robust_nle", True):
            from ..nle.robust import collab_nlf_robust
            b1, b2 = collab_nlf_robust(rggb_lr, rggb_dn, k=self.pipe.k,
                                       self_reg=self_reg)
        else:
            b1, b2 = collab_nlf(rggb_lr, rggb_dn, k=self.pipe.k)
        return float(b1), float(b2)

    def _file_based_est(self, data, img_id: int, p) -> tuple:
        """Precomputed-estimator dispatch (reference YOND_SIDD.py:316-337):
        'cal_est' -> pkl record (per-camera beta polynomials vs ISO or
        per-(camera,iso) points); 'foi'/'liu' -> .mat 'return_params';
        'zou'/'pge' -> .npy rows. Paths come from pipeline extras / the
        dataset root dir."""
        import pickle as pkl
        pipe = self.pipe
        root = data.get("root_dir", "")
        if "cal_est" in getattr(pipe, "est_type", "") or \
                getattr(pipe, "cal_est", None):
            path = getattr(pipe, "cal_est", None) or data["cal_est"]
            with open(path, "rb") as f:
                record = pkl.load(f)
            name = data["name"]
            ct, iso = name.split("_")[2], int(name.split("_")[3])
            key = f"{ct}_{iso:05d}"
            if key in record["sfrn"]:
                return tuple(record["sfrn"][key])
            return (float(np.poly1d(record["beta1"][ct])(iso)),
                    float(np.poly1d(record["beta2"][ct])(iso)))
        base = os.path.join(root, "SIDD_Validation_Raw")
        if "foi" in pipe.est_type or "liu" in pipe.est_type:
            import scipy.io as sio
            tag = "FoiEst" if "foi" in pipe.est_type else "LiuEst"
            reg = sio.loadmat(
                os.path.join(base, f"{tag}_fullPict.mat"))["return_params"][
                img_id]
            return float(reg[0]), float(reg[1])
        if "zou" in pipe.est_type:
            reg = np.load(os.path.join(base, "Zou_fullPict.npy"))[img_id]
            return float(reg[0]), float(reg[1])
        # 'pge' from file: reg[1] is sigma, squared to beta2 (:330-337)
        reg = np.load(os.path.join(base, "PGE_fullPict.npy"))[img_id]
        return float(reg[0]), float(reg[1]) ** 2

    # ------------------------------------------------------------ denoise
    def _denoise_round(self, lr, p, hr=None):
        """One denoise pass over the crop batch / frame.

        Returns (output, raw_net_output): they differ only for a refining
        VSTDenoiser — the raw one feeds the next round's CollabNLF
        (reference contract: the collab proxy is the net's own output,
        YOND_SIDD.py:89-115)."""
        # shot gain can self-estimate to ~0 on pure-Gaussian content; the
        # VST divides by it (isp_algos.py:9), so clamp defensively.
        p["gain"] = max(p["gain"], 1e-4)
        curve = self.biaslut.curve(p["gain"], p["sigma"]) \
            if self.pipe.bias_corr else np.zeros(len(FULL_X_GRID), np.float32)
        x = jnp.asarray(lr, jnp.float32)
        if "rot_cfa" in p:
            x = rot_bayer(x, p["cfa"])
        pair = getattr(self.denoiser, "denoise_pair", None)
        if pair is not None:
            dn, dn_raw = pair(x, curve, p["gain"], p["sigma"], p["scale"])
        else:
            dn = self.denoiser(x, curve, p["gain"], p["sigma"], p["scale"])
            dn_raw = dn
        if "rot_cfa" in p:
            dn = rot_bayer(dn, p["cfa"], rev=True)
            dn_raw = rot_bayer(dn_raw, p["cfa"], rev=True)
        return dn, dn_raw

    def _dn0_noise_frac(self, dn_raw_bayer, collab_reg, mu: float) -> float:
        """Blind noise-floor measurement ON the round-0 raw output, as a
        fraction of the collab noise model. TELEMETRY ONLY since round 5:
        the threshold sweep (docs/policy_sweep_r5.json) showed this
        signal's ordering is wrong with a real net (see
        pipeline/policy.py docstring); the rescue gate now uses
        `_input_floor_frac`. Kept in the `signals` rows so production
        logs retain the dn0-residual view."""
        from ..nle.robust import mad_noise_floor
        rggb = bayer2rggb(jnp.asarray(dn_raw_bayer, jnp.float32))
        floor = float(mad_noise_floor(rggb))
        v_col = collab_reg[0] * mu + collab_reg[1]
        return floor ** 2 / max(v_col, 1e-30)

    def _input_floor_frac(self, lr_bayer, self_reg) -> float:
        """Certified-under-estimate confidence: the content-free
        low-quantile noise floor of the NOISY INPUT measured against
        the self noise model, as a variance ratio. The floor is a
        LOWER bound on the true noise level — content can only inflate
        it — so ffrac >> 1 proves the self estimate sat below the
        frame's own noise; on content-inflated impostor scenes
        (glyphs, clipped ramps) the self estimate is inflated by the
        same content and the ratio stays ~<= 1. The model is evaluated
        at the floor's own mid-tone mean intensity (flat_floor_stats:
        the global mean breaks on nearly-black frames). Probed
        landscape: scripts/probe_floor_discriminator.py. Rescue-policy
        gate, pipeline/policy.py DEFAULT_FLOOR_FRAC."""
        from ..nle.robust import flat_floor_stats
        rggb = bayer2rggb(jnp.asarray(lr_bayer, jnp.float32))
        floor, mu_mid = flat_floor_stats(rggb)
        v_self = self_reg[0] * float(mu_mid) + max(self_reg[1], 0.0)
        return float(floor) ** 2 / max(v_self, 1e-30)

    # -------------------------------------------------------------- main
    def iter_denoise(self, data: Dict[str, Any], p: Dict[str, Any],
                     img_id: int = 0) -> Dict[str, Any]:
        """Run the full iterative pipeline for one scene.

        data: {'lr': [N,H,W] or [H,W] bayer in [0,1], optional 'hr',
               optional 'lr_full' (full-res frame for full_est),
               optional 'name', 'cfa'}.
        p: {'wp','bl','ratio','scale', optional 'cfa','rot_cfa'}.
        Returns {'raw_dns': [round0, round1, ...] (np arrays, same shape as
        lr), 'regs': [(beta1,beta2), ...]}.
        """
        pipe = self.pipe
        lr = np.asarray(data["lr"], np.float32)
        regs: List[tuple] = []
        signals: List[dict] = []

        # ---- Round 1: self-calibration
        if pipe.full_est:
            if "manual" in pipe.est_type:
                reg = (p["gain"] / (p["wp"] - p["bl"]),
                       (p["sigma"] / (p["wp"] - p["bl"])) ** 2)
            elif "simple" in pipe.est_type or "ours" in pipe.est_type:
                # NOTE 'ours' (NeuralNLF) in the public reference snapshot
                # has the same body as SimpleNLF — the est nets in the
                # setting dict go unused (YOND_SIDD.py:127-134 vs :117-124)
                raw4est = data.get("lr_full", lr)
                reg = self._estimate_self(raw4est)
            elif "pge" in pipe.est_type and "est_net" in self.est_models:
                reg = self.est_models["est_net"](lr)
                reg = (float(reg[0]), float(reg[1]) ** 2)
            elif any(t in pipe.est_type for t in
                     ("cal_est", "foi", "liu", "zou", "pge")):
                reg = self._file_based_est(data, img_id, p)
            else:
                raise NotImplementedError(
                    f"est_type {pipe.est_type!r} needs precomputed files "
                    "(foi/liu/zou) or an est_net")
            p["gain"] = reg[0] * (p["wp"] - p["bl"])
            p["sigma"] = float(np.sqrt(max(reg[1], 0.0))) * (p["wp"] - p["bl"])
            log(f"Self Est: K={p['gain']:.4f}, b={p['sigma']:.4f} "
                f"(beta1={reg[0]:.3e}, beta2={reg[1]:.3e})",
                logfile=self.logfile)
        else:
            # per-crop estimation without full_est is the deprecated
            # Simple_Denoiser path (reference :368-378)
            simple = SimpleDenoiser(self.denoiser.model, self.denoiser.params,
                                    guided=False,
                                    pad_base=self.denoiser.pad_base)
            dn = np.asarray(simple(jnp.asarray(lr)))
            return {"raw_dns": [dn], "regs": [(0.0, 0.0)]}
        regs.append(reg)

        dn, dn_raw = self._denoise_round(lr, p)
        dn, dn_raw = np.asarray(dn), np.asarray(dn_raw)
        raw_dns = [dn.copy()]

        # ---- Rounds 2..max_iter: collaborative re-calibration
        if pipe.iter == "iter":
            from .policy import (combine_rounds, reg_agreement,
                                 DEFAULT_POLICY, DEFAULT_TOL,
                                 DEFAULT_FLOOR_FRAC)
            policy = pipe.extras.get("iter_policy", DEFAULT_POLICY)
            tol = float(pipe.extras.get("iter_policy_tol", DEFAULT_TOL))
            ff_tol = float(pipe.extras.get("iter_policy_floor_frac",
                                           DEFAULT_FLOOR_FRAC))
            # computed for every policy: cheap next to a denoise pass,
            # and the signal rows feed scripts/sweep_policy.py (which
            # records signals under policy='replace')
            ffrac = self._input_floor_frac(lr, regs[0])
            for epoch in range(1, pipe.max_iter + 1):
                reg = self._estimate_collab(lr, dn_raw, self_reg=regs[0])
                if reg[1] < 0:
                    log(f"Warning!!! b={reg[1]:.4f} is backup to "
                        f"{reg[0] ** 2:.4f}", logfile=self.logfile)
                    reg = (reg[0], reg[0] ** 2)
                p["gain"] = reg[0] * (p["wp"] - p["bl"])
                p["sigma"] = float(np.sqrt(reg[1])) * (p["wp"] - p["bl"])
                log(f"Iter {epoch} Est: K={p['gain']:.4f}, "
                    f"sigma={p['sigma']:.4f} (beta1={reg[0]:.3e}, "
                    f"beta2={reg[1]:.3e})", logfile=self.logfile)
                if reg[0] < 0:
                    log("Warning!!! Wrong noise level! Backup to iter_0 "
                        "result.", logfile=self.logfile)
                    break
                prev, prev_raw = dn, dn_raw
                mu = float(np.mean(prev_raw))
                agree = float(reg_agreement(regs[-1], reg, mu))
                # dn0 frac is telemetry only (see _dn0_noise_frac); it
                # is cheap next to a denoise pass and the signal rows
                # feed the sweep artifact (scripts/sweep_policy.py)
                frac = self._dn0_noise_frac(prev_raw, reg, mu)
                # rescue's blend weight is exactly 0 unless collab signals
                # an under-estimate AND the input's noise floor certifies
                # the self model was low — skip the dead second denoise
                # pass (output identical; mirrors the lax.cond in
                # pipeline/fused.py)
                fire = policy != "rescue" or (
                    agree > tol and ffrac > ff_tol)
                if fire:
                    dn, dn_raw = self._denoise_round(lr, p, hr=dn)
                    dn, dn_raw = np.asarray(dn), np.asarray(dn_raw)
                    dn = np.asarray(combine_rounds(
                        prev, dn, agree, policy=policy, tol=tol,
                        floor_frac=ffrac if policy == "rescue"
                        else None, floor_frac_tol=ff_tol))
                log(f"Iter {epoch} policy={policy} "
                    f"disagree={agree:+.3f} (tol {tol})"
                    + (f" input_floor_frac={ffrac:.3f} ({ff_tol})"
                       if ffrac is not None else "")
                    + f" dn0_noise_frac={frac:.3f}"
                    + ("" if fire else " [second pass skipped]"),
                    logfile=self.logfile)
                raw_dns.append(dn.copy())
                regs.append(reg)
                signals.append({"agree": agree, "frac": frac,
                                "ffrac": ffrac, "fired": bool(fire)})

        return {"raw_dns": raw_dns, "regs": regs, "signals": signals}

    def iter_denoise_tiled(self, data: Dict[str, Any], p: Dict[str, Any],
                           tile: int = 1024, halo: int = 64,
                           batch: int = 8) -> Dict[str, Any]:
        """Full iterative pipeline on ONE huge frame via the overlap-tiled
        runner (reference full_dn semantics, YOND_SIDD.py:391-467): NLE on
        the WHOLE frame, denoise tiled, collab NLE on the whole (noisy,
        round-0 raw) pair, tiled second pass, same guards + iteration
        policy as iter_denoise. This is the 12-50 MP product path on one
        chip; the multi-chip analog is parallel.product.

        data: {'lr': [H, W] bayer in [0, 1]}; p as in iter_denoise.
        """
        from .runner import TiledRunner
        from .policy import (combine_rounds, reg_agreement,
                             DEFAULT_POLICY, DEFAULT_TOL)
        pipe = self.pipe
        lr = np.asarray(data["lr"], np.float32)
        if "rot_cfa" in p:
            lr = np.asarray(rot_bayer(jnp.asarray(lr), p["cfa"]))
        runner = TiledRunner(self.denoiser, tile=tile, halo=halo,
                             batch=batch)

        def one_pass(frame, pp):
            pp["gain"] = max(pp["gain"], 1e-4)
            curve = self.biaslut.curve(pp["gain"], pp["sigma"]) \
                if pipe.bias_corr else np.zeros(len(FULL_X_GRID),
                                                np.float32)
            return runner.run_pair(frame, curve, pp["gain"], pp["sigma"],
                                   pp["scale"])

        reg = self._estimate_self(lr)
        p["gain"] = reg[0] * (p["wp"] - p["bl"])
        p["sigma"] = float(np.sqrt(max(reg[1], 0.0))) * (p["wp"] - p["bl"])
        log(f"Self Est (tiled frame): K={p['gain']:.4f}, "
            f"b={p['sigma']:.4f} (beta1={reg[0]:.3e}, beta2={reg[1]:.3e})",
            logfile=self.logfile)
        regs: List[tuple] = [reg]
        signals: List[dict] = []
        dn, dn_raw = one_pass(lr, p)
        raw_dns = [dn.copy()]

        if pipe.iter == "iter":
            policy = pipe.extras.get("iter_policy", DEFAULT_POLICY)
            tol = float(pipe.extras.get("iter_policy_tol", DEFAULT_TOL))
            from .policy import DEFAULT_FLOOR_FRAC
            ff_tol = float(pipe.extras.get("iter_policy_floor_frac",
                                           DEFAULT_FLOOR_FRAC))
            ffrac = self._input_floor_frac(lr, regs[0])
            for epoch in range(1, pipe.max_iter + 1):
                reg = self._estimate_collab(lr, dn_raw, self_reg=regs[0])
                if reg[1] < 0:
                    log(f"Warning!!! b={reg[1]:.4f} is backup to "
                        f"{reg[0] ** 2:.4f}", logfile=self.logfile)
                    reg = (reg[0], reg[0] ** 2)
                p["gain"] = reg[0] * (p["wp"] - p["bl"])
                p["sigma"] = float(np.sqrt(reg[1])) * (p["wp"] - p["bl"])
                log(f"Iter {epoch} Est (tiled): K={p['gain']:.4f}, "
                    f"sigma={p['sigma']:.4f} (beta1={reg[0]:.3e}, "
                    f"beta2={reg[1]:.3e})", logfile=self.logfile)
                if reg[0] < 0:
                    log("Warning!!! Wrong noise level! Backup to iter_0 "
                        "result.", logfile=self.logfile)
                    break
                prev, prev_raw = dn, dn_raw
                mu = float(np.mean(prev_raw))
                agree = float(reg_agreement(regs[-1], reg, mu))
                frac = self._dn0_noise_frac(prev_raw, reg, mu)
                # same dead-pass skip as iter_denoise / fused.py
                fire = policy != "rescue" or (
                    agree > tol and ffrac > ff_tol)
                if fire:
                    dn, dn_raw = one_pass(lr, p)
                    dn = np.asarray(combine_rounds(
                        prev, dn, agree, policy=policy, tol=tol,
                        floor_frac=ffrac if policy == "rescue"
                        else None, floor_frac_tol=ff_tol))
                raw_dns.append(dn.copy())
                regs.append(reg)
                signals.append({"agree": agree, "frac": frac,
                                "ffrac": ffrac, "fired": bool(fire)})

        if "rot_cfa" in p:
            raw_dns = [np.asarray(rot_bayer(jnp.asarray(d), p["cfa"],
                                            rev=True)) for d in raw_dns]
        return {"raw_dns": raw_dns, "regs": regs, "signals": signals}

"""Fused VST denoiser: one jit for scale -> bias -> VST -> normalize ->
network -> un-normalize -> inverse VST -> rescale.

Reference semantics (VST_Denoiser, YOND_SIDD.py:250-299):
- work in DN units x*scale, scale = (wp-bl)/ratio;
- bias map from the 2-D LUT at (x e-, sigma e-), subtracted *before*
  denoising when bias_corr='pre' (:261-262);
- normalize VST output to [0,1] by [VST(0), VST(scale)]; the guidance
  scalar t = nsr * sigma_corr where nsr = 1/(upper-lower) and
  sigma_corr=1.03 for the 'pre' path (:283-288);
- inverse is exact-unbiased only when no bias correction was applied and
  vst_type='exact' (:296-297).

All hyper-parameters that change the graph (bias_corr, guided, exact) are
Python-static; (K, sigma, scale) are traced scalars and the bias curve is a
traced [2177] array, so one compilation serves every image and iteration.
"""
from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp

from ..isp import bayer2rggb, rggb2bayer
from ..vst import vst, inverse_vst, lookup_bias_curve
from ..vst.lut import cheb_fit_curve, lookup_bias_curve_cheb

from ..core.tiling import pad_to_multiple, unpad

# ---- adaptive sigma_corr rule (round 5, VERDICT r4 Next #2) ---------
# Thresholds measured in docs/sigma_corr_blind_r5.json (33 scenes x 8
# corr values, product config, real flagship net): the optimal guidance
# scale is content-dependent over 0.85-1.25 (oracle +0.24 dB vs the
# fixed 1.03). The shipped rule reads three blind signals the pipeline
# already computes and lands at +0.15 dB mean, worst scene -0.11 dB:
#  - noise band (nsr, the VST normalization width): low-noise scenes
#    keep 1.03; mid-noise scenes (where the refine stage can cleanly
#    restore over-smoothed structure) take 1.08; high-noise scenes
#    (restoration is noise-limited, over-smoothing loses real signal;
#    every nsr>0.09 scene preferred <=1.08) take 1.00.
#  - clip fraction: heavy black/white clipping biases the patch-
#    statistics NLE low (clipped pixels carry compressed noise), so the
#    net runs under-guided — the largest measured gains (+0.4..+1.2 dB:
#    saturated disks, radial sweeps, the chart anchor) come from
#    boosting to 1.25 there.
#  - MAD/fit agreement: the boost is gated on the two independent
#    estimators agreeing (|ratio-1| < 0.04) — on gradient-dominated
#    scenes (ramps) the fit is inflated rather than deflated and the
#    boost backfires (ramp_lo2 measured -0.75 dB at 1.25).
# Reference parity note: the reference hardcodes 1.03
# (YOND_SIDD.py:283-288); pass sigma_corr=1.03 for exact parity.
ADAPTIVE_CORR_NSR_LO = 0.025
ADAPTIVE_CORR_NSR_HI = 0.09
ADAPTIVE_CORR_CLIP = 0.25
ADAPTIVE_CORR_MAD_DEV = 0.04
ADAPTIVE_CORR_VALUES = (1.03, 1.08, 1.00, 1.25)   # lo, mid, hi, clip


def adaptive_sigma_corr(rggb, K, sigma, scale):
    """Blind per-frame guidance scale (jit-safe; see rule notes above).

    rggb: [..., H, W, 4] in [0, 1]; K, sigma in DN units; scale = wp-bl.
    Returns a float32 scalar in {1.00, 1.03, 1.08, 1.25}. Precedence
    (matching the measured grid search): hi-noise > clip-boost >
    lo-noise > mid default.
    """
    from ..nle.robust import mad_self_estimate
    c_lo, c_mid, c_hi, c_clip = ADAPTIVE_CORR_VALUES
    lower = vst(jnp.zeros(()), sigma, gain=K)
    upper = vst(jnp.full((), 1.0) * scale, sigma, gain=K)
    nsr = 1.0 / (upper - lower)
    clip_frac = jnp.mean((rggb < 0.02) | (rggb > 0.98))
    mu = jnp.mean(jnp.clip(rggb, 0.0, 1.0))
    v_fit = (K / scale) * mu + (sigma / scale) ** 2
    m1, m2 = mad_self_estimate(rggb)
    v_mad = m1 * mu + m2
    madr = jnp.sqrt(jnp.maximum(v_mad, 0.0)
                    / jnp.maximum(v_fit, 1e-30))
    corr = jnp.where(nsr < ADAPTIVE_CORR_NSR_LO, c_lo, c_mid)
    boost = (clip_frac > ADAPTIVE_CORR_CLIP) \
        & (jnp.abs(madr - 1.0) < ADAPTIVE_CORR_MAD_DEV)
    corr = jnp.where(boost, c_clip, corr)
    corr = jnp.where(nsr > ADAPTIVE_CORR_NSR_HI, c_hi, corr)
    return jnp.float32(corr)


class VSTDenoiser:
    """Callable wrapper holding (model, params) and the static pipe config.

    __call__(lr_bayer [B,H,W] or [H,W], curve [2177], K, sigma, scale)
    -> denoised bayer, same shape, clipped to [0,1].
    """

    def __init__(self, model, params, *, guided: bool = True,
                 bias_corr: Optional[str] = "pre", vst_type: str = "exact",
                 pad_base: int = 32, fbi: bool = False,
                 refine: bool = False, refine_k: int = 15,
                 refine_beta: float = 1.0, refine_floor: str = "bucket",
                 refine_shrink: bool = True, refine_shrink_lam: float = 1.0,
                 refine_shrink_full_alpha: float = 1.0,
                 refine_shrink_mode: str = "oriented",
                 sigma_corr=None):
        """fbi=True selects the blind-spot-network variant (reference
        YOND_SIDD.py:266-279): normalization by the VST output's own
        min/max instead of [VST(0), VST(scale)], and the network consumes
        the 1-channel bayer mosaic rather than packed RGGB planes."""
        self.model = model
        self.params = params
        self.guided = guided
        self.bias_corr = bias_corr
        self.vst_type = vst_type
        self.pad_base = pad_base
        self.fbi = fbi
        self.refine = refine
        self.refine_k = refine_k
        self.refine_beta = refine_beta
        self.refine_floor = refine_floor
        self.refine_shrink = refine_shrink
        self.refine_shrink_lam = refine_shrink_lam
        self.refine_shrink_full_alpha = refine_shrink_full_alpha
        self.refine_shrink_mode = refine_shrink_mode
        # sigma_corr: None -> reference default (1.03 for the 'pre'
        # bias path, YOND_SIDD.py:283-288); a float -> that fixed
        # value; 'adaptive' -> the measured per-frame rule
        # (adaptive_sigma_corr above, docs/sigma_corr_blind_r5.json)
        if sigma_corr is None:
            sigma_corr = 1.03 if bias_corr == "pre" else 1.00
        self.sigma_corr = sigma_corr
        self.exact_inverse = bias_corr is None and vst_type == "exact"
        self._jit = jax.jit(self._denoise)
        # override entry: corr as a traced scalar (one graph serves all
        # values — used by TiledRunner's frame-level adaptive corr)
        self._jit_corr = jax.jit(self._denoise_core)

    def _net(self, z, nsr, corr):
        """Pad to /pad_base, run the model on clipped input, unpad."""
        zp, p2d = pad_to_multiple(z, self.pad_base)
        zin = jnp.clip(zp, 0.0, 1.0)
        if self.guided:
            t = jnp.broadcast_to(nsr * corr, (zin.shape[0],))
            out = self.model.apply(self.params, zin, t)
        else:
            out = self.model.apply(self.params, zin)
        out = jnp.clip(out, 0.0, 1.0)
        return unpad(out, p2d)

    def _denoise(self, lr_rggb, curve, K, sigma, scale):
        # 'adaptive' resolves IN-GRAPH from the call's own pixels: for
        # whole-frame / scene-batch calls the statistics pool over
        # exactly one scene (the right scope). Tiled runners must NOT
        # let each tile batch re-read the rule (seam risk when batches
        # straddle the clip threshold) — they compute the frame-level
        # corr once and pass it through denoise_pair(corr=...), which
        # routes to _denoise_core directly.
        corr = adaptive_sigma_corr(lr_rggb, K, sigma, scale) \
            if self.sigma_corr == "adaptive" else self.sigma_corr
        return self._denoise_core(lr_rggb, curve, K, sigma, scale, corr)

    def _denoise_core(self, lr_rggb, curve, K, sigma, scale, corr):
        x = lr_rggb * scale
        z = vst(x, sigma, gain=K)
        if self.bias_corr == "pre":
            coeffs = cheb_fit_curve(curve)
            z = z - lookup_bias_curve_cheb(jnp.maximum(x, 0.0), coeffs, K)
        if self.fbi:
            lower = jnp.min(z)
            upper = jnp.max(z)
        else:
            lower = vst(jnp.zeros(()), sigma, gain=K)
            upper = vst(jnp.full((), 1.0) * scale, sigma, gain=K)
        nsr = 1.0 / (upper - lower)
        z = (z - lower) * nsr
        if self.fbi:
            bay = rggb2bayer(z)[..., None]        # [B, H, W, 1]
            out = self.model.apply(self.params, jnp.clip(bay, 0.0, 1.0))
            z = bayer2rggb(jnp.clip(out, 0.0, 1.0)[..., 0])
            z_raw = z
        else:
            z_noisy = z
            z = self._net(z, nsr, corr)
            z_raw = z
            if self.refine:
                # method-noise Wiener blend (do-no-harm; see refine.py).
                # noise std in these normalized coords = nsr; the denoised
                # map doubles as the saturation-guard intensity proxy.
                from .refine import wiener_refine
                z = wiener_refine(z, z_noisy, noise_var=nsr ** 2,
                                  k=self.refine_k, beta=self.refine_beta,
                                  x01=z, noise_floor=self.refine_floor,
                                  residual_shrink=self.refine_shrink,
                                  shrink_lam=self.refine_shrink_lam,
                                  shrink_full_alpha=(
                                      self.refine_shrink_full_alpha),
                                  shrink_mode=self.refine_shrink_mode)

        def finish(zz):
            zz = zz * (upper - lower) + lower
            xx = inverse_vst(zz, sigma, gain=K, exact=self.exact_inverse)
            return jnp.clip(xx / scale, 0.0, 1.0)

        # the raw (un-refined) output rides along: the collaborative NLE
        # of the next round must see the net's own output (reference
        # CollabNLF contract, YOND_SIDD.py:89-115) — the refined one has
        # the method-noise residual blended back, which inflates
        # stdfilt(dn) and destabilizes the round-2 fit (measured: it1
        # below it0 on 4 held-out scenes before this split)
        return finish(z), finish(z_raw)

    def __call__(self, lr_bayer, curve, K, sigma, scale):
        return self.denoise_pair(lr_bayer, curve, K, sigma, scale)[0]

    def denoise_pair(self, lr_bayer, curve, K, sigma, scale, corr=None):
        """-> (output, raw_net_output) bayer pair; they differ only when
        refine=True (the engine feeds the raw one to CollabNLF).
        corr: optional guidance-scale override (traced scalar — see
        _denoise); None = the instance's sigma_corr policy."""
        single = lr_bayer.ndim == 2
        if single:
            lr_bayer = lr_bayer[None]
        rggb = bayer2rggb(jnp.asarray(lr_bayer))
        args = (rggb, jnp.asarray(curve, jnp.float32),
                jnp.float32(K), jnp.float32(sigma), jnp.float32(scale))
        if corr is None:
            out, raw = self._jit(*args)
        else:
            out, raw = self._jit_corr(*args, jnp.float32(corr))
        out, raw = rggb2bayer(out), rggb2bayer(raw)
        return (out[0], raw[0]) if single else (out, raw)

    def denoise_rggb(self, rggb, curve, K, sigma, scale):
        """Packed-plane entry point (already [B, h, w, 4])."""
        return self._jit(rggb, jnp.asarray(curve, jnp.float32),
                         jnp.float32(K), jnp.float32(sigma),
                         jnp.float32(scale))[0]


class BM3DVSTDenoiser:
    """Host BM3D in VST space (reference VST_Denoiser bm3d branch,
    YOND_SIDD.py:266-272): normalize the VST output by its own min/max,
    run block-matching 3-D hard-threshold denoising at sigma = nsr, invert.
    Device ops (VST, bias, inverse) still run on the accelerator; only the
    BM3D core is host C++ (yondx.native)."""

    def __init__(self, *, bias_corr: Optional[str] = "pre",
                 vst_type: str = "exact"):
        from .. import native
        assert native.available(), "native kernels required for bm3d"
        self._bm3d = native.bm3d
        self.bias_corr = bias_corr
        self.exact_inverse = bias_corr is None and vst_type == "exact"
        self.model = None
        self.params = None
        self.pad_base = 1

    def __call__(self, lr_bayer, curve, K, sigma, scale):
        import numpy as np
        single = lr_bayer.ndim == 2
        if single:
            lr_bayer = lr_bayer[None]
        rggb = bayer2rggb(jnp.asarray(lr_bayer))
        x = rggb * scale
        z = vst(x, sigma, gain=K)
        if self.bias_corr == "pre":
            bias = lookup_bias_curve(jnp.maximum(x, 0.0),
                                     jnp.asarray(curve, jnp.float32), K)
            z = z - bias
        z_np = np.asarray(z)
        lower, upper = float(z_np.min()), float(z_np.max())
        nsr = 1.0 / max(upper - lower, 1e-8)
        zn = (z_np - lower) * nsr
        out = np.stack([self._bm3d(zn[b], 1.0 * nsr)
                        for b in range(zn.shape[0])])
        z = jnp.asarray(out) * (upper - lower) + lower
        xd = inverse_vst(z, sigma, gain=K, exact=self.exact_inverse)
        bayer = rggb2bayer(jnp.clip(xd / scale, 0.0, 1.0))
        return bayer[0] if single else bayer


class SimpleDenoiser:
    """Non-VST path (reference Simple_Denoiser, YOND_SIDD.py:238-248):
    clamp -> net -> clamp on packed planes."""

    def __init__(self, model, params, *, guided: bool = False,
                 pad_base: int = 32):
        self.model = model
        self.params = params
        self.guided = guided
        self.pad_base = pad_base
        self._jit = jax.jit(self._denoise)

    def _denoise(self, rggb, t):
        zp, p2d = pad_to_multiple(rggb, self.pad_base)
        zin = jnp.clip(zp, 0.0, 1.0)
        if self.guided:
            out = self.model.apply(self.params, zin,
                                   jnp.broadcast_to(t, (zin.shape[0],)))
        else:
            out = self.model.apply(self.params, zin)
        return unpad(jnp.clip(out, 0.0, 1.0), p2d)

    def __call__(self, lr_bayer, t=0.0):
        single = lr_bayer.ndim == 2
        if single:
            lr_bayer = lr_bayer[None]
        rggb = bayer2rggb(jnp.asarray(lr_bayer))
        out = self._jit(rggb, jnp.float32(t))
        bayer = rggb2bayer(out)
        return bayer[0] if single else bayer

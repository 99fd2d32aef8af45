"""Fully-fused blind denoiser: the whole YOND iteration in ONE jit.

The orchestrated engine (yondx.pipeline.engine) mirrors the reference's
host-side control flow: NLE scalars come back to the host, the bias curve
is built there, guards branch in Python. That costs 4+ device round-trips
per image. This module fuses everything:

    rggb -> self NLE -> (K, sigma) [device scalars]
         -> bias curve from the device-resident 2-D LUT (sg row blend +
            closed-form extension, all traced)
         -> VST denoise round 0
         -> collaborative NLE -> guards as lax selects
         -> VST denoise round 1 (selected against round 0 on guard failure)

One dispatch, zero host syncs; the iteration guards (reference
YOND_SIDD.py:438-447) become arithmetic selects — the rare aborted
iteration wastes one denoise pass but keeps the graph static.

This is the throughput path (bench.py) and the one-call "ANY camera" API.
"""
from __future__ import annotations


from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..nle.threshold import score3_threshold_with_p25
from ..nle.fit import masked_linefit, nonsat_weights
from ..vst import vst, inverse_vst
from ..vst.lut import cheb_fit_curve, lookup_bias_curve_cheb
from ..vst.lut import X_LUT, SG_LUT, SG_EXT, X_EXT, FULL_X_GRID
from ..vst.lut import load_sgext_lut
from ..core.tiling import pad_to_multiple, unpad


def _close_form_bias_jnp(lam, sg):
    """Foi TIP-13 closed-form bias, electron domain (isp_algos.py:84-96)."""
    y_hat = lam + 3.0 / 8.0 + sg ** 2
    m1 = (lam + sg ** 2) / y_hat ** 2
    m2 = lam / y_hat ** 3
    m3 = (lam + 3.0 * (lam + sg ** 2) ** 2) / y_hat ** 4
    return 2.0 * jnp.sqrt(y_hat) * (-m1 / 8.0 + m2 / 16.0 - 5.0 * m3 / 128.0)


def device_bias_curve(lut, K, sigma, lut_sgext=None):
    """Traced bias curve over FULL_X_GRID from the device-resident 2-D LUT.

    sg = sigma/K: in [0,10] -> fractional-index blend of two sg columns of
    the main table; in (10, 160] -> blend of two columns of the exact
    sg-extension table (lut_sgext, matching the host's out-of-range exact
    separable evaluation, isp_algos.py:204-212); beyond 160 e- (or with no
    extension table) -> closed-form. Extension past 2^10 e- in x is
    closed-form as on the host.
    """
    sg = sigma / K
    pos = jnp.where(sg < 1.0, sg / 0.005, 200.0 + (sg - 1.0) / 0.01)
    pos = jnp.clip(pos, 0.0, len(SG_LUT) - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, len(SG_LUT) - 1)
    w = pos - lo
    base = lut[:, lo] * (1.0 - w) + lut[:, hi] * w
    oor = _close_form_bias_jnp(jnp.asarray(X_LUT), sg)
    if lut_sgext is not None:
        # log-spaced extension grid: analytic fractional index
        epos = (jnp.log(jnp.maximum(sg, 10.0)) - np.log(10.0)) \
            / (np.log(160.0) - np.log(10.0)) * (len(SG_EXT) - 1)
        epos = jnp.clip(epos, 0.0, len(SG_EXT) - 1)
        elo = jnp.floor(epos).astype(jnp.int32)
        ehi = jnp.minimum(elo + 1, len(SG_EXT) - 1)
        ew = epos - elo
        ext_col = lut_sgext[:, elo] * (1.0 - ew) + lut_sgext[:, ehi] * ew
        oor = jnp.where(sg <= SG_EXT[-1], ext_col, oor)
    base = jnp.where(sg <= SG_LUT[-1], base, oor)
    ext = _close_form_bias_jnp(jnp.asarray(X_EXT), sg)
    return jnp.concatenate([base, ext]).astype(jnp.float32)


def _nlf_core(var, mean, texture, step: int, th_impl: str = "sort",
              th_subsample=None):
    if th_subsample is None:
        # auto: exact on small scenes (engine parity), strided threshold
        # selection on multi-MP frames (the sort + segment_min are ~60% of
        # NLE time there; a strided subsample of millions of samples
        # shifts the selected percentile by O(1e-3) quantile — far below
        # the 5%-step candidate grid). The middle tier covers the banded
        # moment fields of `_band_plan` (2-8M samples).
        th_subsample = 1 if texture.size < 2_000_000 else \
            (4 if texture.size < 8_000_000 else 8)
    th, th25 = score3_threshold_with_p25(texture, mean, step=step,
                                         impl=th_impl,
                                         subsample=th_subsample)
    mask = (texture < th).astype(jnp.float32)
    mask = jnp.where(jnp.sum(mask) == 0,
                     (texture < th25).astype(jnp.float32), mask)
    mask = jnp.where(jnp.sum(mask) == 0, jnp.ones_like(mask), mask)
    w = nonsat_weights(mean, mask)
    return masked_linefit(mean, var, w)


_NLE_BAND = 256     # rows per NLE moment band (see _band_plan)


def _band_plan(shape, max_px, band: int, margin: int):
    """Static plan for contiguous-row-band NLE moment sampling.

    The flat-mask NLE (nle_moments + threshold + linefit) is a statistical
    fit: on a multi-MP frame, computing the k=29 box moments over EVERY
    window spends tens of ms of HBM bandwidth to shrink an already-tiny
    sampling error. Instead, filter evenly-spaced contiguous row bands
    independently and crop `margin` rows (the filter radius) off each
    band's output: every surviving window is the full-frame moment value
    at that row up to fp32 prefix-sum rounding (bands are contiguous
    original rows; the short band cumsum actually rounds LESS than the
    full-frame one — tests/test_banded_nle.py), so the downstream
    threshold/fit just sees a uniform row-subsample of the moment fields
    — the same cost model as the robust path's `_band_subsample_rows`
    (nle/robust.py), but window-exact rather than border-reflected.
    Returns None (no banding) or (nb, keep, stride).
    """
    if max_px is None:
        return None
    h, w = shape[-3], shape[-2]
    per_row = int(np.prod([s for i, s in enumerate(shape) if i not in
                           (len(shape) - 3, len(shape) - 2)],
                          dtype=np.int64)) * w
    if h * per_row <= max_px or h < 3 * band:
        return None
    nb = h // band
    eff = (band - 2 * margin) * per_row
    keep = max(1, min(nb, max_px // max(eff, 1)))
    if keep >= nb:
        return None
    return nb, keep, nb // keep


def _take_bands(x, nb: int, keep: int, stride: int, band: int):
    """[..., h, w, C] -> [..., keep, band, w, C] evenly-strided row bands."""
    lead = x.shape[:-3]
    w, C = x.shape[-2], x.shape[-1]
    xb = x[..., :nb * band, :, :].reshape(lead + (nb, band, w, C))
    return xb[..., ::stride, :, :, :][..., :keep, :, :, :]


def make_fused_blind_denoiser(model, params, lut: np.ndarray, *,
                              guided: bool = True, k: int = 29,
                              step: int = 5, bias_corr: str = "pre",
                              sigma_corr: float = 1.03,
                              max_iter: int = 1, pad_base: int = 32,
                              compute_dtype=None,
                              use_pallas_nle: bool = False,
                              th_impl: str = "sort",
                              th_subsample=None,
                              batch_mode: str = "scene",
                              frames_sequential: bool = True,
                              refine: bool = False, refine_k: int = 15,
                              refine_beta: float = 1.0,
                              refine_floor: str = "bucket",
                              refine_shrink: bool = True,
                              refine_shrink_lam: float = 1.0,
                              refine_shrink_full_alpha: float = 1.0,
                              refine_shrink_mode: str = "oriented",
                              robust_nle: bool = True,
                              nle_max_px=1 << 22,
                              iter_policy: str = None,
                              iter_policy_tol: float = None):
    """Build jit fn(rggb [B,h,w,4], scale) -> (dn [B,h,w,4], regs [...,2]).

    `lut` is captured as a device constant (8.5 MB, lives in HBM).
    regs[i] = (beta1, beta2) of round i.

    batch_mode:
    - 'scene': the whole batch is ONE scene (e.g. SIDD's 32 crops) — one
      (K, sigma) pools statistics over all crops; regs [rounds, 2].
    - 'frames': each batch element is an independent frame with its own
      NLE/params; regs [B, rounds, 2]. Default (frames_sequential=True)
      lax.map's the frames inside ONE dispatch: peak HBM stays at one
      frame's working set (12.6 MP B=2 OOM'd under vmap) and the second
      frame amortizes dispatch (B=2 x 12.6 MP measured 63.4 vs 57 MP/s
      single-frame on v5e). frames_sequential=False vmaps instead (only
      useful for small frames where batching lifts MXU utilization).
    """
    lut_dev = jnp.asarray(lut, jnp.float32)
    # exact sg>10 e- extension table (tiny: [1921, 65]); built/cached on
    # first use so the device path matches the host's out-of-range exact
    # evaluation instead of falling back to closed form (VERDICT r1 weak #4)
    lut_sgext_dev = jnp.asarray(load_sgext_lut(), jnp.float32) \
        if bias_corr == "pre" else None
    exact_inverse = bias_corr is None

    apply_fn = model.apply

    def net(z, nsr, corr):
        zp, p2d = pad_to_multiple(z, pad_base)
        zin = jnp.clip(zp, 0.0, 1.0)
        if compute_dtype is not None:
            zin = zin.astype(compute_dtype)
        if guided:
            t = jnp.broadcast_to(nsr * corr, (zin.shape[0],))
            out = apply_fn(params, zin, t)
        else:
            out = apply_fn(params, zin)
        out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
        return unpad(out, p2d)

    def denoise(x01, K, sigma, scale):
        if sigma_corr == "adaptive":
            # measured blind rule (pipeline/denoiser.py, artifact
            # docs/sigma_corr_blind_r5.json); per denoise call so the
            # second pass re-reads the signals at its corrected (K,
            # sigma), matching the orchestrated engine
            from .denoiser import adaptive_sigma_corr
            corr = adaptive_sigma_corr(x01, K, sigma, scale)
        else:
            corr = sigma_corr
        xd = x01 * scale
        z = vst(xd, sigma, gain=K)
        if bias_corr == "pre":
            # gather-free bias: Chebyshev fit of the per-call curve
            # (random gathers cost ~18 ns/px on the v5e; Clenshaw is ~100x
            # faster at multi-MP sizes, max err ~1e-5 VST units)
            curve = device_bias_curve(lut_dev, K, sigma, lut_sgext_dev)
            coeffs = cheb_fit_curve(curve)
            z = z - lookup_bias_curve_cheb(jnp.maximum(xd, 0.0), coeffs, K)
        lower = vst(jnp.zeros(()), sigma, gain=K)
        upper = vst(scale, sigma, gain=K)
        nsr = 1.0 / (upper - lower)
        z = (z - lower) * nsr
        z_noisy = z
        z = net(z, nsr, corr)
        z_raw = z
        if refine:
            # method-noise Wiener blend (do-no-harm; see refine.py)
            from .refine import wiener_refine
            z = wiener_refine(z, z_noisy, noise_var=nsr ** 2,
                              k=refine_k, beta=refine_beta, x01=z,
                              noise_floor=refine_floor,
                              residual_shrink=refine_shrink,
                              shrink_lam=refine_shrink_lam,
                              shrink_full_alpha=refine_shrink_full_alpha,
                              shrink_mode=refine_shrink_mode)

        def finish(zz):
            zz = zz * (upper - lower) + lower
            xx = inverse_vst(zz, sigma, gain=K, exact=exact_inverse)
            return jnp.clip(xx / scale, 0.0, 1.0)

        # raw (un-refined) output rides along for the next round's collab
        # NLE (XLA CSEs the duplicate inverse chain when refine=False)
        return finish(z), finish(z_raw)

    if use_pallas_nle:
        from ..nle.pallas_ops import fused_moments
        # same contiguous-row-band sample budget as the XLA path (the
        # banding, not the kernel, is the bigger lever: full-frame
        # pallas stats measured 71.3 MP/s end-to-end vs the banded XLA
        # default's 110.1); the kernel's reflect borders make band
        # outputs window-exact only inside the crop margin, identical
        # treatment to the conv path
        m_pal = k // 2 + (k // 3 * 2 + 1) // 2

        def self_fit(x):
            plan = _band_plan(x.shape, nle_max_px, _NLE_BAND, m_pal)
            if plan is not None:
                x = _take_bands(x, *plan, _NLE_BAND)
            mean, var, tex = fused_moments(x, k=k)
            if plan is not None:
                mean, var, tex = (a[..., m_pal:-m_pal, :, :]
                                  for a in (mean, var, tex))
            return _nlf_core(var, mean, tex, step, th_impl, th_subsample)

        def collab_fit(lr, dn):
            plan = _band_plan(lr.shape, nle_max_px, _NLE_BAND, m_pal)
            if plan is not None:
                lr = _take_bands(lr, *plan, _NLE_BAND)
                dn = _take_bands(dn, *plan, _NLE_BAND)
            _, var_lr, _ = fused_moments(lr, k=k)
            mean_dn, var_dn, _ = fused_moments(dn, k=k)
            if plan is not None:
                var_lr, mean_dn, var_dn = (a[..., m_pal:-m_pal, :, :]
                                           for a in (var_lr, mean_dn,
                                                     var_dn))
            return _nlf_core(var_lr - var_dn, mean_dn,
                             jnp.sqrt(var_dn), step, th_impl, th_subsample)
    else:
        from ..nle.boxfilter import nle_moments, mean_varfilt, varfilt
        inner = k // 3 * 2 + 1
        # band margins = the moment chains' total filter radius: banded
        # outputs inside the margin are bit-equal to the full-frame values
        m_self = k // 2 + inner // 2     # mean/var/texture chain
        m_collab = k // 2                # varfilt / mean_varfilt only

        def self_fit(x):
            plan = _band_plan(x.shape, nle_max_px, _NLE_BAND, m_self)
            if plan is not None:
                x = _take_bands(x, *plan, _NLE_BAND)
            mean, var, tex = nle_moments(x, k, inner)
            if plan is not None:
                mean, var, tex = (a[..., m_self:-m_self, :, :]
                                  for a in (mean, var, tex))
            return _nlf_core(var, mean, tex, step, th_impl, th_subsample)

        def collab_fit(lr, dn):
            plan = _band_plan(lr.shape, nle_max_px, _NLE_BAND, m_collab)
            if plan is not None:
                lr = _take_bands(lr, *plan, _NLE_BAND)
                dn = _take_bands(dn, *plan, _NLE_BAND)
            lr_var = jnp.maximum(varfilt(lr, k), 0.0)
            mean_dn, dn_var = mean_varfilt(dn, k)
            if plan is not None:
                lr_var, mean_dn, dn_var = (a[..., m_collab:-m_collab, :, :]
                                           for a in (lr_var, mean_dn,
                                                     dn_var))
            var = lr_var - dn_var
            return _nlf_core(var, mean_dn, jnp.sqrt(dn_var), step, th_impl,
                             th_subsample)

    if robust_nle:
        # wavelet-MAD cross-check (nle/robust.py): content can only
        # inflate both estimators, so a MAD estimate clearly below the
        # flat-mask fit means the mask leaked texture (no flat regions).
        from ..nle.robust import (mad_self_estimate, mad_collab_estimate,
                                  combine_estimates, COLLAB_BAND,
                                  shape_consistent_collab)

        def self_est(x):
            fit = self_fit(x)
            mad = mad_self_estimate(x)
            return combine_estimates(fit, mad,
                                     jnp.mean(jnp.clip(x, 0.0, 1.0)))

        def collab_est(lr, dn, self_reg=None):
            fit = collab_fit(lr, dn)
            mad = mad_collab_estimate(lr, dn)
            ref_mean = jnp.mean(jnp.clip(dn, 0.0, 1.0))
            # symmetric band, unlike self: the collab var-difference fit
            # fails in BOTH directions (see robust.COLLAB_BAND)
            comb = combine_estimates(fit, mad, ref_mean, band=COLLAB_BAND)
            if self_reg is not None:
                comb = shape_consistent_collab(comb, fit, mad, ref_mean,
                                               self_reg)
            return comb
    else:
        self_est = self_fit

        def collab_est(lr, dn, self_reg=None):
            return collab_fit(lr, dn)

    from .policy import (combine_rounds, reg_agreement, DEFAULT_POLICY,
                         DEFAULT_TOL, DEFAULT_FLOOR_FRAC)
    policy = iter_policy if iter_policy is not None else DEFAULT_POLICY
    ptol = iter_policy_tol if iter_policy_tol is not None else DEFAULT_TOL

    def fused_body(rggb, scale):
        b1, b2 = self_est(rggb)
        b1 = jnp.maximum(b1, 1e-4 / scale)  # defensive K clamp
        K0 = b1 * scale
        sig0 = jnp.sqrt(jnp.maximum(b2, 0.0)) * scale
        if policy == "rescue" and max_iter > 0:
            # certified-under-estimate gate, measured ONCE on the input
            # (pipeline/policy.py DEFAULT_FLOOR_FRAC; engine analog
            # engine._input_floor_frac): the input floor is a lower
            # bound on true noise, so floor^2 >> v_self proves the self
            # model low; the model is evaluated at the floor's own
            # mid-tone mean (flat_floor_stats docstring)
            from ..nle.robust import flat_floor_stats
            floor0, mu_mid0 = flat_floor_stats(rggb)
            ffrac = floor0 ** 2 / jnp.maximum(
                b1 * mu_mid0 + jnp.maximum(b2, 0.0), 1e-30)
        dn, dn_raw = denoise(rggb, K0, sig0, scale)

        regs = [jnp.stack([b1, b2])]
        for _ in range(max_iter):
            # collab NLE sees the RAW net output (reference contract,
            # YOND_SIDD.py:89-115) — the refined output has method-noise
            # blended back, which inflates stdfilt(dn) and destabilizes
            # the round-2 fit
            c1, c2 = collab_est(rggb, dn_raw, self_reg=(b1, b2))
            # guard: beta2 < 0 -> beta1^2 (YOND_SIDD.py:438-440)
            c2 = jnp.where(c2 < 0, c1 ** 2, c2)
            ok = c1 > 0  # beta1 < 0 -> keep previous round (:445-447)
            K1 = jnp.maximum(c1, 1e-4 / scale) * scale
            sig1 = jnp.sqrt(c2) * scale
            # iteration policy (pipeline/policy.py): the previous round's
            # reg is regs[-1]; the signed agreement scalar + the blind
            # MAD noise measurement ON dn0 decide whether the second pass
            # carries information or just re-rolls method noise
            mu = jnp.mean(jnp.clip(dn_raw, 0.0, 1.0))
            agree = reg_agreement((regs[-1][0], regs[-1][1]), (c1, c2),
                                  mu)
            if policy == "rescue":
                # the rescue blend weight is EXACTLY 0 unless collab says
                # the noise was under-estimated by > tol AND the input's
                # noise floor certifies the self model was low — so the
                # second denoise pass is dead compute on the common path.
                # lax.cond executes one branch at runtime: skipping saves
                # a whole net forward + refine per frame (the output is
                # bit-identical; w > 0 <=> need).
                need = ok & (agree > ptol) & (ffrac > DEFAULT_FLOOR_FRAC)

                def _second_pass(_):
                    dn1, dn1_raw = denoise(rggb, K1, sig1, scale)
                    dn1 = combine_rounds(dn, dn1, agree, policy=policy,
                                         tol=ptol, floor_frac=ffrac,
                                         floor_frac_tol=DEFAULT_FLOOR_FRAC)
                    return dn1, dn1_raw

                dn, dn_raw = jax.lax.cond(
                    need, _second_pass, lambda _: (dn, dn_raw), None)
            else:
                dn1, dn1_raw = denoise(rggb, K1, sig1, scale)
                dn1 = combine_rounds(dn, dn1, agree, policy=policy,
                                     tol=ptol, floor_frac=None)
                dn = jnp.where(ok, dn1, dn)
                dn_raw = jnp.where(ok, dn1_raw, dn_raw)
            regs.append(jnp.where(ok, jnp.stack([c1, c2]), regs[-1]))
        return dn, jnp.stack(regs)

    if batch_mode == "frames":
        def one_frame(frame, scale):
            dn, regs = fused_body(frame[None], scale)
            return dn[0], regs

        if frames_sequential:
            # lax.map: frames processed sequentially INSIDE one dispatch —
            # peak HBM stays at one frame's working set (12.6 MP frames
            # OOM'd at B=2 under vmap, round-1 STATUS), and the chip is
            # serial anyway so batched execution buys no extra throughput
            # at multi-MP sizes.
            return jax.jit(lambda frames, scale: jax.lax.map(
                lambda f: one_frame(f, scale), frames))
        return jax.jit(jax.vmap(one_frame, in_axes=(0, None)))
    return jax.jit(fused_body)

"""Spatial sharding: full-resolution frames split along H across chips.

The image-domain analog of sequence/context parallelism (SURVEY.md §5):
a 12-50 MP Bayer frame is sharded row-wise over the mesh; neighbors
exchange `halo` boundary rows over ICI (lax.ppermute) so windowed ops (the
NLE box filters, the UNet receptive field) are computed as if the frame
were whole. Global statistics (the NLE threshold + line fit) use psum'd
histograms/moments instead of a global sort.

All functions are built with jax.shard_map over a mesh axis (default
'data') and run unmodified on the CPU xla_force_host_platform_device_count
mesh used in tests.
"""
from __future__ import annotations


from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..nle.boxfilter import box_mean, stdfilt
# (fit helpers are inlined below for the psum variants)
from ..vst import vst, inverse_vst, lookup_bias_curve


def _halo_exchange_rows(x, halo: int, axis_name: str):
    """x: local shard [h, W, C]. Returns [h + 2*halo, W, C] with neighbor
    rows filled in; global top/bottom get reflect-101 padding."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    top = x[:halo]
    bot = x[-halo:]
    if n > 1:
        from_above = lax.ppermute(bot, axis_name,
                                  [(i, i + 1) for i in range(n - 1)])
        from_below = lax.ppermute(top, axis_name,
                                  [(i + 1, i) for i in range(n - 1)])
    else:
        from_above = jnp.zeros_like(bot)
        from_below = jnp.zeros_like(top)
    # reflect-101 fallbacks at the global frame edges
    reflect_top = x[1:halo + 1][::-1]
    reflect_bot = x[-halo - 1:-1][::-1]
    top_pad = jnp.where(idx == 0, reflect_top, from_above)
    bot_pad = jnp.where(idx == n - 1, reflect_bot, from_below)
    return jnp.concatenate([top_pad, x, bot_pad], axis=0)


def sharded_box_stats(mesh: Mesh, rggb, k: int = 29, axis: str = "data"):
    """Exact sharded (mean, var, texture) maps of a row-sharded RGGB frame.

    rggb: [H, W, 4] (H divisible by mesh axis size). Returns the three maps
    with the same sharding. Interior-exact: halo = k rows covers the
    texture map's nested blur(2k//3+1) -> stdfilt(k) support.
    """
    halo = k  # covers stdfilt(box_mean(., 2k//3+1), k) support
    inner = k // 3 * 2 + 1

    def f(x):
        xe = _halo_exchange_rows(x, halo, axis)
        mean = box_mean(xe, k)
        std = stdfilt(xe, k)
        tex = stdfilt(box_mean(xe, inner), k)
        sl = slice(halo, xe.shape[0] - halo)
        return mean[sl], std[sl] ** 2, tex[sl]

    fn = jax.shard_map(f, mesh=mesh, in_specs=P(axis),
                       out_specs=(P(axis), P(axis), P(axis)))
    return fn(rggb)


NBINS_TH = 4096
_LOG_RANGE = float(np.log(1e7))  # histogram spans [t_max*1e-7, t_max]


def _psum_log_quantiles(t, ranks_frac, axis: str):
    """Distributed quantiles of a positive field via a psum'd LOG-spaced
    histogram + sub-bin interpolation.

    A linear histogram is useless here: texture values concentrate near 0
    while one outlier stretches t_max, so a low quantile lands in the first
    few bins with O(25%) quantization error — the root cause of the
    round-2 +-30-50% sharded-NLE tolerance. Log bins give a constant
    (1e7)^(1/4096)-1 ~ 0.4% per-bin resolution across 7 decades, and
    interpolating the rank inside the bin brings the error to ~1e-4
    relative — matching jnp.percentile(method='linear') far below the 1%
    product gate.

    t: local shard values (flattened); ranks_frac: [n] quantile fractions
    in (0, 1]. Returns [n] quantile values (replicated).
    """
    t_max = lax.pmax(jnp.max(t), axis) + 1e-30
    r = jnp.clip(t / t_max, 1e-7, 1.0)
    pos = (jnp.log(r) + _LOG_RANGE) / _LOG_RANGE * NBINS_TH
    bins = jnp.clip(pos.astype(jnp.int32), 0, NBINS_TH - 1)
    counts = jax.ops.segment_sum(jnp.ones_like(t), bins,
                                 num_segments=NBINS_TH)
    counts = lax.psum(counts, axis)
    cdf = jnp.cumsum(counts)
    total = cdf[-1]
    ranks = ranks_frac * total
    idx = jnp.argmax(cdf[None, :] >= ranks[:, None], axis=1)
    below = jnp.where(idx > 0, cdf[jnp.maximum(idx - 1, 0)], 0.0)
    frac = jnp.clip((ranks - below)
                    / jnp.maximum(cdf[idx] - below, 1e-30), 0.0, 1.0)
    # log-spaced edges: edge(i) = t_max * exp((i/NB - 1) * LR)
    log_lo = (idx.astype(jnp.float32) / NBINS_TH - 1.0) * _LOG_RANGE
    step = _LOG_RANGE / NBINS_TH
    return t_max * jnp.exp(log_lo + frac * step)


def sharded_self_nlf(mesh: Mesh, rggb, k: int = 29, axis: str = "data",
                     step: int = 5):
    """Self NLE on a row-sharded frame -> (beta1, beta2) replicated scalars.

    Same algorithm as yondx.nle.self_nlf with two multichip substitutions:
    the percentile thresholds come from a psum'd 4096-bin histogram of the
    texture map (accurate to bin width), and the occupied-brightness-bin
    scan and line fit are psum'd masked reductions.
    """
    halo = k
    inner = k // 3 * 2 + 1
    n_q = 100 // step
    quants = np.linspace(step, 100, n_q, endpoint=True).astype(np.float32)

    def f(x):
        xe = _halo_exchange_rows(x, halo, axis)
        mean = box_mean(xe, k)
        std = stdfilt(xe, k)
        tex = stdfilt(box_mean(xe, inner), k)
        sl = slice(halo, xe.shape[0] - halo)
        mean, var, tex = mean[sl], std[sl] ** 2, tex[sl]

        m = mean.reshape(-1)
        v = var.reshape(-1)
        t = tex.reshape(-1)
        # global log-histogram quantiles of the texture map (+ p25 backup)
        ranks_frac = jnp.concatenate([jnp.asarray(quants) / 100.0,
                                      jnp.asarray([0.25], jnp.float32)])
        qs = _psum_log_quantiles(t, ranks_frac, axis)
        ths, th25 = qs[:-1], qs[-1]
        # occupied brightness bins under each threshold (segment-min psum'd)
        buckets = jnp.clip(m, 0.0, 1.0) * 1000
        buckets = buckets.astype(jnp.int32)
        min_tex = jax.ops.segment_min(t, buckets, num_segments=1001)
        min_tex = lax.pmin(min_tex, axis)
        npeaks = jnp.sum(min_tex[None, :] <= ths[:, None], axis=1)
        npeaks = jnp.maximum(npeaks.astype(jnp.float32), 1.0)
        score = ths / (jnp.asarray(quants) * npeaks)
        i = jnp.argmin(score[1:]) + 1
        th = ths[i]
        mask = (t < th).astype(jnp.float32)
        empty = lax.psum(jnp.sum(mask), axis) == 0
        mask = jnp.where(empty, (t < th25).astype(jnp.float32), mask)
        w = nonsat_weights_global(m, mask, axis)
        return _global_linefit(m, v, w, axis)

    fn = jax.shard_map(f, mesh=mesh, in_specs=P(axis),
                       out_specs=(P(), P()))
    return fn(rggb)


def nonsat_weights_global(x, w, axis: str):
    nonsat = (x > 1e-4) & (x < 0.8)
    w2 = w * nonsat
    keep = lax.psum(jnp.sum(w2), axis) > 0.01 * lax.psum(jnp.sum(w), axis)
    return jnp.where(keep, w2, w)


def _global_linefit(x, y, w, axis: str):
    n = lax.psum(jnp.sum(w), axis)
    safe_n = jnp.maximum(n, 1.0)
    xbar = lax.psum(jnp.sum(w * x), axis) / safe_n
    ybar = lax.psum(jnp.sum(w * y), axis) / safe_n
    dx = x - xbar
    dy = y - ybar
    sxx = lax.psum(jnp.sum(w * dx * dx), axis)
    sxy = lax.psum(jnp.sum(w * dx * dy), axis)
    b1 = jnp.where(sxx > 0, sxy / jnp.maximum(sxx, 1e-30), 0.0)
    b2 = ybar - b1 * xbar
    ok = n > 0
    return jnp.where(ok, b1, 0.0), jnp.where(ok, b2, 0.0)


def spatial_denoise_sharded_pair(mesh: Mesh, apply_fn: Callable, params,
                                 rggb, curve, K, sigma, scale,
                                 halo: int = 64, axis: str = "data",
                                 bias_corr: str | None = "pre",
                                 exact_inverse: bool = False,
                                 sigma_corr: float = 1.03,
                                 guided: bool = True,
                                 refine: bool = False,
                                 refine_k: int = 15,
                                 refine_beta: float = 1.0,
                                 refine_floor: str = "local",
                                 refine_shrink: bool = True,
                                 refine_shrink_lam: float = 1.0,
                                 refine_shrink_full_alpha: float = 1.0,
                                 refine_shrink_mode: str = "oriented"):
    """Row-sharded fused VST denoise of one huge RGGB frame ->
    (output, raw_net_output), the VSTDenoiser.denoise_pair analog.

    Each chip holds H/n rows; `halo` rows (rggb domain) are exchanged over
    ICI before the network so the UNet's receptive field crosses shard
    boundaries; the halo is cropped after. Shapes must satisfy
    (H/n + 2*halo) % 32 == 0 for the UNet scales (choose halo accordingly).

    refine=True also runs the method-noise Wiener refinement
    (pipeline/refine.py) INSIDE the exchanged-halo region, so its box
    window and local-floor erosion (width 4k+3) see neighbor rows; with
    the default halo=64 > (4*15+3)/2 + 15 the refined interior matches the
    single-device result except for the floor's residual boundary taper,
    which the product's 1% tolerance absorbs (tests/test_product_50mp).
    """
    def f(x, curve_l, K_l, sigma_l, scale_l):
        xd = x * scale_l
        z = vst(xd, sigma_l, gain=K_l)
        if bias_corr == "pre":
            bias = lookup_bias_curve(jnp.maximum(xd, 0.0), curve_l, K_l)
            z = z - bias
        lower = vst(jnp.zeros(()), sigma_l, gain=K_l)
        upper = vst(scale_l, sigma_l, gain=K_l)
        nsr = 1.0 / (upper - lower)
        z = (z - lower) * nsr
        ze = _halo_exchange_rows(z, halo, axis)
        zin = jnp.clip(ze, 0.0, 1.0)[None]
        if guided:
            t = jnp.broadcast_to(nsr * sigma_corr, (1,))
            out = apply_fn(params, zin, t)
        else:
            out = apply_fn(params, zin)
        out = jnp.clip(out[0], 0.0, 1.0)
        z_raw = out[halo:-halo]
        if refine:
            from ..pipeline.refine import wiener_refine
            # z_noisy is the UNCLIPPED normalized input, matching
            # VSTDenoiser._denoise's residual definition
            # the à-trous shrink's support (level-3 radius 14 px + the
            # k=3 stabilizer) sits well inside the default halo=64, so
            # the shrunk interior matches the single-device result
            zr = wiener_refine(out, ze,
                               noise_var=nsr ** 2, k=refine_k,
                               beta=refine_beta, x01=out,
                               noise_floor=refine_floor,
                               residual_shrink=refine_shrink,
                               shrink_lam=refine_shrink_lam,
                               shrink_full_alpha=refine_shrink_full_alpha,
                               shrink_mode=refine_shrink_mode)
            z_fin = zr[halo:-halo]
        else:
            z_fin = z_raw

        def finish(zz):
            zz = zz * (upper - lower) + lower
            xx = inverse_vst(zz, sigma_l, gain=K_l, exact=exact_inverse)
            return jnp.clip(xx / scale_l, 0.0, 1.0)

        return finish(z_fin), finish(z_raw)

    # params/apply_fn are closed over: shard_map treats closed-over arrays
    # as fully replicated — exactly right for the net weights.
    fn = jax.shard_map(f, mesh=mesh,
                       in_specs=(P(axis), P(), P(), P(), P()),
                       out_specs=(P(axis), P(axis)))
    return fn(rggb, jnp.asarray(curve, jnp.float32), jnp.float32(K),
              jnp.float32(sigma), jnp.float32(scale))


def spatial_denoise_sharded(mesh: Mesh, apply_fn: Callable, params,
                            rggb, curve, K, sigma, scale,
                            halo: int = 64, axis: str = "data",
                            bias_corr: str | None = "pre",
                            exact_inverse: bool = False,
                            sigma_corr: float = 1.03,
                            guided: bool = True):
    """Single-output wrapper of spatial_denoise_sharded_pair (raw net
    output path, no refinement) — kept for existing callers/tests."""
    return spatial_denoise_sharded_pair(
        mesh, apply_fn, params, rggb, curve, K, sigma, scale,
        halo=halo, axis=axis, bias_corr=bias_corr,
        exact_inverse=exact_inverse, sigma_corr=sigma_corr,
        guided=guided, refine=False)[0]


def sharded_mad_self_estimate(mesh: Mesh, rggb, axis: str = "data"):
    """Multi-chip wavelet-MAD robust NLE (nle.robust) on a row-sharded
    frame -> (beta1, beta2) replicated scalars.

    The (bucket x log|d|) histogram pair of `_mad_histograms` is a
    sufficient statistic for the fit, so each shard accumulates its own
    cells and ONE psum reproduces the single-device estimate exactly
    (global dmax via pmax first — the log binning depends on it). Shards
    must hold an even number of rows so the 2x2 Haar cells tile without
    crossing boundaries (no halo needed).
    """
    from ..nle.robust import (_band_subsample_rows, _haar_hh,
                              _mad_histograms, _mad_fit_from_hist,
                              _MAX_CELLS)
    from ..nle.threshold import _subsample
    nsh = mesh.shape[axis]

    def f(x):
        assert x.shape[0] % 2 == 0, \
            "row shards must be even-sized for 2x2 Haar cells"
        xs = _band_subsample_rows(x.astype(jnp.float32),
                                  4 * _MAX_CELLS // nsh)
        d, m = _haar_hh(xs)
        d = jnp.abs(d.reshape(-1))
        m = m.reshape(-1)
        cap = max(1, _MAX_CELLS // nsh)
        if d.shape[0] > cap:
            s = d.shape[0] // cap + 1
            d = _subsample(d, s)
            m = _subsample(m, s)
        dmax = lax.pmax(jnp.max(d), axis) + 1e-30
        counts, sum_m = _mad_histograms(d, m, dmax)
        counts = lax.psum(counts, axis)
        sum_m = lax.psum(sum_m, axis)
        return _mad_fit_from_hist(counts, sum_m, dmax)

    fn = jax.shard_map(f, mesh=mesh, in_specs=P(axis),
                       out_specs=(P(), P()))
    return fn(rggb)


def sharded_self_nlf_robust(mesh: Mesh, rggb, k: int = 29,
                            axis: str = "data", step: int = 5,
                            ratio: float = 1.5):
    """Multi-chip counterpart of nle.robust.self_nlf_robust: the flat-mask
    fit (sharded_self_nlf) cross-checked against the sharded MAD estimate
    — the product's robust_nle default, on a row-sharded frame."""
    from ..nle.robust import combine_estimates
    fit = sharded_self_nlf(mesh, rggb, k=k, axis=axis, step=step)
    mad = sharded_mad_self_estimate(mesh, rggb, axis=axis)
    ref_mean = jnp.mean(jnp.clip(rggb, 0.0, 1.0))
    return combine_estimates(fit, mad, ref_mean, ratio)


def sharded_collab_nlf(mesh: Mesh, lr_rggb, dn_rggb, k: int = 29,
                       axis: str = "data", step: int = 5):
    """Collaborative NLE on a row-sharded (noisy, denoised-proxy) pair ->
    (beta1, beta2) replicated scalars.

    Same substitutions as sharded_self_nlf (psum'd log-histogram
    quantiles, psum'd bucket-min scan and line fit) applied to the collab
    statistics of nle.nlf.collab_nlf: var = var(lr) - var(dn), intensities
    and texture from the proxy (reference CollabNLF, YOND_SIDD.py:89-115).
    """
    halo = k
    n_q = 100 // step
    quants = np.linspace(step, 100, n_q, endpoint=True).astype(np.float32)

    def f(lr, dn):
        lre = _halo_exchange_rows(lr, halo, axis)
        dne = _halo_exchange_rows(dn, halo, axis)
        lr_var = jnp.maximum(stdfilt(lre, k) ** 2, 0.0)
        mean = box_mean(dne, k)
        dn_var = stdfilt(dne, k) ** 2
        sl = slice(halo, lre.shape[0] - halo)
        m = mean[sl].reshape(-1)
        v = (lr_var - dn_var)[sl].reshape(-1)
        t = jnp.sqrt(dn_var[sl]).reshape(-1)
        ranks_frac = jnp.concatenate([jnp.asarray(quants) / 100.0,
                                      jnp.asarray([0.25], jnp.float32)])
        qs = _psum_log_quantiles(t, ranks_frac, axis)
        ths, th25 = qs[:-1], qs[-1]
        buckets = (jnp.clip(m, 0.0, 1.0) * 1000).astype(jnp.int32)
        min_tex = jax.ops.segment_min(t, buckets, num_segments=1001)
        min_tex = lax.pmin(min_tex, axis)
        npeaks = jnp.sum(min_tex[None, :] <= ths[:, None], axis=1)
        npeaks = jnp.maximum(npeaks.astype(jnp.float32), 1.0)
        score = ths / (jnp.asarray(quants) * npeaks)
        i = jnp.argmin(score[1:]) + 1
        th = ths[i]
        mask = (t < th).astype(jnp.float32)
        empty = lax.psum(jnp.sum(mask), axis) == 0
        mask = jnp.where(empty, (t < th25).astype(jnp.float32), mask)
        w = nonsat_weights_global(m, mask, axis)
        return _global_linefit(m, v, w, axis)

    fn = jax.shard_map(f, mesh=mesh, in_specs=(P(axis), P(axis)),
                       out_specs=(P(), P()))
    return fn(lr_rggb, dn_rggb)


def sharded_mad_collab_estimate(mesh: Mesh, lr_rggb, dn_rggb,
                                axis: str = "data"):
    """Multi-chip residual wavelet-MAD (nle.robust.mad_collab_estimate):
    Haar detail of the residual, intensities from the proxy, psum'd
    (counts, sum_m) sufficient statistic. Row shards must be even-sized
    (2x2 Haar cells)."""
    from ..nle.robust import (_band_subsample_rows, _haar_hh,
                              _mad_histograms, _mad_fit_from_hist,
                              _MAX_CELLS)
    from ..nle.threshold import _subsample
    nsh = mesh.shape[axis]

    def f(lr, dn):
        assert lr.shape[0] % 2 == 0, \
            "row shards must be even-sized for 2x2 Haar cells"
        lrs = _band_subsample_rows(lr.astype(jnp.float32),
                                   4 * _MAX_CELLS // nsh)
        dns = _band_subsample_rows(dn.astype(jnp.float32),
                                   4 * _MAX_CELLS // nsh)
        d, _ = _haar_hh(lrs - dns)
        _, m = _haar_hh(dns)
        d = jnp.abs(d.reshape(-1))
        m = m.reshape(-1)
        cap = max(1, _MAX_CELLS // nsh)
        if d.shape[0] > cap:
            s = d.shape[0] // cap + 1
            d = _subsample(d, s)
            m = _subsample(m, s)
        dmax = lax.pmax(jnp.max(d), axis) + 1e-30
        counts, sum_m = _mad_histograms(d, m, dmax)
        counts = lax.psum(counts, axis)
        sum_m = lax.psum(sum_m, axis)
        return _mad_fit_from_hist(counts, sum_m, dmax)

    fn = jax.shard_map(f, mesh=mesh, in_specs=(P(axis), P(axis)),
                       out_specs=(P(), P()))
    return fn(lr_rggb, dn_rggb)


def sharded_collab_nlf_robust(mesh: Mesh, lr_rggb, dn_rggb, k: int = 29,
                              axis: str = "data", step: int = 5,
                              band: float = None, self_reg=None):
    """Multi-chip counterpart of nle.robust.collab_nlf_robust: the collab
    fit inside the symmetric MAD trust band (robust.COLLAB_BAND), plus
    the shape-consistency repair when the round-0 `self_reg` is given —
    closes the multi-chip iteration loop with the same semantics as the
    single-chip engine."""
    from ..nle.robust import (combine_estimates, COLLAB_BAND,
                              shape_consistent_collab)
    fit = sharded_collab_nlf(mesh, lr_rggb, dn_rggb, k=k, axis=axis,
                             step=step)
    mad = sharded_mad_collab_estimate(mesh, lr_rggb, dn_rggb, axis=axis)
    ref_mean = jnp.mean(jnp.clip(dn_rggb, 0.0, 1.0))
    comb = combine_estimates(fit, mad, ref_mean,
                             band=band if band is not None else COLLAB_BAND)
    if self_reg is not None:
        comb = shape_consistent_collab(comb, fit, mad, ref_mean,
                                       (jnp.float32(self_reg[0]),
                                        jnp.float32(self_reg[1])))
    return comb

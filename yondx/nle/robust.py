"""Robust Poisson-Gaussian NLE: per-intensity-bucket wavelet MAD.

The reference's NLE (SelfNLF, YOND_SIDD.py:62-87) fits var~mean over
patches selected by a flat-region texture mask. On content with no truly
flat k=29 windows (stroke-dense text, dense foliage) the mask falls back
to the least-textured patches, content leaks into the variance, and
(K, sigma) over-estimate by 5-50x (measured on the held-out glyph scenes:
est K=69.6 vs true 1.4). The denoiser then smooths at the wrong amplitude
— the dominant quality failure class left after round 2.

This module estimates the noise curve a fundamentally different way:

1. finest-scale Haar diagonal detail d = (a + b - c - d)/2 over 2x2 cells
   of each RGGB plane — for iid noise of variance v, var(d) = v, while
   smooth signal cancels;
2. bucket cells by intensity (the 2x2 cell mean);
3. per bucket, take the MEDIAN of |d| (via a bucket x log|d| histogram —
   scatter-free percentile, jit-safe): sigma_b = median|d| / 0.6745.
   Structure (edges, strokes) produces sparse LARGE |d| outliers that a
   median ignores up to ~50% contamination — and contamination only ever
   INFLATES the estimate, never deflates it;
4. weighted least-squares line fit sigma_b^2 ~ mean_b -> (beta1, beta2),
   excluding clipped buckets (same 1e-4 < m < 0.8 rule as the reference's
   polyfit, isp_algos.py:348-350).

Because both estimators are inflated (never deflated) by content, the
cross-check `min` combination in `self_nlf_robust` is principled: use the
flat-mask fit (reference parity) unless the MAD fit sits clearly below it.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .nlf import self_nlf
from .boxfilter import box_mean

NB_M = 200          # intensity buckets
NB_D = 256          # log|d| histogram bins
_D_RANGE = float(np.log(1e4))   # |d| span: [dmax*1e-4, dmax]
# median|d| = 0.6745 sigma for Gaussian d
_MAD_C = 0.6745


def _haar_hh(x):
    """[..., h, w, C] -> (detail, cell mean) at half resolution.

    Odd h/w are cropped to even first (statistics only — one dropped
    row/col is immaterial, and without the crop the 0::2 / 1::2 halves
    disagree by one and the arithmetic fails on e.g. ANY-camera frames
    whose packed planes are odd-sized)."""
    h, w = x.shape[-3], x.shape[-2]
    x = x[..., : h // 2 * 2, : w // 2 * 2, :]
    a = x[..., 0::2, 0::2, :]
    b = x[..., 1::2, 1::2, :]
    c = x[..., 0::2, 1::2, :]
    d = x[..., 1::2, 0::2, :]
    return (a + b - c - d) * 0.5, (a + b + c + d) * 0.25


def _mad_histograms(d, m, dmax):
    """(bucket x log|d|) count histogram + per-bucket intensity sums.

    Split out so the multi-chip path (parallel.spatial) can psum the
    histograms across shards before the fit: the (counts, sum_m) pair is
    a sufficient statistic for `_mad_fit_from_hist`, so per-shard
    accumulation + psum reproduces the single-device fit exactly (given
    the global dmax via pmax)."""
    d = jnp.abs(d.reshape(-1))
    m = m.reshape(-1)
    r = jnp.clip(d / dmax, 1e-4, 1.0)
    dbin = jnp.clip(((jnp.log(r) + _D_RANGE) / _D_RANGE * NB_D)
                    .astype(jnp.int32), 0, NB_D - 1)
    bucket = jnp.clip((jnp.clip(m, 0.0, 1.0) * (NB_M - 1)).astype(
        jnp.int32), 0, NB_M - 1)
    idx = bucket * NB_D + dbin
    counts = jax.ops.segment_sum(jnp.ones_like(d), idx,
                                 num_segments=NB_M * NB_D)
    sum_m = jax.ops.segment_sum(m, bucket, num_segments=NB_M)
    return counts.reshape(NB_M, NB_D), sum_m


@partial(jax.jit, static_argnames=("min_count",))
def mad_pg_fit(detail, mean, min_count: int = 64):
    """(beta1, beta2) from per-bucket median|detail|.

    detail, mean: same-size arrays (flattened internally). The medians
    come from one segment-sum histogram over (bucket, log|d|) — O(N)
    scatter-add, no per-bucket sort.
    """
    d = jnp.abs(detail.reshape(-1))
    dmax = jnp.max(d) + 1e-30
    counts, sum_m = _mad_histograms(d, mean, dmax)
    return _mad_fit_from_hist(counts, sum_m, dmax, min_count)


def _mad_fit_from_hist(counts, sum_m, dmax, min_count: int = 64):
    """Per-bucket medians + lower-envelope IRLS fit from the (counts,
    sum_m) sufficient statistic (see `_mad_histograms`)."""
    n_b = jnp.sum(counts, axis=1)
    cdf = jnp.cumsum(counts, axis=1)
    rank = 0.5 * n_b
    med_bin = jnp.argmax(cdf >= rank[:, None], axis=1)
    below = jnp.where(med_bin > 0,
                      jnp.take_along_axis(
                          cdf, jnp.maximum(med_bin - 1, 0)[:, None],
                          axis=1)[:, 0], 0.0)
    cnt_at = jnp.take_along_axis(counts, med_bin[:, None], axis=1)[:, 0]
    frac = jnp.clip((rank - below) / jnp.maximum(cnt_at, 1e-30), 0.0, 1.0)
    log_lo = (med_bin.astype(jnp.float32) / NB_D - 1.0) * _D_RANGE
    step = _D_RANGE / NB_D
    med = dmax * jnp.exp(log_lo + frac * step)
    sigma_b = med / _MAD_C
    var_b = sigma_b ** 2

    # bucket mean intensity (exact, not the bin center)
    mean_b = sum_m / jnp.maximum(n_b, 1.0)
    # weights: bucket occupancy, clipped ranges excluded. Beyond the
    # reference polyfit's fixed 1e-4 < m < 0.8 rule (isp_algos.py:348),
    # buckets within 2 sigma_b of the black level are dropped (clipping
    # deflates |d| there; at 2 sigma the deflation is already inside the
    # per-bucket sampling band the envelope respects, and a harsher cut
    # starves the collab estimator of its whole background on mid-noise
    # text scenes).
    w0 = n_b * ((mean_b > jnp.maximum(1e-4, 2.0 * sigma_b))
                & (mean_b < 0.8)
                & (n_b >= min_count)).astype(jnp.float32)

    def wfit(w):
        wsum = jnp.maximum(jnp.sum(w), 1e-30)
        xbar = jnp.sum(w * mean_b) / wsum
        ybar = jnp.sum(w * var_b) / wsum
        dx = mean_b - xbar
        sxx = jnp.sum(w * dx * dx)
        sxy = jnp.sum(w * dx * (var_b - ybar))
        b1 = jnp.where(sxx > 0, sxy / jnp.maximum(sxx, 1e-30), 0.0)
        return b1, ybar - b1 * xbar

    # LOWER-ENVELOPE fit: the per-bucket medians are robust to sparse
    # outliers WITHIN a bucket, but cells that straddle structure land in
    # intermediate-intensity buckets whose whole |d| population is
    # inflated — a plain weighted fit is dragged up across buckets
    # (measured: glyph scene 30x over). Content inflates var_b and never
    # deflates it, so asymmetric IRLS down-weights buckets ABOVE the
    # line. Crucially the down-weight starts only beyond each bucket's
    # OWN sampling error (se of a median-of-n variance ~ 3.7/sqrt(n)
    # relative): a globally-scaled envelope slid to the bottom of the
    # statistical scatter on scenes with many small accurate buckets
    # (measured 0.42x on satdisk_lo), while structure outliers sit
    # 5-100x above and are still cleanly rejected.
    se = 3.7 * var_b / jnp.sqrt(jnp.maximum(n_b, 1.0))
    b1, b2 = wfit(w0)
    w = w0
    for _ in range(3):
        resid = var_b - (b1 * mean_b + b2)
        t = resid - 2.0 * se
        w = w0 * jnp.where(t <= 0, 1.0,
                           jnp.exp(-t / jnp.maximum(2.0 * se, 1e-30)))
        b1, b2 = wfit(w)
    # physics projection: shot (beta1) and read (beta2) variance are both
    # non-negative. A narrow intensity support (glyph scenes: buckets
    # span 0.22-0.30) leaves the slope ill-conditioned and the free fit
    # can tilt to a negative intercept that extrapolates 2x low at the
    # global mean; the constrained refit (through-origin slope, or flat
    # line) is exact when the truth is one-component.
    wsum = jnp.maximum(jnp.sum(w), 1e-30)
    b1_org = jnp.sum(w * mean_b * var_b) / jnp.maximum(
        jnp.sum(w * mean_b * mean_b), 1e-30)
    b2_flat = jnp.sum(w * var_b) / wsum
    b1, b2 = (jnp.where(b2 < 0, b1_org, jnp.where(b1 < 0, 0.0, b1)),
              jnp.where(b2 < 0, 0.0, jnp.where(b1 < 0, b2_flat, b2)))
    # validity: the surviving buckets must cover a real fraction of the
    # samples. On bimodal scenes (dark ground + saturated disks) the
    # black-clip and saturation cuts remove both modes and the fit would
    # run on sparse structure-only gap buckets (measured: 25x under on
    # satdisk). Such an estimate must never win the cross-check.
    coverage = jnp.sum(w0) / jnp.maximum(jnp.sum(n_b), 1.0)
    ok = coverage > 0.05
    return (jnp.where(ok, b1, jnp.inf),
            jnp.where(ok, b2, jnp.inf))


_MAX_CELLS = 1 << 17    # cap the histogram scatter-add on huge frames.
                        # Amortized in-graph scan timing on v5e
                        # (scripts/bench_robust_overhead.py): the
                        # (counts, sum_m) scatter pair costs 6.2 ms at
                        # 2^18 cells, 3.9 at 2^17, 2.8 at 2^16; a [N,2]
                        # payload single-scatter is no faster (6.1).
                        # 128k cells over <=200 live buckets still gives
                        # >600 samples/bucket — median se ~6%, far below
                        # the 1.5x cross-check trigger (combine_estimates)


def _maybe_subsample(d, m):
    """Lane-friendly joint subsample of (detail, mean) to <=_MAX_CELLS
    cells: the per-bucket medians are order statistics — 512k samples pin
    them far below the fit's tolerance, while a full 12.6 MP frame's
    segment_sum would cost tens of ms on a v5e (round-2 scatter
    measurements)."""
    from .threshold import _subsample
    d = d.reshape(-1)
    m = m.reshape(-1)
    if d.shape[0] > _MAX_CELLS:
        s = d.shape[0] // _MAX_CELLS + 1
        d = _subsample(d, s)
        m = _subsample(m, s)
    return d, m


_BAND = 32          # rows per sampled band (even, so 2x2 cells never
                    # straddle a band boundary after the re-concat)


def _band_subsample_rows(x, max_px: int):
    """Evenly-spaced contiguous row bands totalling <= max_px pixels.

    Subsampling BEFORE the Haar transform is the whole cost model of the
    robust path on big frames: computing the detail field on all 12.6 MP
    and then discarding 96% of the cells spent ~29 ms/frame in strided
    slices alone (measured on v5e). Whole-band slices ride the sublane
    dimension in contiguous chunks, so the gather is a few memcpys; the
    per-bucket medians only need ~5e5 cells (order statistics — sampling
    error << the fit tolerance), and evenly-spaced bands keep the
    intensity histogram representative under vertical scene gradients."""
    h, w = x.shape[-3], x.shape[-2]
    per_ch = int(np.prod(x.shape[:-3], dtype=np.int64)) * x.shape[-1]
    max_rows = max(_BAND, max_px // max(w * per_ch, 1))
    if h <= max_rows or h < 2 * _BAND:
        return x
    nb = h // _BAND
    keep = max(1, min(nb, max_rows // _BAND))
    stride = nb // keep
    lead = x.shape[:-3]
    xb = x[..., :nb * _BAND, :, :].reshape(lead + (nb, _BAND, w,
                                                   x.shape[-1]))
    xb = xb[..., ::stride, :, :, :][..., :keep, :, :, :]
    return xb.reshape(lead + (keep * _BAND, w, x.shape[-1]))


def mad_self_estimate(rggb):
    """Robust (beta1, beta2) of a noisy RGGB stack."""
    x = _band_subsample_rows(rggb.astype(jnp.float32), 4 * _MAX_CELLS)
    d, m = _haar_hh(x)
    return mad_pg_fit(*_maybe_subsample(d, m))


def _flat_quantile_sigma(d, m, q: float):
    """q-quantile of |d| over mid-tone cells -> half-normal sigma.

    Histogram quantile instead of a sort: a 512k jnp.sort costs ~24 ms
    on a v5e (measured in-graph; this runs once per iteration round in
    the fused product graph), a 512-bin log|d| histogram + cdf walk
    ~3 ms at the same <=3% quantile resolution."""
    from jax.scipy.special import erfinv
    d = jnp.abs(d)
    valid = (m > 0.02) & (m < 0.9)
    n = jnp.sum(valid)
    nbins = 512
    span = float(np.log(1e6))
    dmax = jnp.max(jnp.where(valid, d, 0.0)) + 1e-30
    r = jnp.clip(d / dmax, np.exp(-span), 1.0)
    dbin = jnp.clip(((jnp.log(r) + span) / span * nbins).astype(jnp.int32),
                    0, nbins - 1)
    counts = jax.ops.segment_sum(
        valid.astype(jnp.float32).reshape(-1), dbin.reshape(-1),
        num_segments=nbins)
    cdf = jnp.cumsum(counts)
    rank = q * n
    qbin = jnp.argmax(cdf >= rank)
    below = jnp.where(qbin > 0, cdf[jnp.maximum(qbin - 1, 0)], 0.0)
    frac = jnp.clip((rank - below)
                    / jnp.maximum(counts[qbin], 1e-30), 0.0, 1.0)
    dq = dmax * jnp.exp((qbin.astype(jnp.float32) + frac) / nbins * span
                        - span)
    sigma = dq / (jnp.sqrt(2.0) * erfinv(jnp.float32(q)))
    return jnp.where(n > 16, sigma, 0.0)


def mad_noise_floor(rggb, q: float = 0.2, levels: int = 3):
    """Content-free LOWER bound on a frame's noise std (normalized
    units): the MAX over `levels` Haar scales of the q-th |detail|
    quantile over mid-tone cells, each calibrated by the half-normal
    factor sqrt(2)*erfinv(q) and the scale's input-referred noise gain.

    Why a LOW quantile instead of the per-bucket median fit
    (mad_self_estimate): content inflates only the cells it touches, and
    it can concentrate in specific intensity buckets — on stroke-dense
    glyph scenes the foreground buckets are mostly stroke-edge cells, so
    even per-bucket medians read strokes as noise (measured round 4: the
    bucket-fit scored a smooth denoised glyph frame at 0.275x its noise
    model where every other scene scored 0.002-0.018). A global q=0.2
    quantile lands in the flattest 20% of cells whatever their
    intensity; mixture contamination can only push the reading UP by a
    bounded factor (<= q-remap), and clipped cells (m < 0.02 or > 0.9,
    genuinely sub-noise) are excluded so black frames do not fake a
    floor.

    Why MULTI-scale (round-5 fault-ladder finding, scripts/
    sweep_policy.py): a real SNR-net guided far below the true noise
    level removes the FINEST-band noise first and leaves mid-frequency
    residual noise — the single-level floor read ~0.003x the collab
    model even under a 25x sigma under-estimate, silently disabling the
    rescue policy with the real net (the toy net in the original fault
    test kept finest-band noise, masking this). Recursing the Haar on
    the cell means reads each octave: level j detail of white
    input-noise sigma has std sigma/2^j, so the 2^j gain makes every
    level input-referred and the max catches residual noise wherever
    the net left it. On a truly clean frame all levels read ~0 (the
    flattest 20% of cells at every scale are flat). Since round 5 the
    dn0 reading is TELEMETRY only (the sweep showed no dn0 statistic
    separates true faults from content-inflated impostors — see
    pipeline/policy.py); the rescue gate reads the INPUT through
    `flat_floor_stats` instead."""
    x = _band_subsample_rows(rggb.astype(jnp.float32), 4 * _MAX_CELLS)
    floor = jnp.float32(0.0)
    for j in range(levels):
        d, m = _haar_hh(x)
        if j == 0:
            d, m2 = _maybe_subsample(d, m)
            sig = _flat_quantile_sigma(d, m2, q)
        else:
            sig = _flat_quantile_sigma(d, m, q)
        floor = jnp.maximum(floor, sig * (2.0 ** j))
        x = m
        if min(x.shape[-3], x.shape[-2]) < 8:
            break
    return floor


def flat_floor_stats(rggb, q: float = 0.2):
    """(floor_sigma, mu_mid): the level-1 content-free noise floor plus
    the mean intensity of the mid-tone cells it reads.

    Callers comparing the floor against an intensity-dependent noise
    model (beta1 * mu + beta2) MUST evaluate the model at mu_mid, not
    the frame's global mean: on a nearly-black frame the global mean
    sits below every cell the floor is allowed to read (the m > 0.02
    clip-exclusion), so the model is evaluated at ~zero variance while
    the floor reads real mid-tone noise — measured on the ramp_big
    held-out scene (global mean 0.004): floor^2/v_self = 7.97 at the
    global mean vs ~<= 1 at mu_mid (scripts/probe_floor_discriminator
    .py). Remaining bias: the flattest-q cells skew toward the DARKEST
    valid cells under Poisson noise, so v_self(mu_mid) slightly
    overestimates the noise at the selected cells — the ratio reads
    conservatively LOW, which for the rescue gate means holding
    round 0 (never harmful). Level 1 only: the input's noise is white,
    the finest Haar band reads all of it, and deeper bands only add
    content leak."""
    x = _band_subsample_rows(rggb.astype(jnp.float32), 4 * _MAX_CELLS)
    d, m = _haar_hh(x)
    d, m = _maybe_subsample(d, m)
    sigma = _flat_quantile_sigma(d, m, q)
    valid = (m > 0.02) & (m < 0.9)
    mu_mid = jnp.sum(jnp.where(valid, m, 0.0)) \
        / jnp.maximum(jnp.sum(valid), 1)
    return sigma, mu_mid


def mad_collab_estimate(lr_rggb, dn_rggb):
    """Robust re-estimate from a (noisy, denoised) pair: Haar detail of
    the RESIDUAL (over-smoothing error is low-pass, so its detail is
    sparse and the median rejects it), intensities from the denoised
    proxy (CollabNLF's convention, YOND_SIDD.py:89-115)."""
    lr = _band_subsample_rows(lr_rggb.astype(jnp.float32), 4 * _MAX_CELLS)
    dn = _band_subsample_rows(dn_rggb.astype(jnp.float32), 4 * _MAX_CELLS)
    d, _ = _haar_hh(lr - dn)
    _, m = _haar_hh(dn)
    return mad_pg_fit(*_maybe_subsample(d, m))


# Symmetric trust band for the COLLAB cross-check. Unlike the self path
# (where the flat fit can only be INFLATED by content, so a one-sided
# trigger suffices), the collab var-difference fit fails in BOTH
# directions — dissected on the held-out suite on the real chip
# (probe, 17:40 session log; v at the intensity mass center, x true):
#   glyphs_mid  fit 3.14x (flat mask leaked strokes)   mad 1.09x
#   ramp_lo     fit 0.14x (mask mass on BLACK-CLIPPED  mad 0.95x
#               pixels, mean_on_mask=0.000: var_lr-var_dn is destroyed
#               by the clip and the slope extrapolates from ~nothing;
#               knife-edge: the same scene fits 0.96x on CPU from
#               bf16-level dn_raw differences)
#   zone_lo     fit 0.79x                              mad 0.87x
#   radial_mid  fit 0.95x                              mad 0.93x
# The residual MAD was within +-13% of truth on every probed scene (its
# per-bucket black-clip cut and median both survive what breaks the
# fit), so: keep the reference-parity fit while it agrees with the MAD
# within this band, take the MAD when it falls outside EITHER side.
COLLAB_BAND = 1.8


def combine_estimates(fit, mad, ref_mean, ratio: float = 1.5,
                      band: Optional[float] = None):
    """Cross-check: keep the flat-mask fit (reference parity) unless the
    MAD fit's predicted variance at the intensity mass center disagrees.

    One-sided by default (self path: content inflates both estimators, so
    only fit > ratio*mad means the flat mask leaked texture). With `band`
    set (collab path), the check is SYMMETRIC: the fit is kept only while
    v_fit/v_mad is within [1/band, band] — see the COLLAB_BAND note."""
    b1f, b2f = fit
    b1m, b2m = mad
    v_fit = b1f * ref_mean + b2f
    v_mad = b1m * ref_mean + b2m
    hi = band if band is not None else ratio
    use_mad = v_fit > hi * jnp.maximum(v_mad, 1e-30)
    if band is not None:
        use_mad = use_mad | (v_fit * band < v_mad)
    use_mad = use_mad & jnp.isfinite(v_mad)
    return (jnp.where(use_mad, b1m, b1f),
            jnp.where(use_mad, b2m, b2f))


def self_nlf_robust(lr_rggb, k: int = 29, step: int = 5,
                    ratio: float = 1.5):
    """SelfNLF with the MAD cross-check (the yondx 'robust_nle' path)."""
    x = lr_rggb.astype(jnp.float32)
    fit = self_nlf(x, k=k, step=step)
    mad = mad_self_estimate(x)
    ref_mean = jnp.mean(jnp.clip(x, 0.0, 1.0))
    return combine_estimates(fit, mad, ref_mean, ratio)


def shape_consistent_collab(comb, fit, mad, ref_mean, self_reg,
                            b2_ratio: float = 4.0):
    """Fix the collab fit's slope/intercept SPLIT when its total passes
    the trust band but its intercept is physically inconsistent.

    Held-out zone_lo (probe, session log): fit (3.6e-4, 1.23e-5) vs true
    (6.3e-4, 1.7e-7) — the total at the intensity mass center is inside
    the band (0.90x of the MAD), but beta2 is 72x true, so every DARK
    pixel gets denoised at a wildly wrong amplitude (-2.3 dB on the
    scene). Detection: the round-0 SELF estimate's beta2 (inflate-only,
    MAD-cross-checked) and the collab MAD's beta2 are both independent
    references; a fit beta2 above `b2_ratio` x BOTH is a shape artifact,
    not read noise. Repair: keep the band-agreed total v(ref_mean) but
    adopt the MAD's split — scale the MAD line to the fit's value at the
    mass center. No-op when the band already chose the MAD (comb == mad
    componentwise) or the MAD is invalid."""
    b1c, b2c = comb
    b1f, b2f = fit
    b1m, b2m = mad
    b2s = self_reg[1]
    chose_fit = (b1c == b1f) & (b2c == b2f)
    suspect = b2f > b2_ratio * jnp.maximum(jnp.maximum(b2s, b2m), 1e-9)
    v_fit = b1f * ref_mean + b2f
    v_mad = b1m * ref_mean + b2m
    s = v_fit / jnp.maximum(v_mad, 1e-30)
    fix = chose_fit & suspect & jnp.isfinite(v_mad)
    return (jnp.where(fix, b1m * s, b1c),
            jnp.where(fix, b2m * s, b2c))


def collab_nlf_robust(lr_rggb, dn_rggb, k: int = 29, step: int = 5,
                      band: float = COLLAB_BAND, self_reg=None):
    """CollabNLF with the symmetric MAD cross-check on the residual.

    `self_reg` (round-0 (beta1, beta2), optional): enables the
    shape-consistency repair of `shape_consistent_collab`."""
    from .nlf import collab_nlf
    lr = lr_rggb.astype(jnp.float32)
    dn = dn_rggb.astype(jnp.float32)
    fit = collab_nlf(lr, dn, k=k, step=step)
    mad = mad_collab_estimate(lr, dn)
    ref_mean = jnp.mean(jnp.clip(dn, 0.0, 1.0))
    comb = combine_estimates(fit, mad, ref_mean, band=band)
    if self_reg is not None:
        comb = shape_consistent_collab(comb, fit, mad, ref_mean,
                                       (jnp.float32(self_reg[0]),
                                        jnp.float32(self_reg[1])))
    return comb

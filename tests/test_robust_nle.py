"""Wavelet-MAD robust NLE (yondx/nle/robust.py): recovers the noise curve
on stroke-dense content where the flat-mask fit leaks texture, and defers
to the fit (reference parity) everywhere else."""
import numpy as np
import jax.numpy as jnp

from yondx.nle import self_nlf
from yondx.nle.robust import (self_nlf_robust, mad_self_estimate,
                              collab_nlf_robust)


def _pg_noise(rng, clean, beta1, beta2):
    return (clean + rng.normal(0, np.sqrt(beta1 * clean + beta2),
                               clean.shape)).astype(np.float32)


def _glyph_field(rng, S=512):
    """Dense thin strokes on a mid-gray ground — no flat k=29 window."""
    img = np.full((S, S), 0.25, np.float32)
    cell = 24
    for gy in range(4, S - cell, cell):
        for gx in range(4, S - cell, cell):
            for _ in range(3):
                w = int(rng.integers(1, 4))
                x0 = gx + int(rng.integers(0, cell - w))
                y0 = gy + int(rng.integers(0, cell // 2))
                h = int(rng.integers(cell // 3, cell - 2))
                img[y0:y0 + h, x0:x0 + w] = 0.7
    return img


def test_robust_recovers_on_stroke_dense_content():
    rng = np.random.default_rng(0)
    beta1, beta2 = 2e-3, 5e-5
    clean = _glyph_field(rng)[..., None].repeat(4, -1)
    noisy = np.clip(_pg_noise(rng, clean, beta1, beta2), 0, 1)
    x = jnp.asarray(noisy)
    f1, f2 = self_nlf(x, k=29)
    r1, r2 = self_nlf_robust(x, k=29)
    mref = float(np.mean(noisy))
    v_true = beta1 * mref + beta2
    v_fit = float(f1) * mref + float(f2)
    v_rob = float(r1) * mref + float(r2)
    assert v_fit > 2.0 * v_true          # the fit really does leak here
    assert 0.6 * v_true < v_rob < 1.5 * v_true


def test_robust_defers_to_fit_on_flat_content():
    """On flat-mosaic content the cross-check must keep the flat-mask fit
    bit-exactly (reference-parity path)."""
    rng = np.random.default_rng(1)
    beta1, beta2 = 2e-3, 1e-4
    levels = rng.random((4, 4)) * 0.6 + 0.05
    clean = np.kron(levels, np.ones((128, 128)))[..., None].repeat(4, -1)
    noisy = _pg_noise(rng, clean, beta1, beta2)
    x = jnp.asarray(noisy)
    f1, f2 = self_nlf(x, k=29)
    r1, r2 = self_nlf_robust(x, k=29)
    assert float(r1) == float(f1) and float(r2) == float(f2)


def test_mad_estimate_accuracy_flat():
    rng = np.random.default_rng(2)
    beta1, beta2 = 5e-3, 2e-4
    levels = rng.random((4, 4)) * 0.6 + 0.1
    clean = np.kron(levels, np.ones((128, 128)))[..., None].repeat(4, -1)
    noisy = _pg_noise(rng, clean, beta1, beta2)
    m1, m2 = mad_self_estimate(jnp.asarray(noisy))
    mref = float(np.mean(noisy))
    v_true = beta1 * mref + beta2
    v_mad = float(m1) * mref + float(m2)
    assert abs(v_mad - v_true) < 0.15 * v_true


def test_collab_robust_on_stroke_dense_content():
    """The collaborative re-estimate must also survive stroke density:
    residual MAD vs the var-difference fit."""
    rng = np.random.default_rng(3)
    beta1, beta2 = 2e-3, 5e-5
    clean = _glyph_field(rng)[..., None].repeat(4, -1)
    noisy = np.clip(_pg_noise(rng, clean, beta1, beta2), 0, 1)
    # denoised proxy: clean + a little residual noise + smoothing error
    dn = np.clip(clean + 0.2 * (noisy - clean), 0, 1)
    r1, r2 = collab_nlf_robust(jnp.asarray(noisy), jnp.asarray(dn), k=29)
    mref = float(np.mean(dn))
    v_true = beta1 * mref + beta2
    v_rob = float(r1) * mref + float(r2)
    # residual detail = 0.8 x noise -> v ~ 0.64 v_true; accept the band
    assert 0.3 * v_true < v_rob < 1.5 * v_true


def test_combine_band_unit():
    """The symmetric collab band (robust.COLLAB_BAND): fit kept bit-exactly
    inside the band, MAD taken outside EITHER side, fit kept when the MAD
    is invalid (inf)."""
    from yondx.nle.robust import combine_estimates
    ref = jnp.float32(0.5)
    fit = (jnp.float32(2e-3), jnp.float32(1e-5))       # v_fit = 1.01e-3
    # inside the band -> fit, exactly
    mad_in = (jnp.float32(1.6e-3), jnp.float32(0.0))   # ratio 1.26
    b1, b2 = combine_estimates(fit, mad_in, ref, band=1.8)
    assert float(b1) == float(fit[0]) and float(b2) == float(fit[1])
    # fit far ABOVE mad (mask leak) -> mad
    mad_lo = (jnp.float32(4e-4), jnp.float32(0.0))     # ratio 5.05
    b1, _ = combine_estimates(fit, mad_lo, ref, band=1.8)
    assert float(b1) == float(mad_lo[0])
    # fit far BELOW mad (black-clip mask trap) -> mad
    mad_hi = (jnp.float32(8e-3), jnp.float32(0.0))     # ratio 0.25
    b1, _ = combine_estimates(fit, mad_hi, ref, band=1.8)
    assert float(b1) == float(mad_hi[0])
    # invalid mad -> fit
    mad_inf = (jnp.float32(np.inf), jnp.float32(np.inf))
    b1, _ = combine_estimates(fit, mad_inf, ref, band=1.8)
    assert float(b1) == float(fit[0])


def test_shape_consistent_collab_unit():
    """Shape repair (robust.shape_consistent_collab): a band-passing fit
    whose beta2 is inconsistent with BOTH the self estimate and the MAD
    gets the MAD's slope/intercept split rescaled to the fit's total; a
    consistent fit and a MAD-chosen combine stay untouched."""
    from yondx.nle.robust import shape_consistent_collab
    ref = jnp.float32(0.076)
    # the held-out zone_lo numbers (probe): fit b2 72x true, mad split sane
    fit = (jnp.float32(3.61e-4), jnp.float32(1.23e-5))
    mad = (jnp.float32(5.26e-4), jnp.float32(0.0))
    self_reg = (jnp.float32(6.39e-4), jnp.float32(1.07e-7))
    b1, b2 = shape_consistent_collab(fit, fit, mad, ref, self_reg)
    v_fit = float(fit[0]) * float(ref) + float(fit[1])
    assert float(b2) == 0.0                       # mad's split adopted
    assert abs(float(b1) * float(ref) - v_fit) < 1e-9 * 1 + 1e-7  # total kept
    # consistent fit: untouched
    fit2 = (jnp.float32(6e-4), jnp.float32(2e-7))
    b1, b2 = shape_consistent_collab(fit2, fit2, mad, ref, self_reg)
    assert float(b1) == float(fit2[0]) and float(b2) == float(fit2[1])
    # combine already chose the MAD: untouched
    b1, b2 = shape_consistent_collab(mad, fit, mad, ref, self_reg)
    assert float(b1) == float(mad[0]) and float(b2) == float(mad[1])


def test_collab_band_rescues_black_clip_mask_trap():
    """Regression for the held-out ramp_lo iteration-1 collapse (probe,
    17:40 session log): when the flat mask concentrates on BLACK-CLIPPED
    pixels (texture of the proxy is minimal exactly where the signal is
    clipped), var_lr - var_dn is destroyed by the clip and the collab fit
    under-reads ~7x. The symmetric band must hand the estimate to the
    residual MAD (whose per-bucket black cut survives the clip)."""
    rng = np.random.default_rng(8)
    v = 4e-4                     # pure Gaussian noise, sigma ~ 0.02
    clean = np.zeros((4, 256, 256, 4), np.float32)
    # two bright levels so the MAD line fit has intensity leverage
    clean[:, 64:128, 64:192] = 0.55
    clean[:, 160:224, 32:160] = 0.25
    noisy = np.clip(clean + rng.normal(0, np.sqrt(v), clean.shape), 0,
                    1).astype(np.float32)
    # proxy: exact clean on the clipped ground, a faint smooth wobble on
    # the bright blocks so their texture is ABOVE the black region's zero
    # -> the threshold mask lands exclusively on clipped pixels (the trap)
    yy = np.linspace(0, np.pi * 4, 64, dtype=np.float32)[None, :, None,
                                                         None]
    dn = clean.copy()
    dn[:, 64:128, 64:192] += 0.004 * np.sin(yy)
    dn[:, 160:224, 32:160] += 0.004 * np.sin(yy)
    from yondx.nle.nlf import collab_nlf
    f1, f2 = collab_nlf(jnp.asarray(noisy), jnp.asarray(dn), k=29)
    mref = float(np.mean(np.clip(dn, 0, 1)))
    v_fit = float(f1) * mref + float(f2)
    # the plain fit really is destroyed here (it lands far outside the
    # trust band — the failure direction is itself knife-edge unstable:
    # deflated on the held-out ramp_lo, inflated on this construction)
    assert v_fit < 0.55 * v or v_fit > 1.8 * v
    r1, r2 = collab_nlf_robust(jnp.asarray(noisy), jnp.asarray(dn), k=29)
    v_rob = float(r1) * mref + float(r2)
    assert 0.6 * v < v_rob < 1.6 * v


def test_physical_nonnegativity():
    rng = np.random.default_rng(4)
    clean = np.full((4, 256, 256, 4), 0.3, np.float32)
    noisy = _pg_noise(rng, clean, 1e-3, 1e-5)
    b1, b2 = mad_self_estimate(jnp.asarray(noisy))
    assert float(b1) >= 0 and float(b2) >= 0

def test_band_subsample_large_frame_accuracy():
    """On multi-MP frames the robust path samples contiguous row bands
    BEFORE the Haar transform (the full-frame detail field cost ~29 ms
    on v5e for cells that were then 96% discarded). The banded estimate
    must stay within the estimator's own tolerance of the full-frame
    one, including under a vertical intensity gradient (the case band
    sampling could plausibly bias)."""
    from yondx.nle import robust as R
    rng = np.random.default_rng(5)
    beta1, beta2 = 2e-3, 1e-4
    H, W = 1536, 2048
    grad = np.linspace(0.1, 0.7, H, dtype=np.float32)[:, None]
    clean = np.broadcast_to(grad, (H, W))[..., None].repeat(4, -1)
    noisy = _pg_noise(rng, clean, beta1, beta2)
    x = jnp.asarray(noisy)
    assert R._band_subsample_rows(x, 4 * R._MAX_CELLS).shape[0] < H
    b1, b2 = mad_self_estimate(x)
    mref = float(np.mean(noisy))
    v_true = beta1 * mref + beta2
    v_est = float(b1) * mref + float(b2)
    assert abs(v_est - v_true) < 0.12 * v_true
    # slope/intercept individually sane (gradient spans many buckets)
    assert abs(float(b1) - beta1) < 0.25 * beta1


def test_mad_noise_floor_calibration():
    """Content-free low-quantile noise floor (the rescue policy's
    discriminator): reads sigma on pure noise and on gradients, ZERO on
    clean stroke content (the case the bucket-median fit mis-reads) and
    on clipped frames."""
    from yondx.nle.robust import mad_noise_floor
    rng = np.random.default_rng(0)
    sig = 0.01
    x = np.clip(0.5 + rng.normal(0, sig, (512, 512, 4)), 0,
                1).astype(np.float32)
    f = float(mad_noise_floor(jnp.asarray(x)))
    assert abs(f - sig) < 0.1 * sig
    # thin-stroke glyph content, no noise -> 0 (background cells win)
    img = np.full((512, 512, 4), 0.4, np.float32)
    for gy in range(4, 480, 24):
        for gx in range(4, 480, 24):
            img[gy:gy + 12, gx:gx + 2] = 0.9
            img[gy:gy + 2, gx:gx + 12] = 0.9
    assert float(mad_noise_floor(jnp.asarray(img))) < 1e-4
    # clipped-black frame -> 0, not a fake floor
    assert float(mad_noise_floor(jnp.zeros((256, 256, 4)))) == 0.0
    # noise on a smooth gradient -> still sigma
    yy, xx = np.mgrid[0:512, 0:512].astype(np.float32) / 512
    g = np.stack([0.2 + 0.5 * xx] * 4, -1) + \
        rng.normal(0, sig, (512, 512, 4))
    f2 = float(mad_noise_floor(jnp.asarray(np.clip(g, 0, 1))))
    assert abs(f2 - sig) < 0.1 * sig
    # MID-BAND residual noise (a low-passed net output after an
    # under-estimate: finest band clean, octave-2 noise intact) must
    # still register — the round-5 fault-ladder finding that forced the
    # multi-scale floor (a single-level floor read ~0 here and silently
    # disabled the rescue policy with the real net)
    coarse = np.kron(rng.normal(0, sig, (128, 128, 4)),
                     np.ones((4, 4, 1))).astype(np.float32)
    f3 = float(mad_noise_floor(jnp.asarray(np.clip(0.5 + coarse, 0, 1))))
    assert f3 > 0.5 * sig, f3


def test_flat_floor_stats_midtone_mean():
    """flat_floor_stats returns the floor AND the mean intensity of the
    mid-tone cells it reads — on a nearly-black frame with one bright
    band, the model-evaluation intensity must be the band's (~0.5), not
    the global mean (~0.06): evaluating beta1*mu at the global mean
    read the ramp_big held-out scene at floor^2/v_self = 7.97 (a false
    rescue fire at -3.4 dB) vs ~<= 1 at mu_mid
    (scripts/probe_floor_discriminator.py)."""
    from yondx.nle.robust import flat_floor_stats
    rng = np.random.default_rng(3)
    sig = 0.02
    img = np.zeros((512, 512, 4), np.float32)
    img[200:264] = 0.5                        # one mid-tone band (12.5%)
    img += rng.normal(0, sig, img.shape).astype(np.float32)
    img = np.clip(img, 0, 1)
    floor, mu_mid = (float(v) for v in flat_floor_stats(jnp.asarray(img)))
    assert abs(mu_mid - 0.5) < 0.1, mu_mid    # not the ~0.06 global mean
    assert abs(floor - sig) < 0.25 * sig, floor

"""VST / inverse / bias numerics tests.

Checks closed forms, statistical unbiasedness on sampled Poisson-Gaussian
noise, agreement of the fast separable bias evaluator with the faithful
reference-style numeric integration (isp_algos.py:49-160), and the LUT
curve-gather path.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from yondx.vst import (
    vst, inverse_vst, close_form_bias, bias_points, bias_points_numeric,
    bias_curve_for, lookup_bias_curve, build_bias_lut, X_LUT, SG_LUT,
    FULL_X_GRID,
)


def ref_vst(x, sigma, mu=0, gain=1.0):
    fz = gain * x + (3 / 8) * gain ** 2 + sigma ** 2 - gain * mu
    fz = np.maximum(fz, 0)
    return 2 / gain * fz ** 0.5


def ref_inverse_vst(z, sigma, gain=1, exact=False):
    # faithful port of isp_algos.py:17-33 for z > 0 inputs
    sigma = sigma / gain
    z = np.asarray(z, np.float64)
    if exact:
        zz = np.where(z > 0, z, 1.0)
        fz = ((zz / 2) ** 2 + (1 / 4) * np.sqrt(3 / 2) / zz
              - (11 / 8) / zz ** 2 + (5 / 8) * np.sqrt(3 / 2) / zz ** 3
              - 1 / 8 - sigma ** 2)
        fz = np.where(z > 0, fz, 0.0)
    else:
        fz = (z / 2) ** 2 - 3 / 8 - sigma ** 2
    return np.maximum(fz, 0) * gain


def test_vst_matches_reference_formula():
    x = np.random.rand(64, 64).astype(np.float64) * 900
    for K, s in [(1.0, 0.0), (8.74, 12.81), (0.3, 2.0), (24.5, 25.9)]:
        got = np.asarray(vst(jnp.asarray(x), s, gain=K))
        np.testing.assert_allclose(got, ref_vst(x, s, gain=K), rtol=2e-6)


def test_inverse_matches_reference_formula():
    z = np.random.rand(64, 64) * 60 + 0.5
    for K, s in [(1.0, 0.0), (8.74, 12.81), (24.5, 25.9)]:
        for exact in (False, True):
            got = np.asarray(inverse_vst(jnp.asarray(z), s, gain=K, exact=exact))
            np.testing.assert_allclose(
                got, ref_inverse_vst(z, s, gain=K, exact=exact),
                rtol=1e-5, atol=1e-5)


def test_inverse_exact_handles_nonpositive():
    z = jnp.array([-1.0, 0.0, 2.0])
    out = np.asarray(inverse_vst(z, 1.0, gain=2.0, exact=True))
    assert out[0] == 0 and out[1] == 0 and out[2] > 0


def test_asym_roundtrip_high_flux():
    # VST then asymptotic inverse recovers x at high flux
    x = np.linspace(100, 900, 50)
    K, s = 5.0, 10.0
    z = np.asarray(vst(jnp.asarray(x), s, gain=K))
    back = np.asarray(inverse_vst(jnp.asarray(z), s, gain=K, exact=False))
    np.testing.assert_allclose(back, x, rtol=1e-3)


def test_vst_stabilizes_variance():
    # PG noise -> VST -> approx unit variance (high flux)
    rng = np.random.default_rng(0)
    K, s = 4.0, 6.0
    lam = 300.0
    y = K * rng.poisson(lam / K, 200_000) + rng.normal(0, s, 200_000)
    z = np.asarray(vst(jnp.asarray(y), s, gain=K))
    assert abs(np.var(z) - 1.0) < 0.05


def test_exact_inverse_is_unbiased_on_pg_noise():
    # The exact unbiased inverse inverts the *expected* VST value (i.e. what
    # an ideal denoiser returns in VST space): I(E[VST(y)]) ~= lam. At low
    # flux it must beat the asymptotic inverse by a wide margin.
    rng = np.random.default_rng(1)
    K, s = 2.0, 1.0
    for lam in [4.0, 10.0, 40.0]:
        y = K * rng.poisson(lam / K, 2_000_000) + rng.normal(0, s, 2_000_000)
        z_mean = float(np.asarray(vst(jnp.asarray(y), s, gain=K)).mean())
        ex = float(inverse_vst(jnp.asarray(z_mean), s, gain=K, exact=True))
        asym = float(inverse_vst(jnp.asarray(z_mean), s, gain=K, exact=False))
        assert abs(ex - lam) < 0.1 * K, (lam, ex)
        assert abs(ex - lam) < abs(asym - lam), (lam, ex, asym)


def test_close_form_matches_reference_formula():
    lam = np.linspace(300, 2000, 10)
    ref = close_form_bias(lam, 25.853043, 24.48128)
    y = lam / 24.48128
    sg = 25.853043 / 24.48128
    yh = y + 3 / 8 + sg ** 2
    m1 = (y + sg ** 2) / yh ** 2
    m2 = y / yh ** 3
    m3 = (y + 3 * (y + sg ** 2) ** 2) / yh ** 4
    expect = 2 * yh ** 0.5 * (-m1 / 8 + m2 / 16 - 5 * m3 / 128)
    np.testing.assert_allclose(ref, expect, rtol=1e-12)


def test_separable_bias_matches_numeric_reference():
    # ours (exact separable) vs the faithful reference grid integration
    lams = np.array([0.5, 2.0, 8.0, 30.0])
    for sg in [0.5, 2.0, 6.0]:
        fast = bias_points(lams, np.array([sg]))[:, 0]
        slow = bias_points_numeric(lams.copy(), K=1.0, sigGs=sg, pho_min=100)
        np.testing.assert_allclose(fast, slow, atol=2e-3, rtol=0.02)


def test_separable_bias_joins_closed_form():
    # above the empirical threshold (50*sqrt(K)=50 at K=1) the closed form
    # should agree with the exact evaluation
    lams = np.array([80.0, 200.0, 800.0])
    for sg in [1.0, 5.0]:
        exact = bias_points(lams, np.array([sg]))[:, 0]
        cf = close_form_bias(lams, sigGs=sg, K=1.0)
        np.testing.assert_allclose(exact, cf, atol=5e-4, rtol=0.05)


@pytest.fixture(scope="module")
def small_lut():
    # build only a thin sg slice of the full LUT for speed: monkey-grid
    return None


def test_curve_lookup_roundtrip():
    # build a fake curve = analytic function of x; check the fractional
    # gather reproduces it at grid points and interpolates between
    curve = np.log1p(FULL_X_GRID).astype(np.float32)
    K = 3.0
    x_dn = jnp.asarray(FULL_X_GRID[5:1900:37] * K)
    got = np.asarray(lookup_bias_curve(x_dn, jnp.asarray(curve), K))
    np.testing.assert_allclose(got, curve[5:1900:37], rtol=1e-5, atol=1e-5)
    # interpolation between grid points is within the local bracket
    mid = (FULL_X_GRID[100] + FULL_X_GRID[101]) / 2 * K
    v = float(lookup_bias_curve(jnp.asarray([mid]), jnp.asarray(curve), K)[0])
    assert curve[100] <= v <= curve[101]


def test_bias_curve_for_matches_direct():
    # curve values at LUT x-points equal direct separable bias at (x, sg)
    lut_slice_x = X_LUT[::97]
    K, sigma = 4.0, 8.0     # sg = 2.0 e-
    lut = None
    # build a small LUT restricted to the needed sg rows is not possible via
    # public API; build full rows lazily for the two bracketing sg entries.
    from yondx.vst.lut import _sg_frac_index
    sg = sigma / K
    pos = _sg_frac_index(sg)
    import math
    lo = int(math.floor(pos))
    # direct evaluation on the two bracketing sg grid rows
    direct = bias_points(lut_slice_x, np.array([SG_LUT[lo], SG_LUT[lo + 1]]))
    w = pos - lo
    expect = direct[:, 0] * (1 - w) + direct[:, 1] * w
    # full-table path
    full_rows = bias_points(X_LUT, np.array([SG_LUT[lo], SG_LUT[lo + 1]]))
    fake_lut = np.zeros((len(X_LUT), len(SG_LUT)), np.float32)
    fake_lut[:, lo] = full_rows[:, 0]
    fake_lut[:, lo + 1] = full_rows[:, 1]
    curve = bias_curve_for(K, sigma, fake_lut)
    got = np.asarray(lookup_bias_curve(
        jnp.asarray(lut_slice_x * K), jnp.asarray(curve), K))
    np.testing.assert_allclose(got, expect, atol=1e-4, rtol=1e-3)

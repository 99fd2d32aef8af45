"""Banded NLE moment sampling (pipeline/fused.py `_band_plan`).

The fused path's flat-mask NLE may compute its k=29 moment fields on
evenly-spaced contiguous row bands instead of the full frame (the fit is
statistical; the moments inside each band's margin are EXACT full-frame
values). These tests pin both halves of that claim:

1. exactness: the banded, margin-cropped moment fields equal rows of the
   full-frame fields up to fp32 prefix-sum rounding (the full-frame
   cumsum accumulates over 8x more rows, so IT carries the larger
   rounding; measured difference <= ~2e-4 on variance-scale values);
2. fit stability: (beta1, beta2) from the banded sample matches the
   full-frame fit to ~couple % on a realistic PG scene.

Reference anchor: SelfNLF / CollabNLF statistics, YOND_SIDD.py:62-115.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from yondx.pipeline.fused import (_band_plan, _take_bands, _nlf_core,
                                  _NLE_BAND)
from yondx.nle.boxfilter import nle_moments

K = 29
INNER = K // 3 * 2 + 1
M_SELF = K // 2 + INNER // 2


def _scene(h=1024, w=128, seed=0):
    rng = np.random.default_rng(seed)
    blocks = rng.random((8, 2)) * 0.6 + 0.05
    clean = np.kron(blocks, np.ones((h // 8, w // 2)))
    clean = clean[..., None].repeat(4, -1).astype(np.float32)
    b1, b2 = 2.5e-3, 6.0e-5
    noisy = clean + rng.normal(0, np.sqrt(b1 * clean + b2)).astype(
        np.float32)
    return noisy[None], (b1, b2)


def test_band_plan_static_properties():
    # no banding when the frame is small or the budget covers it
    assert _band_plan((1, 512, 128, 4), 1 << 22, _NLE_BAND, M_SELF) is None
    assert _band_plan((1, 4096, 128, 4), None, _NLE_BAND, M_SELF) is None
    plan = _band_plan((1, 4096, 512, 4), 1 << 21, _NLE_BAND, M_SELF)
    assert plan is not None
    nb, keep, stride = plan
    assert nb == 4096 // _NLE_BAND and 1 <= keep < nb
    assert stride == nb // keep
    # sampled effective pixels stay within the budget
    assert keep * (_NLE_BAND - 2 * M_SELF) * 512 * 4 <= (1 << 21)


def test_banded_moments_exact_inside_margin():
    x, _ = _scene()
    plan = _band_plan(x.shape, 64_000, _NLE_BAND, M_SELF)
    assert plan is not None
    nb, keep, stride = plan
    xb = _take_bands(jnp.asarray(x), nb, keep, stride, _NLE_BAND)
    mb, vb, tb = nle_moments(xb, K, INNER)
    mf, vf, tf = nle_moments(jnp.asarray(x), K, INNER)
    for bi in range(keep):
        r0 = bi * stride * _NLE_BAND
        sl = slice(r0 + M_SELF, r0 + _NLE_BAND - M_SELF)
        for full, band in ((mf, mb), (vf, vb), (tf, tb)):
            np.testing.assert_allclose(
                np.asarray(band[0, bi, M_SELF:-M_SELF]),
                np.asarray(full[0, sl]), rtol=0, atol=5e-4)


def test_banded_fit_matches_full_frame():
    x, (b1, b2) = _scene(h=2048, w=128, seed=3)
    xj = jnp.asarray(x)
    mean, var, tex = nle_moments(xj, K, INNER)
    f1, f2 = _nlf_core(var, mean, tex, step=5)

    plan = _band_plan(x.shape, 300_000, _NLE_BAND, M_SELF)
    assert plan is not None
    xb = _take_bands(xj, *plan, _NLE_BAND)
    mb, vb, tb = nle_moments(xb, K, INNER)
    mb, vb, tb = (a[..., M_SELF:-M_SELF, :, :] for a in (mb, vb, tb))
    g1, g2 = _nlf_core(vb, mb, tb, step=5)

    assert float(f1) == pytest.approx(b1, rel=0.15)
    assert float(g1) == pytest.approx(float(f1), rel=0.05)
    assert float(g2) == pytest.approx(float(f2), rel=0.10, abs=2e-5)

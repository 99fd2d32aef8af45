"""NLE tests: box filters vs cv2, score3 threshold vs a faithful numpy
re-statement, masked fit vs lstsq, end-to-end K/sigma recovery on synthetic
Poisson-Gaussian noise."""
import numpy as np
import jax.numpy as jnp

from yondx.nle import (
    box_mean, stdfilt, varfilt, adaptive_threshold_score3, masked_linefit,
    self_nlf, collab_nlf,
)
from yondx.nle.fit import nonsat_weights


def test_box_mean_matches_cv2():
    import cv2
    x = np.random.rand(64, 96).astype(np.float32)
    for k in (5, 29):
        ref = cv2.blur(x, (k, k))
        got = np.asarray(box_mean(jnp.asarray(x), k))
        np.testing.assert_allclose(got, ref, atol=2e-6)


def test_box_mean_multichannel_matches_cv2():
    import cv2
    x = np.random.rand(48, 48, 4).astype(np.float32)
    ref = cv2.blur(x, (9, 9))
    got = np.asarray(box_mean(jnp.asarray(x), 9))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_stdfilt_matches_reference_formula():
    import cv2
    x = np.random.rand(64, 64).astype(np.float32)
    k = 29
    blur = cv2.blur(x, (k, k))
    ref = np.sqrt(np.maximum(cv2.blur(x * x, (k, k)) - blur ** 2, 0))
    got = np.asarray(stdfilt(jnp.asarray(x), k))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def ref_score3(data, mean, step=5, nbins=1000):
    """Faithful numpy port of get_threshold score3 (YOND_SIDD.py:22-49)."""
    quants = np.linspace(step, 100, 100 // step, endpoint=True)
    ths = np.percentile(data.reshape(-1), quants, method="linear")
    npeaks = np.ones_like(ths)
    for i in range(len(ths)):
        bucket_indices = (mean[data <= ths[i]].clip(0, 1) * nbins).astype(int)
        bucket_counts = np.bincount(bucket_indices, minlength=nbins + 1)
        npeaks[i] = np.sum(bucket_counts > 0)
    score = ths / (quants * npeaks)
    i = np.argmin(score[1:]) + 1
    return ths[i], quants[i]


def test_score3_matches_reference():
    rng = np.random.default_rng(7)
    # piecewise image: flat regions + textured regions
    mean = rng.random((80, 80)).astype(np.float32)
    tex = np.abs(rng.normal(0, 0.02, (80, 80))).astype(np.float32)
    tex[:40] += 0.2  # textured half
    th_ref, q_ref = ref_score3(tex, mean)
    th, q = adaptive_threshold_score3(jnp.asarray(tex), jnp.asarray(mean))
    assert abs(float(th) - th_ref) < 1e-5
    assert abs(float(q) - q_ref) < 1e-9


def test_masked_linefit_matches_lstsq():
    rng = np.random.default_rng(3)
    x = rng.random(5000).astype(np.float32)
    y = 0.37 * x + 0.05 + rng.normal(0, 0.01, 5000).astype(np.float32)
    mask = (rng.random(5000) < 0.6).astype(np.float32)
    A = np.vstack([x[mask > 0], np.ones(int(mask.sum()))]).T
    ref, *_ = np.linalg.lstsq(A, y[mask > 0], rcond=None)
    b1, b2 = masked_linefit(jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))
    assert abs(float(b1) - ref[0]) < 1e-4
    assert abs(float(b2) - ref[1]) < 1e-4


def test_nonsat_rule():
    x = jnp.asarray(np.concatenate([np.full(90, 0.5), np.full(10, 0.9)])
                    .astype(np.float32))
    w = jnp.ones(100)
    w2 = np.asarray(nonsat_weights(x, w))
    assert w2.sum() == 90  # saturated tail dropped
    # if everything is saturated, keep the original mask
    x_all_sat = jnp.full((100,), 0.95)
    w3 = np.asarray(nonsat_weights(x_all_sat, jnp.ones(100)))
    assert w3.sum() == 100


def _synth_pg(rng, beta1, beta2, H=512, W=512):
    """Flat-patch mosaic with PG noise var = beta1*mean + beta2. Patches are
    large (128 px) vs the 29-px window so flat interiors dominate."""
    levels = rng.random((4, 4)) * 0.6 + 0.05
    clean = np.kron(levels, np.ones((H // 4, W // 4)))[..., None]
    clean = np.repeat(clean, 4, axis=-1).astype(np.float32)
    noise = rng.normal(0, np.sqrt(beta1 * clean + beta2)).astype(np.float32)
    return clean, clean + noise


def test_self_nlf_recovers_params():
    rng = np.random.default_rng(11)
    beta1, beta2 = 2e-3, 1e-4
    _, noisy = _synth_pg(rng, beta1, beta2)
    b1, b2 = self_nlf(jnp.asarray(noisy), k=29)
    assert abs(float(b1) - beta1) / beta1 < 0.25, float(b1)
    assert abs(float(b2) - beta2) / beta2 < 0.5, float(b2)


def test_collab_nlf_recovers_params():
    rng = np.random.default_rng(13)
    beta1, beta2 = 1e-3, 5e-5
    clean, noisy = _synth_pg(rng, beta1, beta2)
    b1, b2 = collab_nlf(jnp.asarray(noisy), jnp.asarray(clean), k=29)
    assert abs(float(b1) - beta1) / beta1 < 0.2, float(b1)
    assert abs(float(b2) - beta2) / beta2 < 0.5, float(b2)


def test_self_nlf_matches_reference_pipeline():
    """End-to-end parity vs a faithful numpy/cv2 port of SelfNLF
    (YOND_SIDD.py:62-87)."""
    import cv2

    def ref_self_nlf(lr, k=29):
        def sf(img, kk):
            b = cv2.blur(img, (kk, kk))
            return np.sqrt(np.maximum(cv2.blur(img * img, (kk, kk)) - b * b, 0))
        std_k = sf(lr, k)
        mean = cv2.blur(lr, (k, k))
        lap = sf(cv2.blur(lr, (k // 3 * 2 + 1, k // 3 * 2 + 1)), k)
        var = std_k ** 2
        th, _ = ref_score3(lap, mean)
        var_m, mean_m = var[lap < th], mean[lap < th]
        x, y = mean_m.reshape(-1), var_m.reshape(-1)
        nonsat = np.logical_and(x > 1e-4, x < 0.8)
        if nonsat.sum() > 0.01 * len(x):
            x, y = x[nonsat], y[nonsat]
        A = np.vstack([x, np.ones(len(x))]).T
        res, *_ = np.linalg.lstsq(A, y, rcond=None)
        return res

    rng = np.random.default_rng(17)
    _, noisy = _synth_pg(rng, 1.5e-3, 8e-5)
    ref = ref_self_nlf(noisy)
    b1, b2 = self_nlf(jnp.asarray(noisy), k=29)
    np.testing.assert_allclose(float(b1), ref[0], rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(float(b2), ref[1], rtol=2e-3, atol=1e-8)


def test_nle_moments_matches_composition():
    """nle_moments / mean_varfilt (stacked single-pass stats) must equal
    the box_mean/stdfilt composition they replaced on the hot path."""
    import jax.numpy as jnp
    from yondx.nle.boxfilter import (box_mean, stdfilt, nle_moments,
                                     mean_varfilt, varfilt)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((2, 40, 56, 4)).astype(np.float32))
    k, inner = 9, 7
    mean, var, tex = nle_moments(x, k, inner)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(box_mean(x, k)),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(var),
                               np.asarray(stdfilt(x, k)) ** 2, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(tex), np.asarray(stdfilt(box_mean(x, inner), k)),
        atol=2e-6)
    m2, v2 = mean_varfilt(x, k)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(mean), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(var), atol=1e-6)
    np.testing.assert_allclose(np.asarray(varfilt(x, k)),
                               np.asarray(var), atol=1e-6)

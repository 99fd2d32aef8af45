"""Native C++ kernel tests: parity with cv2/jnp and BM3D denoising gain."""
import numpy as np
import pytest

from yondx import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_native_box_mean_matches_cv2():
    import cv2
    x = np.random.rand(64, 96).astype(np.float32)
    for k in (5, 29):
        ref = cv2.blur(x, (k, k))
        got = native.box_mean(x, k)
        np.testing.assert_allclose(got, ref, atol=3e-6)


def test_native_moments_match_formula():
    import cv2
    x = np.random.rand(48, 48, 4).astype(np.float32)
    k = 9
    mean, var = native.local_moments(x, k)
    bm = cv2.blur(x, (k, k))
    bv = np.maximum(cv2.blur(x * x, (k, k)) - bm ** 2, 0)
    np.testing.assert_allclose(mean, bm, atol=3e-6)
    np.testing.assert_allclose(var, bv, atol=3e-6)


def test_native_bilateral_row_matches_python():
    from yondx.isp.filters import bilateral_1d
    import jax.numpy as jnp
    sig = np.random.rand(128).astype(np.float32)
    ref = np.asarray(bilateral_1d(jnp.asarray(sig), 25, 10.0, 3.0))
    got = native.bilateral_row(sig, 25, 10.0, 3.0)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_bm3d_denoises():
    rng = np.random.default_rng(0)
    clean = np.kron(rng.random((4, 4)), np.ones((16, 16))).astype(np.float32)
    sigma = 0.1
    noisy = clean + rng.normal(0, sigma, clean.shape).astype(np.float32)
    dn = native.bm3d(noisy, sigma)
    mse_in = np.mean((noisy - clean) ** 2)
    mse_out = np.mean((dn - clean) ** 2)
    assert mse_out < mse_in / 3, (mse_in, mse_out)


def _psnr(a, b):
    return 10 * np.log10(1.0 / np.mean((np.asarray(a, np.float64)
                                        - np.asarray(b, np.float64)) ** 2))


def test_bm3d_full_pipeline_quality_and_wiener_gain():
    """Quality gate for the BM3D slot on structured content (no external
    BM3D oracle exists in this image — the pip wheel is absent; this bounds
    the family's expected behavior): at sigma = 25/255 on a scene with
    edges + gradients + texture, full BM3D must recover >= 7 dB over the
    noisy input, and the Wiener stage must improve on the HT pilot."""
    from yondx.data.datasets import SyntheticSRGBDataset
    ds = SyntheticSRGBDataset(length=2, size=128, seed=4242, cache=False,
                              disk_cache=None)
    clean = ds[0].astype(np.float32)[..., 1] / 255.0  # green channel
    rng = np.random.default_rng(7)
    sigma = 25.0 / 255.0
    noisy = (clean + rng.normal(0, sigma, clean.shape)).astype(np.float32)

    ht = native.bm3d(noisy, sigma, stage="ht")
    full = native.bm3d(noisy, sigma, stage="full")
    p_in, p_ht, p_full = _psnr(noisy, clean), _psnr(ht, clean), \
        _psnr(full, clean)
    assert p_ht > p_in + 5, (p_in, p_ht)
    assert p_full > p_ht, (p_ht, p_full)       # Wiener refines the pilot
    assert p_full > p_in + 7, (p_in, p_full)

"""C++ BM3D vs an independent pure-numpy oracle (tests/bm3d_oracle.py).

The pip `bm3d` wheel the reference leans on (YOND_SIDD.py:10,272) is
absent from this image, so the native kernels cannot be certified
against it. The next-best validation — done here — is parity with an
independently-written numpy implementation of the published algorithm
at the same parameterization: the hard-threshold stage, the Wiener
stage, and the composed pipeline must agree to float32 noise on content
with distinct block distances (smooth random fields; on exactly-flat
content tie-breaking in the candidate sort is implementation-defined).
"""
import numpy as np
import pytest

from yondx import native
import bm3d_oracle as oracle

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _smooth_scene(seed: int, H: int = 64, W: int = 64) -> np.ndarray:
    """Band-limited random field: every 8x8 block is distinct, so the
    candidate ranking has no ties and the C++/numpy group selection is
    identical."""
    rng = np.random.default_rng(seed)
    import cv2
    base = rng.random((H, W)).astype(np.float32)
    img = cv2.GaussianBlur(base, (0, 0), 3.0)
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    return (0.15 + 0.7 * img).astype(np.float32)


def _psnr(a, b):
    return 10 * np.log10(1.0 / np.mean((np.asarray(a, np.float64)
                                        - np.asarray(b, np.float64)) ** 2))


@pytest.mark.parametrize("seed", [0, 1])
def test_ht_stage_matches_oracle(seed):
    clean = _smooth_scene(seed)
    rng = np.random.default_rng(100 + seed)
    sigma = 25.0 / 255.0
    noisy = (clean + rng.normal(0, sigma, clean.shape)).astype(np.float32)
    got = native.bm3d(noisy, sigma, stage="ht")
    ref = oracle.bm3d_ht(noisy, sigma)
    assert _psnr(got, ref) > 55.0, _psnr(got, ref)
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_full_pipeline_matches_oracle():
    clean = _smooth_scene(7)
    rng = np.random.default_rng(77)
    sigma = 25.0 / 255.0
    noisy = (clean + rng.normal(0, sigma, clean.shape)).astype(np.float32)
    got = native.bm3d(noisy, sigma, stage="full")
    ref = oracle.bm3d(noisy, sigma, stage="full")
    assert _psnr(got, ref) > 55.0, _psnr(got, ref)
    np.testing.assert_allclose(got, ref, atol=2e-3)
    # and the oracle agrees the Wiener stage improves on the pilot
    pilot = oracle.bm3d_ht(noisy, sigma)
    assert _psnr(ref, clean) > _psnr(pilot, clean)


def test_wiener_stage_matches_oracle_given_same_pilot():
    """Isolate the Wiener stage: feed BOTH implementations the same pilot
    so a mismatch cannot hide behind stage-1 differences."""
    clean = _smooth_scene(3)
    rng = np.random.default_rng(33)
    sigma = 25.0 / 255.0
    noisy = (clean + rng.normal(0, sigma, clean.shape)).astype(np.float32)
    pilot = oracle.bm3d_ht(noisy, sigma)

    import ctypes
    lib = native._load()
    out = np.empty_like(noisy)
    lib.bm3d_wiener_f32(np.ascontiguousarray(noisy),
                        np.ascontiguousarray(pilot), out,
                        noisy.shape[0], noisy.shape[1], float(sigma))
    ref = oracle.bm3d_wiener(noisy, pilot, sigma)
    assert _psnr(out, ref) > 55.0, _psnr(out, ref)
    np.testing.assert_allclose(out, ref, atol=2e-3)

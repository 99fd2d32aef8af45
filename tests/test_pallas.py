"""Pallas fused NLE-statistics kernel vs the XLA conv path (interpret
mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from yondx.nle import box_mean, stdfilt
from yondx.nle.pallas_ops import fused_moments


def test_fused_moments_matches_xla_path():
    rng = np.random.default_rng(0)
    x = rng.random((1, 160, 200, 4)).astype(np.float32)
    k = 29
    inner = k // 3 * 2 + 1
    mean_ref = np.asarray(box_mean(jnp.asarray(x), k))
    var_ref = np.asarray(stdfilt(jnp.asarray(x), k)) ** 2
    tex_ref = np.asarray(stdfilt(box_mean(jnp.asarray(x), inner), k))

    mean, var, tex = fused_moments(jnp.asarray(x), k=k, interpret=True,
                                   band=64)
    np.testing.assert_allclose(np.asarray(mean), mean_ref, atol=5e-5)
    np.testing.assert_allclose(np.asarray(var), var_ref, atol=5e-5)
    np.testing.assert_allclose(np.asarray(tex), tex_ref, atol=5e-5)


def test_fused_moments_cpu_fallback():
    x = jnp.asarray(np.random.rand(2, 64, 64, 4).astype(np.float32))
    mean, var, tex = fused_moments(x, k=29)  # CPU backend -> XLA path
    assert mean.shape == x.shape and var.shape == x.shape
    assert np.isfinite(np.asarray(tex)).all()


def test_fused_moments_width_tiled():
    """Width > wtile (1024) exercises the grid's lane-tiling dimension
    (nw >= 2) added when the full-width kernel OOM'd scoped vmem."""
    rng = np.random.default_rng(3)
    x = rng.random((1, 96, 1300, 4)).astype(np.float32)
    k = 29
    mean_ref = np.asarray(box_mean(jnp.asarray(x), k))
    var_ref = np.asarray(stdfilt(jnp.asarray(x), k)) ** 2

    mean, var, _ = fused_moments(jnp.asarray(x), k=k, interpret=True,
                                 band=64)
    np.testing.assert_allclose(np.asarray(mean), mean_ref, atol=5e-5)
    np.testing.assert_allclose(np.asarray(var), var_ref, atol=5e-5)

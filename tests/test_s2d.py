"""GuidedResUnetS2D: the TPU-packed SNR-Net (models/unets.py) and its
flagship warm-start port (train/s2d_port.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from yondx.models import build_model
from yondx.models.registry import init_params


def _arch(name, nf):
    return {"name": name, "guided": True, "in_nc": 4, "out_nc": 4,
            "nf": nf, "nframes": 1, "res": True, "norm": True}


def _nparams(p):
    return sum(int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(p))


def test_s2d_shape_and_param_parity():
    """Same parameter class as the flagship (11.11M vs 11.17M) and an
    output shape identical to the input (the packing is internal)."""
    m = build_model(_arch("GuidedResUnetS2D", 64))
    p = init_params(m, jax.random.PRNGKey(0), (2, 64, 96, 4))
    n = _nparams(p)
    assert 10.5e6 < n < 11.5e6
    y = m.apply(p, jnp.ones((2, 64, 96, 4), jnp.float32),
                jnp.full((2,), 0.1, jnp.float32))
    assert y.shape == (2, 64, 96, 4)
    assert np.all(np.isfinite(np.asarray(y)))


def test_s2d_pack_roundtrip():
    from yondx.models.unets import _s2d2, _d2s2
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 12, 4)),
                    jnp.float32)
    np.testing.assert_array_equal(np.asarray(_d2s2(_s2d2(x))),
                                  np.asarray(x))


def test_s2d_in_fused_pipeline():
    """The packed net drives the full fused blind pipeline (NLE -> bias ->
    VST -> net -> inverse -> collab -> round 1) unchanged — the engine is
    architecture-agnostic as long as pad_base covers the net's total
    downsample factor (s2d(2) x 3 pools = 16, pad_base 32)."""
    from yondx.pipeline.fused import make_fused_blind_denoiser
    from yondx.vst.lut import BiasLUT
    from yondx.isp import bayer2rggb
    m = build_model(_arch("GuidedResUnetS2D", 8))
    p = init_params(m, jax.random.PRNGKey(0), (1, 64, 64, 4))
    rng = np.random.default_rng(3)
    levels = rng.random((4, 4)) * 0.6 + 0.05
    clean = np.kron(levels, np.ones((64, 64)))
    noisy = np.clip(clean + rng.normal(0, 0.03, clean.shape), 0,
                    1).astype(np.float32)
    fused = make_fused_blind_denoiser(m, p, BiasLUT().lut, guided=True,
                                      bias_corr="pre", max_iter=1)
    dn, regs = fused(bayer2rggb(jnp.asarray(noisy))[None],
                     jnp.float32(959.0))
    assert dn.shape == (1, 128, 128, 4)
    assert np.all(np.isfinite(np.asarray(dn)))
    assert np.asarray(regs).shape == (2, 2)


def test_s2d_port_from_flagship():
    """The port copies every shape-twin stage bit-exactly and leaves only
    the packing-boundary layers fresh."""
    from yondx.train.s2d_port import (port_guidedresunet_to_s2d,
                                      S2D_PORT_MAP)
    src_m = build_model(_arch("GuidedResUnet", 32))
    src_p = init_params(src_m, jax.random.PRNGKey(7), (1, 64, 64, 4))
    dst_m = build_model(_arch("GuidedResUnetS2D", 64))
    dst_p = init_params(dst_m, jax.random.PRNGKey(8), (1, 64, 64, 4))
    merged, ported, fresh = port_guidedresunet_to_s2d(src_p, dst_p)
    assert set(ported) == set(S2D_PORT_MAP)
    assert set(fresh) == {"conv_in", "conv_out"}
    # bottleneck twin is copied verbatim
    src_k = np.asarray(jax.device_get(
        src_p)["params"]["unet"]["conv5"]["conv1"]["kernel"])
    dst_k = np.asarray(merged["params"]["conv4"]["conv1"]["kernel"])
    np.testing.assert_array_equal(src_k, dst_k)
    # and the merged tree drives a forward pass
    y = dst_m.apply(merged, jnp.zeros((1, 64, 64, 4), jnp.float32),
                    jnp.full((1,), 0.1, jnp.float32))
    assert y.shape == (1, 64, 64, 4)


def test_s2d_tail_zero_init_identity_and_extend():
    """tail_nf>0 adds a full-res refinement tail whose second conv is
    ZERO-init, so (a) a freshly-extended net is bit-identical to the
    tail-less net, and (b) extend_with_tail ports a tail-less checkpoint
    into the tail variant verbatim."""
    from yondx.train.s2d_port import extend_with_tail
    base_m = build_model(_arch("GuidedResUnetS2D", 8))
    base_p = init_params(base_m, jax.random.PRNGKey(3), (1, 64, 64, 4))
    arch_t = dict(_arch("GuidedResUnetS2D", 8), tail_nf=8)
    tail_m = build_model(arch_t)
    tail_p = init_params(tail_m, jax.random.PRNGKey(9), (1, 64, 64, 4))
    assert {"tail_1", "tail_2"} <= set(tail_p["params"])
    merged = extend_with_tail(base_p, tail_p)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 4)),
                    jnp.float32)
    t = jnp.full((2,), 0.07, jnp.float32)
    y0 = np.asarray(base_m.apply(base_p, x, t))
    y1 = np.asarray(tail_m.apply(merged, x, t))
    np.testing.assert_array_equal(y0, y1)
    # and a non-zero tail_2 actually changes the output (the tail is live)
    live = jax.tree_util.tree_map(lambda v: v, merged)
    live["params"]["tail_2"]["kernel"] = (
        np.ones_like(live["params"]["tail_2"]["kernel"]) * 1e-2)
    y2 = np.asarray(tail_m.apply(live, x, t))
    assert np.abs(y2 - y0).max() > 1e-6

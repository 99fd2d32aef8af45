"""Model zoo tests: shapes, param counts, guidance behavior, norm mode.

The 11.17M GuidedResUnet param count is the reference's published number
(logs/log_YOND_SIDD_simple+full_pre_grumix_iter.log:4) — an architecture
fingerprint that catches wiring mistakes.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yondx.models import build_model, param_count
from yondx.models.registry import init_params, is_guided

GRU32 = {"name": "GuidedResUnet", "guided": True, "in_nc": 4, "out_nc": 4,
         "nf": 32, "nframes": 1, "res": True, "norm": True}


def test_guidedresunet_param_count_matches_reference():
    model = build_model(GRU32)
    params = init_params(model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    n = param_count(params)
    assert abs(n / 1e6 - 11.17) < 0.02, n / 1e6


def test_guidedresunet_forward_shape_and_guidance_effect():
    model = build_model(GRU32)
    params = init_params(model, jax.random.PRNGKey(0), (2, 32, 32, 4))
    x = jnp.asarray(np.random.rand(2, 32, 32, 4).astype(np.float32))
    y1 = model.apply(params, x, jnp.array([0.05, 0.05]))
    y2 = model.apply(params, x, jnp.array([0.5, 0.5]))
    assert y1.shape == (2, 32, 32, 4)
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-6  # t matters
    assert np.isfinite(np.asarray(y1)).all()


def test_norm_mode_scale_invariance():
    # norm=True divides by per-sample max and rescales t by 1/(ub-lb)
    # (Unet.py:427-429): scaling the input by c scales the output by c when
    # t is scaled by c too (t/(ub) identical).
    model = build_model(GRU32)
    params = init_params(model, jax.random.PRNGKey(1), (1, 32, 32, 4))
    x = jnp.asarray(np.random.rand(1, 32, 32, 4).astype(np.float32))
    t = jnp.array([0.1])
    y = model.apply(params, x, t)
    y2 = model.apply(params, x * 2.0, t * 2.0)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y) * 2.0,
                               rtol=1e-4, atol=1e-5)


UNGUIDED_ARCHS = [
    {"name": "UNetSeeInDark", "in_nc": 4, "out_nc": 4, "nf": 8,
     "nframes": 1, "res": True, "norm": True},
    {"name": "ResUnet", "in_nc": 4, "out_nc": 4, "nf": 8, "nframes": 1,
     "res": True, "norm": False},
    {"name": "ResUnet2", "in_nc": 4, "out_nc": 4, "nf": 8, "nframes": 1,
     "res": True, "norm": False},
    {"name": "DnCNN", "in_nc": 4, "out_nc": 4, "nf": 16, "depth": 5,
     "use_bn": False, "res": True},
    {"name": "SelfSupUNet", "in_nc": 4, "out_nc": 4, "nf": 16, "depth": 3},
    {"name": "SelfResUNet", "in_nc": 4, "out_nc": 4, "nf": 8, "depth": 3},
    {"name": "N2NF_Unet", "in_nc": 4, "out_nc": 4},
    {"name": "FBI_Net", "nf": 16, "num_of_layers": 4, "mul": 1,
     "channel": 1, "output_channel": 2, "case": "FBI_Net",
     "output_type": "linear", "sigmoid_value": 0.1, "res": True,
     "in_nc": 1, "out_nc": 2},
]


@pytest.mark.parametrize("arch", UNGUIDED_ARCHS,
                         ids=[a["name"] for a in UNGUIDED_ARCHS])
def test_unguided_models_forward(arch):
    model = build_model(arch)
    B, S = 1, 32
    in_nc = arch["in_nc"]
    params = init_params(model, jax.random.PRNGKey(0), (B, S, S, in_nc),
                        guided=False)
    x = jnp.asarray(np.random.rand(B, S, S, in_nc).astype(np.float32))
    y = model.apply(params, x)
    if arch["name"] == "FBI_Net":
        # res head: out = out[...,:1]*x + out[...,1:]
        assert y.shape == (B, S, S, 1)
    else:
        assert y.shape == (B, S, S, arch["out_nc"])
    assert np.isfinite(np.asarray(y)).all()


def test_guided_models_forward():
    for name in ("SNRnet", "GuidedSelfUnet"):
        # res=False for GuidedSelfUnet: its res branch is a latent shape bug
        # in the reference too (comp.py:901 adds a 2*nf tensor to out_nc).
        arch = {"name": name, "guided": True, "in_nc": 4, "out_nc": 4,
                "nf": 8, "nframes": 1, "res": name == "SNRnet",
                "norm": True, "depth": 3}
        model = build_model(arch)
        params = init_params(model, jax.random.PRNGKey(0), (1, 32, 32, 4))
        x = jnp.asarray(np.random.rand(1, 32, 32, 4).astype(np.float32))
        y = model.apply(params, x, jnp.array([0.1]))
        assert y.shape == (1, 32, 32, 4)


def test_est_models():
    arch = {"name": "EstUnet", "in_nc": 4, "out_nc": 4, "nf": 8, "depth": 3,
            "res": False, "use_type": "std", "pge": False, "nframes": 1}
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(0), (1, 32, 32, 4),
                        guided=False)
    x = jnp.asarray(np.random.rand(1, 32, 32, 4).astype(np.float32))
    y = model.apply(params, x)
    assert y.shape == (1, 32, 32, 4)

    arch2 = {"name": "est_UNet", "in_nc": 1, "out_nc": 2, "nf": 8,
             "depth": 3}
    model2 = build_model(arch2)
    params2 = init_params(model2, jax.random.PRNGKey(0), (1, 32, 32, 1),
                         guided=False)
    y2 = model2.apply(params2, jnp.asarray(
        np.random.rand(1, 32, 32, 1).astype(np.float32)))
    assert y2.shape == (2,)  # [K, sigma] scalars
    assert (np.asarray(y2) >= 0).all()  # squared outputs


def test_fbi_net_blind_spot():
    """The masked receptive field must exclude the center pixel: changing
    only x[i,j] must not change output[i,j] (blind-spot property)."""
    arch = {"name": "FBI_Net", "nf": 8, "num_of_layers": 3, "mul": 1,
            "channel": 1, "output_channel": 1, "case": "FBI_Net",
            "output_type": "linear", "sigmoid_value": 0.1, "res": False,
            "in_nc": 1, "out_nc": 1}
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(0), (1, 16, 16, 1),
                        guided=False)
    x = jnp.asarray(np.random.rand(1, 16, 16, 1).astype(np.float32))
    y0 = np.asarray(model.apply(params, x))
    x2 = x.at[0, 8, 8, 0].add(10.0)
    y1 = np.asarray(model.apply(params, x2))
    assert abs(y1[0, 8, 8, 0] - y0[0, 8, 8, 0]) < 1e-5


def test_cbam_maskmul_upsample_blocks():
    """Inventory-parity modules (reference modules.py:290-417): CBAM gates
    preserve shape and stay in (0, x); mask_mul pools and multiplies;
    UpsampleBlock doubles spatial dims in both modes."""
    import jax
    import jax.numpy as jnp
    from yondx.models.blocks import CBAM, mask_mul, UpsampleBlock
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 16, 16, 32))

    cbam = CBAM()
    params = cbam.init(rng, x)
    y = cbam.apply(params, x)
    assert y.shape == x.shape
    assert float(jnp.max(jnp.abs(y))) <= float(jnp.max(jnp.abs(x)))

    mask = jax.random.uniform(rng, (2, 32, 32, 1))
    out = mask_mul(x, mask, scale_factor=2)
    assert out.shape == x.shape

    for mode in ("bilinear", "pixel_shuffle"):
        up = UpsampleBlock(16, up_scale=2, mode=mode)
        p = up.init(rng, x)
        y = up.apply(p, x)
        assert y.shape[1:3] == (32, 32), mode
        assert float(jnp.min(y)) >= 0.0  # relu


def test_initialize_weights_reference_init():
    """N(0, 0.02) conv init (archs/__init__.py:10-17): kernels and conv
    biases are redrawn with the right scale; deconv biases untouched."""
    import jax
    import numpy as np
    from yondx.models import build_model
    from yondx.models.registry import init_params, initialize_weights
    arch = {"name": "GuidedResUnet", "guided": True, "in_nc": 4,
            "out_nc": 4, "nf": 8, "nframes": 1, "res": True, "norm": True}
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(0), (1, 32, 32, 4))
    newp = initialize_weights(params, jax.random.PRNGKey(1))
    unet = newp["params"]["unet"]
    k = np.asarray(unet["conv1"]["conv1"]["kernel"])
    assert abs(k.std() - 0.02) < 0.004
    assert abs(np.asarray(unet["conv1"]["conv1"]["bias"]).std() - 0.02) < 0.02
    # deconv bias untouched (flax zeros)
    assert np.all(np.asarray(unet["upv6"]["deconv"]["bias"]) == 0)
    # deconv kernel redrawn
    assert abs(np.asarray(unet["upv6"]["deconv"]["kernel"]).std() - 0.02) \
        < 0.004
    # forward still works
    import jax.numpy as jnp
    y = model.apply(newp, jnp.zeros((1, 32, 32, 4)), jnp.ones((1,)))
    assert np.isfinite(np.asarray(y)).all()

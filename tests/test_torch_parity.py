"""Activation-level parity: flax models vs the reference PyTorch models.

Initializes flax params, converts them into a torch state_dict for the
*reference implementation* (imported read-only from /root/reference), and
compares forward outputs. This is the strongest architecture check available
without pretrained weights, and it validates the .pth port path
(yondx.models.torch_port) in both directions.

Skipped when the reference snapshot or torch is unavailable.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "archs")),
    reason="reference snapshot not mounted")

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from yondx.models import build_model
from yondx.models.registry import init_params
from yondx.models.torch_port import (
    guidedresunet_from_torch, unetseeindark_from_torch,
)


def _load_ref_archs():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib
    import types
    # the reference package imports torchsummary at package init; stub it
    if "torchsummary" not in sys.modules:
        stub = types.ModuleType("torchsummary")
        stub.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = stub
    mod = importlib.import_module("archs.Unet")
    return mod


def _to_torch_sd(flat_np):
    return {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in flat_np.items()}


def _flax_to_torch_grb(tree, prefix, has_shortcut):
    sd = {}
    for cn in ("conv1", "conv2"):
        k = np.asarray(tree[cn]["kernel"])  # [kh,kw,in,out]
        sd[f"{prefix}.{cn}.weight"] = np.transpose(k, (3, 2, 0, 1))
        sd[f"{prefix}.{cn}.bias"] = np.asarray(tree[cn]["bias"])
    g = tree["guide"]
    sd[f"{prefix}.gamma.0.weight"] = np.transpose(
        g["gamma_in"]["kernel"], (1, 0))[:, :, None, None]
    sd[f"{prefix}.gamma.0.bias"] = np.asarray(g["gamma_in"]["bias"])
    sd[f"{prefix}.gamma.2.weight"] = np.transpose(
        g["gamma_out"]["kernel"], (1, 0))[:, :, None, None]
    sd[f"{prefix}.gamma.2.bias"] = np.asarray(g["gamma_out"]["bias"])
    sd[f"{prefix}.beta.1.weight"] = np.transpose(
        g["beta_out"]["kernel"], (1, 0))[:, :, None, None]
    sd[f"{prefix}.beta.1.bias"] = np.asarray(g["beta_out"]["bias"])
    if has_shortcut:
        k = np.asarray(tree["short_cut"]["conv"]["kernel"])
        sd[f"{prefix}.short_cut.0.weight"] = np.transpose(k, (3, 2, 0, 1))
        sd[f"{prefix}.short_cut.0.bias"] = np.asarray(
            tree["short_cut"]["conv"]["bias"])
    return sd


def _flax_to_torch_gru(params):
    unet = params["params"]["unet"]
    sd = {}
    for name in ("conv_in", "conv10"):
        k = np.asarray(unet[name]["kernel"])
        sd[f"{name}.weight"] = np.transpose(k, (3, 2, 0, 1))
        sd[f"{name}.bias"] = np.asarray(unet[name]["bias"])
    for i in range(1, 6):
        sd.update(_flax_to_torch_grb(unet[f"conv{i}"], f"conv{i}", False))
    for i in range(6, 10):
        sd.update(_flax_to_torch_grb(unet[f"conv{i}"], f"conv{i}", True))
    for i in range(1, 5):
        k = np.asarray(unet[f"pool{i}"]["conv"]["kernel"])
        sd[f"pool{i}.conv.weight"] = np.transpose(k, (3, 2, 0, 1))
        sd[f"pool{i}.conv.bias"] = np.asarray(unet[f"pool{i}"]["conv"]["bias"])
    for i in range(6, 10):
        k = np.asarray(unet[f"upv{i}"]["deconv"]["kernel"])  # [kh,kw,in,out]
        k = k[::-1, ::-1]  # undo the flip applied in the flax direction
        sd[f"upv{i}.weight"] = np.ascontiguousarray(
            np.transpose(k, (2, 3, 0, 1)))
        sd[f"upv{i}.bias"] = np.asarray(unet[f"upv{i}"]["deconv"]["bias"])
    return sd


ARCH = {"name": "GuidedResUnet", "guided": True, "in_nc": 4, "out_nc": 4,
        "nf": 8, "nframes": 1, "res": True, "norm": True}


def test_guidedresunet_matches_torch_reference():
    mod = _load_ref_archs()
    model = build_model(ARCH)
    params = init_params(model, jax.random.PRNGKey(7), (2, 32, 32, 4))

    tnet = mod.GuidedResUnet(dict(ARCH))
    sd = _to_torch_sd(_flax_to_torch_gru(params))
    missing, unexpected = tnet.load_state_dict(sd, strict=True), None
    tnet.eval()

    x = np.random.rand(2, 32, 32, 4).astype(np.float32)
    t = np.array([0.07, 0.3], np.float32)
    with torch.no_grad():
        ty = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                  torch.from_numpy(t.reshape(-1, 1, 1, 1)))
    ref = ty.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_roundtrip_port_gru():
    """torch -> flax porter inverts the flax -> torch test mapping."""
    model = build_model(ARCH)
    params = init_params(model, jax.random.PRNGKey(3), (1, 32, 32, 4))
    sd = _to_torch_sd(_flax_to_torch_gru(params))
    back = guidedresunet_from_torch(sd)
    x = np.random.rand(1, 32, 32, 4).astype(np.float32)
    t = np.array([0.1], np.float32)
    y0 = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(t)))
    y1 = np.asarray(model.apply(back, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(y1, y0, atol=1e-6)


def test_unetseeindark_matches_torch_reference():
    mod = _load_ref_archs()
    arch = {"name": "UNetSeeInDark", "in_nc": 4, "out_nc": 4, "nf": 8,
            "nframes": 1, "res": True, "norm": True}
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(5), (1, 32, 32, 4),
                        guided=False)

    # flax -> torch names for the SID UNet
    tree = params["params"]
    sd = {}
    for i in range(1, 10):
        for j in (1, 2):
            k = np.asarray(tree[f"conv{i}_{j}"]["kernel"])
            sd[f"conv{i}_{j}.weight"] = np.transpose(k, (3, 2, 0, 1))
            sd[f"conv{i}_{j}.bias"] = np.asarray(tree[f"conv{i}_{j}"]["bias"])
    for i in range(6, 10):
        k = np.asarray(tree[f"upv{i}"]["deconv"]["kernel"])[::-1, ::-1]
        sd[f"upv{i}.weight"] = np.ascontiguousarray(
            np.transpose(k, (2, 3, 0, 1)))
        sd[f"upv{i}.bias"] = np.asarray(tree[f"upv{i}"]["deconv"]["bias"])
    k = np.asarray(tree["conv10_1"]["kernel"])
    sd["conv10_1.weight"] = np.transpose(k, (3, 2, 0, 1))
    sd["conv10_1.bias"] = np.asarray(tree["conv10_1"]["bias"])

    tnet = mod.UNetSeeInDark(dict(arch))
    tnet.load_state_dict(_to_torch_sd(sd), strict=True)
    tnet.eval()

    x = np.random.rand(1, 32, 32, 4).astype(np.float32)
    with torch.no_grad():
        ty = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ty.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)

    back = unetseeindark_from_torch(_to_torch_sd(sd))
    y1 = np.asarray(model.apply(back, jnp.asarray(x)))
    np.testing.assert_allclose(y1, got, atol=1e-6)

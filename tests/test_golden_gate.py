"""End-to-end golden gate: the reference pipeline (numpy/cv2/torch,
imported from /root/reference) vs YONDEngine on the same synthetic scene
with the same (ported) weights and the same shipped bias LUT.

This is the strongest available substitute for the unavailable SIDD
51.60 dB anchor: it decouples *pipeline numerics* parity from
training-data quality. Gates:
- SelfNLF / CollabNLF betas: relative error < 1e-3;
- per-round denoised PSNR within 0.05 dB of the reference pipeline.

Reference call chain exercised: SimpleNLF (YOND_SIDD.py:117) -> SelfNLF
(:62) -> VST_Denoiser (:250, gru branch with BiasLUT + sigma_corr 1.03)
-> CollabNLF (:89) + guards (:438-447) -> VST_Denoiser round 2.
"""
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

REF = "/root/reference"
CKPT = os.path.join(os.path.dirname(__file__), "..",
                    "checkpoints/Gaussian/"
                    "Gaussian_GRU_mix_5to50_norm_best_model.ckpt")
LUT_NPY = os.path.join(os.path.dirname(__file__), "..",
                       "checkpoints/bias_lut_2d.npy")

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(REF) and os.path.exists(CKPT)
         and os.path.exists(LUT_NPY)),
    reason="reference snapshot / shipped weights not available")

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from yondx.models import build_model
from yondx.models.registry import init_params
from yondx.models.torch_port import guidedresunet_to_torch
from yondx.pipeline import VSTDenoiser, YONDEngine, PipelineConfig
from yondx.vst.lut import BiasLUT

ARCH = {"name": "GuidedResUnet", "guided": True, "in_nc": 4, "out_nc": 4,
        "nf": 32, "nframes": 1, "res": True, "norm": True}


def _make_scene(seed=21, H=512, W=1024, K=8.74, sig=12.81, scale=959.0):
    """Piecewise-flat scene + PG noise (flat regions for the NLE)."""
    rng = np.random.default_rng(seed)
    levels = rng.random((4, 8)) * 0.7 + 0.05
    clean = np.kron(levels, np.ones((H // 4, W // 8))).astype(np.float32)
    noisy = (K * rng.poisson(clean * scale / K)
             + rng.normal(0, sig, clean.shape)).astype(np.float32) / scale
    return np.clip(noisy, 0, 1), clean


def _psnr(a, b):
    return 10 * np.log10(1.0 / np.mean((np.asarray(a, np.float64)
                                        - np.asarray(b, np.float64)) ** 2))


@pytest.fixture(scope="module")
def shipped_flax():
    from yondx.train.ckpt import load_checkpoint
    model = build_model(ARCH)
    params = init_params(model, jax.random.PRNGKey(0), (1, 64, 64, 4))
    params = load_checkpoint(CKPT, params)["params"]
    return model, params


@pytest.fixture(scope="module")
def ref_pipeline(shipped_flax):
    """The reference YOND_SIDD module + a minimal pipeline object carrying
    the ported shipped weights (bound-method trick: no runfile/dataset
    needed to drive VST_Denoiser)."""
    from ref_compat import load_reference_yond
    m = load_reference_yond()
    _, params = shipped_flax
    tnet = m.GuidedResUnet(dict(ARCH))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in guidedresunet_to_torch(params).items()}
    tnet.load_state_dict(sd, strict=True)
    tnet.eval()
    fake = types.SimpleNamespace(
        net=tnet, device=torch.device("cpu"),
        biaslut=m.BiasLUT(os.path.abspath(LUT_NPY)),
        arch=dict(ARCH), pipe={"vst_type": "exact", "max_iter": 1},
    )
    return m, fake


def _run_reference(m, fake, noisy, scale=959.0, wp=1023, bl=64):
    """The reference IterDenoise flow for one frame, est_type='simple',
    max_iter=1 (YOND_SIDD.py:301-467 distilled to the actually-executed
    statements for this config)."""
    reg0 = m.SimpleNLF(noisy, k=29, setting={"mode": "self"})
    regs = [tuple(map(float, reg0))]
    p = {"scale": scale,
         "gain": reg0[0] * (wp - bl),
         "sigma": np.sqrt(max(reg0[1], 0)) * (wp - bl)}
    dn0 = m.YOND_SIDD.VST_Denoiser(fake, noisy, bias_corr="pre",
                                   denoiser="gru", p=p)
    outs = [dn0]
    reg1 = list(m.SimpleNLF(noisy, dn0, k=29, setting={"mode": "collab"}))
    if reg1[1] < 0:
        reg1[1] = reg1[0] ** 2
    if reg1[0] > 0:
        p = {"scale": scale,
             "gain": reg1[0] * (wp - bl),
             "sigma": np.sqrt(reg1[1]) * (wp - bl)}
        outs.append(m.YOND_SIDD.VST_Denoiser(fake, noisy, bias_corr="pre",
                                             denoiser="gru", p=p))
        regs.append(tuple(map(float, reg1)))
    return outs, regs


def test_golden_gate_vs_reference_pipeline(shipped_flax, ref_pipeline):
    model, params = shipped_flax
    m, fake = ref_pipeline
    noisy, clean = _make_scene()

    ref_outs, ref_regs = _run_reference(m, fake, noisy)

    den = VSTDenoiser(model, params, guided=True, bias_corr="pre",
                      vst_type="exact")
    # iter_policy 'replace' = the reference's own round semantics (the
    # product default may blend/guard rounds; this test verifies parity
    # of the raw machinery against the reference, so pin replace)
    eng = YONDEngine(den, PipelineConfig(
        est_type="simple", max_iter=1,
        extras={"iter_policy": "replace"}),
        biaslut=BiasLUT(os.path.abspath(LUT_NPY)))
    res = eng.iter_denoise(
        {"lr": noisy},
        {"wp": 1023, "bl": 64, "ratio": 1, "scale": 959.0,
         "gain": 1.0, "sigma": 0.0})

    assert len(res["raw_dns"]) == len(ref_outs) == 2
    # NLE betas: rel err < 1e-3 per round
    for (b1r, b2r), (b1, b2) in zip(ref_regs, res["regs"]):
        assert abs(b1 - b1r) < 1e-3 * abs(b1r), (b1, b1r)
        assert abs(b2 - b2r) < 1e-3 * abs(b2r) + 1e-9, (b2, b2r)
    # per-round PSNR within 0.05 dB of the reference pipeline
    for it, (ours, ref) in enumerate(zip(res["raw_dns"], ref_outs)):
        p_ref = _psnr(ref, clean)
        p_our = _psnr(ours, clean)
        assert abs(p_our - p_ref) < 0.05, (it, p_our, p_ref)
        # and the two pipelines agree pixelwise far below the noise floor
        assert np.mean(np.abs(np.asarray(ours) - ref)) < 2e-4, it
    # the pipeline actually denoises (sanity, not a tuned bar)
    assert _psnr(res["raw_dns"][-1], clean) > _psnr(noisy, clean) + 3


UNET_CKPT = os.path.join(os.path.dirname(__file__), "..",
                         "checkpoints/Gaussian/"
                         "Gaussian_Unet_mix_5to50_norm_best_model.ckpt")
UARCH = {"name": "UNetSeeInDark", "guided": False, "in_nc": 4,
         "out_nc": 4, "nf": 32, "nframes": 1, "res": True, "norm": True}


def _make_textured_scene(seed=31, H=512, W=1024, K=8.74, sig=12.81,
                         scale=959.0):
    """Sinusoid bands + smooth field + a few flat patches: gradient
    energy at every scale, so the NLE mask/threshold actually bite."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = 0.45 + 0.15 * np.sin(0.11 * xx + 0.05 * yy) \
        * np.sin(0.013 * yy - 0.007 * xx)
    img += 0.1 * np.sin(0.002 * (xx + 0.5 * yy)) ** 2
    for _ in range(6):                       # flat patches for the fit
        y0, x0 = rng.integers(0, H - 96), rng.integers(0, W - 96)
        h, w = rng.integers(64, 160, 2)
        img[y0:y0 + h, x0:x0 + w] = rng.random() * 0.6 + 0.15
    clean = np.clip(img, 0.02, 0.9).astype(np.float32)
    noisy = (K * rng.poisson(clean * scale / K)
             + rng.normal(0, sig, clean.shape)).astype(np.float32) / scale
    return np.clip(noisy, 0, 1), clean


def _make_gradient_scene(seed=32, H=512, W=1024, K=8.74, sig=12.81,
                         scale=959.0):
    """Smooth ramps + a radial bowl: no hard edges, the regime where the
    inner-blur texture map rides its noise floor."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    cy, cx = rng.random(2) * [H, W]
    r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
    img = 0.15 + 0.6 * (xx / W) * (0.4 + 0.6 * yy / H)
    img += 0.2 * np.clip(1 - r / (0.7 * W), 0, 1)
    clean = np.clip(img, 0.02, 0.9).astype(np.float32)
    noisy = (K * rng.poisson(clean * scale / K)
             + rng.normal(0, sig, clean.shape)).astype(np.float32) / scale
    return np.clip(noisy, 0, 1), clean


_SCENES = {"flat": _make_scene, "textured": _make_textured_scene,
           "gradient": _make_gradient_scene}


@pytest.fixture(scope="module")
def shipped_unet_flax():
    from yondx.train.ckpt import load_checkpoint
    if not os.path.exists(UNET_CKPT):
        pytest.skip("shipped UNetSeeInDark weights unavailable")
    model = build_model(UARCH)
    params = init_params(model, jax.random.PRNGKey(0), (1, 64, 64, 4),
                         guided=False)
    params = load_checkpoint(UNET_CKPT, params)["params"]
    return model, params


@pytest.fixture(scope="module")
def ref_unet_pipeline(shipped_unet_flax):
    """Reference pipeline object with the ported non-guided SID UNet —
    the reference's 'unetn' denoiser_type branch. The arch dict must NOT
    carry a 'guided' key: the reference dispatches on key presence
    (YOND_SIDD.py:284 `'guided' in self.arch`)."""
    from yondx.models.torch_port import unetseeindark_to_torch
    from ref_compat import load_reference_yond
    m = load_reference_yond()
    _, params = shipped_unet_flax
    tnet = m.UNetSeeInDark(dict(UARCH))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in unetseeindark_to_torch(params).items()}
    tnet.load_state_dict(sd, strict=True)
    tnet.eval()
    fake = types.SimpleNamespace(
        net=tnet, device=torch.device("cpu"),
        biaslut=m.BiasLUT(os.path.abspath(LUT_NPY)),
        arch={k: v for k, v in UARCH.items() if k != "guided"},
        pipe={"vst_type": "exact", "max_iter": 1},
    )
    return m, fake


@pytest.mark.parametrize("scene_kind", ["flat", "textured", "gradient"])
@pytest.mark.parametrize("den_kind", ["gru", "unetn"])
def test_golden_gate_matrix(scene_kind, den_kind, shipped_flax,
                            ref_pipeline, shipped_unet_flax,
                            ref_unet_pipeline):
    """3 scene classes x 2 denoiser types at the same parity gate
    (round-3 verdict Next #7): textured/gradient content exercises the
    NLE threshold selection and mask paths the flat scene never touches;
    unetn exercises the non-guided VST branch (no t, no sigma_corr)."""
    if den_kind == "gru":
        model, params = shipped_flax
        m, fake = ref_pipeline
        guided = True
    else:
        model, params = shipped_unet_flax
        m, fake = ref_unet_pipeline
        guided = False
    noisy, clean = _SCENES[scene_kind]()

    ref_outs, ref_regs = _run_reference(m, fake, noisy)

    den = VSTDenoiser(model, params, guided=guided, bias_corr="pre",
                      vst_type="exact")
    # replace + robust OFF: this gate verifies the reference machinery's
    # numerics; the robust NLE and the rescue policy are yondx additions
    # gated by their own tests
    eng = YONDEngine(den, PipelineConfig(
        est_type="simple", max_iter=1,
        extras={"iter_policy": "replace", "robust_nle": False}),
        biaslut=BiasLUT(os.path.abspath(LUT_NPY)))
    res = eng.iter_denoise(
        {"lr": noisy},
        {"wp": 1023, "bl": 64, "ratio": 1, "scale": 959.0,
         "gain": 1.0, "sigma": 0.0})

    assert len(res["raw_dns"]) == len(ref_outs)
    for (b1r, b2r), (b1, b2) in zip(ref_regs, res["regs"]):
        assert abs(b1 - b1r) < 1e-3 * abs(b1r) + 1e-9, (b1, b1r)
        assert abs(b2 - b2r) < 1e-3 * abs(b2r) + 1e-9, (b2, b2r)
    for it, (ours, ref) in enumerate(zip(res["raw_dns"], ref_outs)):
        p_ref = _psnr(ref, clean)
        p_our = _psnr(ours, clean)
        assert abs(p_our - p_ref) < 0.05, (it, p_our, p_ref)
        assert np.mean(np.abs(np.asarray(ours) - ref)) < 2e-4, it


def test_golden_gate_vst_denoiser_single_stage(shipped_flax, ref_pipeline):
    """One VST_Denoiser pass at FIXED (K, sigma): isolates the VST + bias +
    net + inverse numerics from the NLE (tighter than the full gate)."""
    model, params = shipped_flax
    m, fake = ref_pipeline
    noisy, _ = _make_scene(seed=5, H=256, W=512)
    K, sig, scale = 8.74, 12.81, 959.0
    p = {"scale": scale, "gain": K, "sigma": sig}
    ref = m.YOND_SIDD.VST_Denoiser(fake, noisy, bias_corr="pre",
                                   denoiser="gru", p=p)

    den = VSTDenoiser(model, params, guided=True, bias_corr="pre",
                      vst_type="exact")
    lut = BiasLUT(os.path.abspath(LUT_NPY))
    ours = np.asarray(den(jnp.asarray(noisy), lut.curve(K, sig),
                          K, sig, scale))
    assert np.max(np.abs(ours - ref)) < 2e-3
    assert np.mean(np.abs(ours - ref)) < 5e-5

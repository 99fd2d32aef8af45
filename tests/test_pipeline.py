"""Pipeline tests: VST chain algebra with an identity network, engine
iteration behavior with guards, tiled runner exactness, metrics parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yondx.pipeline import VSTDenoiser, SimpleDenoiser, YONDEngine, \
    PipelineConfig, TiledRunner
from yondx.vst.lut import FULL_X_GRID
from yondx.eval import psnr, matlab_ssim


class _IdentityModel:
    """model.apply that returns its input (ignores guidance)."""

    def apply(self, params, x, t=None):
        return x


def test_vst_chain_is_identity_with_identity_net():
    """With an identity net, no bias correction, and the asymptotic
    inverse, the VST chain must reproduce its input exactly (algebraic
    inverse): checks the scale/normalize/un-normalize wiring."""
    den = VSTDenoiser(_IdentityModel(), None, guided=False,
                      bias_corr=None, vst_type="asym")
    x = np.random.rand(2, 64, 64).astype(np.float32)
    out = np.asarray(den(jnp.asarray(x),
                         np.zeros(len(FULL_X_GRID), np.float32),
                         K=8.74, sigma=12.81, scale=959.0))
    np.testing.assert_allclose(out, x, atol=2e-3)


def test_vst_chain_bias_pre_shifts_input():
    """bias_corr='pre' subtracts the (negative at low flux) bias before the
    net; with an identity net the output differs from the no-bias path by
    the bias propagated through the inverse."""
    curve = np.full(len(FULL_X_GRID), -0.05, np.float32)
    den_pre = VSTDenoiser(_IdentityModel(), None, guided=False,
                          bias_corr="pre", vst_type="exact")
    den_none = VSTDenoiser(_IdentityModel(), None, guided=False,
                           bias_corr=None, vst_type="asym")
    x = np.random.rand(1, 32, 32).astype(np.float32) * 0.5 + 0.2
    y_pre = np.asarray(den_pre(jnp.asarray(x), curve, 8.0, 10.0, 959.0))
    y_none = np.asarray(den_none(jnp.asarray(x),
                                 np.zeros_like(curve), 8.0, 10.0, 959.0))
    # constant -0.05 bias in VST space -> output larger than input path
    assert (y_pre - y_none).mean() > 1e-4


def _tiny_gru(key=0, nf=8):
    from yondx.models import build_model
    from yondx.models.registry import init_params
    arch = {"name": "GuidedResUnet", "guided": True, "in_nc": 4,
            "out_nc": 4, "nf": nf, "nframes": 1, "res": True, "norm": True}
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(key), (1, 32, 32, 4))
    return model, params


class _BlurModel:
    """A stand-in 'denoiser': box blur in normalized VST space."""

    def apply(self, params, x, t=None):
        from yondx.nle import box_mean
        return box_mean(x, 7)


def test_engine_two_rounds_and_guards():
    den = VSTDenoiser(_BlurModel(), None, guided=False, bias_corr="pre",
                      vst_type="exact")
    pipe = PipelineConfig(full_est=True, est_type="simple", k=29,
                          iter="iter", max_iter=1)
    eng = YONDEngine(den, pipe)

    # synthetic scene: 2 crops of 512x512 bayer, 256-px flat patches so the
    # 29-px rggb NLE window sits inside flat regions
    rng = np.random.default_rng(5)
    wp, bl = 1023, 64
    clean = np.kron(rng.random((2, 2, 2)) * 0.6 + 0.1,
                    np.ones((1, 256, 256)))
    K_true, sig_true = 6.0, 8.0
    scale = wp - bl
    electrons = clean * scale / K_true
    noisy = (K_true * rng.poisson(electrons) +
             rng.normal(0, sig_true, clean.shape)) / scale
    noisy = noisy.astype(np.float32)

    p = {"wp": wp, "bl": bl, "ratio": 1, "scale": float(scale),
         "gain": 1.0, "sigma": 0.0}
    res = eng.iter_denoise({"lr": noisy}, p)
    assert len(res["raw_dns"]) == 2          # round 0 + 1 collab iter
    assert len(res["regs"]) == 2
    b1, b2 = res["regs"][0]
    K_est = b1 * scale
    assert abs(K_est - K_true) / K_true < 0.3, K_est  # self-est accuracy
    for dn in res["raw_dns"]:
        assert dn.shape == noisy.shape
        assert np.isfinite(dn).all()
        assert dn.min() >= 0 and dn.max() <= 1
    # the blur denoiser must actually denoise in raw domain
    from yondx.eval import psnr
    assert float(psnr(res["raw_dns"][0], clean)) > \
        float(psnr(noisy, clean)) + 3.0
    # policy telemetry: one signal row per collab iteration, with the
    # signed disagreement, the dn0 noise fraction (telemetry), the
    # input-floor fraction (the rescue gate), and the fire decision
    # (feeds scripts/sweep_policy.py)
    assert len(res["signals"]) == 1
    sig = res["signals"][0]
    assert set(sig) == {"agree", "frac", "ffrac", "fired"}
    assert np.isfinite(sig["agree"]) and np.isfinite(sig["frac"])
    assert np.isfinite(sig["ffrac"])
    assert isinstance(sig["fired"], bool)


def test_engine_guard_aborts_on_bad_denoiser():
    """A pathological denoiser (adds huge noise) must trip the beta1<0 /
    negative-variance guards and keep only the round-0 result."""
    class _NoiseModel:
        def apply(self, params, x, t=None):
            # deterministic high-frequency garbage
            return jnp.sin(x * 397.0) * 0.5 + 0.5

    den = VSTDenoiser(_NoiseModel(), None, guided=False, bias_corr=None,
                      vst_type="asym")
    pipe = PipelineConfig(full_est=True, est_type="simple", k=29,
                          bias_corr=None, iter="iter", max_iter=1)
    eng = YONDEngine(den, pipe)
    rng = np.random.default_rng(7)
    clean = np.kron(rng.random((1, 2, 2)) * 0.5 + 0.2,
                    np.ones((1, 128, 128))).astype(np.float32)
    noisy = clean + rng.normal(0, 0.03, clean.shape).astype(np.float32)
    p = {"wp": 1023, "bl": 64, "ratio": 1, "scale": 959.0,
         "gain": 1.0, "sigma": 0.0}
    res = eng.iter_denoise({"lr": noisy.astype(np.float32)}, p)
    assert len(res["raw_dns"]) in (1, 2)  # guard may abort round 2
    assert np.isfinite(res["raw_dns"][-1]).all()


def test_tiled_runner_matches_whole_frame():
    """Interior-exact tiling: tiled inference == whole-frame inference
    when the halo covers the receptive field (identity net -> trivially
    true; checks the stitch indexing)."""
    den = VSTDenoiser(_IdentityModel(), None, guided=False,
                      bias_corr=None, vst_type="asym")
    runner = TiledRunner(den, tile=64, halo=16, batch=4)
    frame = np.random.rand(150, 202).astype(np.float32)
    curve = np.zeros(len(FULL_X_GRID), np.float32)
    tiled = runner(frame, curve, 8.0, 10.0, 959.0)
    whole = np.asarray(den(jnp.asarray(frame), curve, 8.0, 10.0, 959.0))
    np.testing.assert_allclose(tiled, whole, atol=2e-3)
    assert tiled.shape == frame.shape


def test_psnr_matches_formula():
    a = np.random.rand(16, 16).astype(np.float32)
    b = np.random.rand(16, 16).astype(np.float32)
    ref = 10 * np.log10(1.0 / np.mean((a - b) ** 2))
    assert abs(float(psnr(a, b)) - ref) < 1e-4


def test_matlab_ssim_matches_reference_impl():
    import cv2

    def ref_ssim(img1, img2):
        C1, C2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
        img1 = img1.astype(np.float64)
        img2 = img2.astype(np.float64)
        kernel = cv2.getGaussianKernel(11, 1.5)
        window = np.outer(kernel, kernel.transpose())
        mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
        mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
        mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
        s1 = cv2.filter2D(img1 ** 2, -1, window)[5:-5, 5:-5] - mu1_sq
        s2 = cv2.filter2D(img2 ** 2, -1, window)[5:-5, 5:-5] - mu2_sq
        s12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
        m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / \
            ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
        return m.mean()

    a = (np.random.rand(64, 64) * 255).astype(np.float32)
    b = np.clip(a + np.random.randn(64, 64) * 10, 0, 255).astype(np.float32)
    ref = ref_ssim(a, b)
    got = float(matlab_ssim(a, b))
    assert abs(got - ref) < 1e-4, (got, ref)


def test_fbi_variant_runs():
    """fbi denoiser path: min/max VST normalization + bayer-domain net."""
    from yondx.models import build_model
    from yondx.models.registry import init_params
    import jax
    arch = {"name": "FBI_Net", "nf": 8, "num_of_layers": 3, "mul": 1,
            "channel": 1, "output_channel": 1, "case": "FBI_Net",
            "output_type": "linear", "sigmoid_value": 0.1, "res": False,
            "in_nc": 1, "out_nc": 1}
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(0), (1, 64, 64, 1),
                        guided=False)
    den = VSTDenoiser(model, params, guided=False, bias_corr=None,
                      vst_type="asym", fbi=True)
    x = np.random.rand(2, 64, 64).astype(np.float32)
    out = np.asarray(den(jnp.asarray(x),
                         np.zeros(len(FULL_X_GRID), np.float32),
                         8.0, 10.0, 959.0))
    assert out.shape == x.shape and np.isfinite(out).all()


def test_adaptive_sigma_corr_rule():
    """The blind guidance-scale rule (pipeline/denoiser.py, measured in
    docs/sigma_corr_blind_r5.json): noise band picks the base value
    (lo 1.03 / mid 1.08 / hi 1.00) and heavy clipping with MAD/fit
    agreement boosts to 1.25."""
    from yondx.pipeline.denoiser import adaptive_sigma_corr
    rng = np.random.default_rng(7)
    scale = 959.0

    def synth(K, sigma, sat_frac=0.0):
        clean = np.full((512, 512, 4), 0.45, np.float32)
        if sat_frac:
            clean[: int(512 * sat_frac)] = 1.0
        e = clean * scale / K
        noisy = (K * rng.poisson(e) + rng.normal(0, sigma, clean.shape)) \
            / scale
        return jnp.asarray(np.clip(noisy, 0, 1).astype(np.float32))

    def corr(K, sigma, **kw):
        return float(adaptive_sigma_corr(synth(K, sigma, **kw),
                                         jnp.float32(K),
                                         jnp.float32(sigma),
                                         jnp.float32(scale)))

    def close(a, b):
        return abs(a - b) < 1e-3       # float32 constant comparison

    assert close(corr(1.0, 1.5), 1.03)    # low band (nsr ~ 0.017)
    assert close(corr(10.0, 10.0), 1.08)  # mid band (nsr ~ 0.055)
    assert close(corr(40.0, 30.0), 1.00)  # high band (nsr ~ 0.11)
    # half-saturated + matching noise model -> clip boost fires (only
    # ~57% of saturated pixels stay within the 2% white-clip window
    # once noise is added, so sat_frac=0.5 ~ clip_frac 0.28)
    assert close(corr(10.0, 10.0, sat_frac=0.5), 1.25)
    # clipped but MAD/fit DISAGREE (model far above the frame's real
    # noise) -> boost vetoed, band base kept
    frame = synth(10.0, 10.0, sat_frac=0.5)
    assert not close(float(adaptive_sigma_corr(frame, jnp.float32(30.0),
                                               jnp.float32(25.0),
                                               jnp.float32(scale))), 1.25)


def test_vst_denoiser_adaptive_corr_runs():
    """sigma_corr='adaptive' threads through VSTDenoiser end-to-end."""
    den = VSTDenoiser(_IdentityModel(), None, guided=False,
                      bias_corr=None, vst_type="asym",
                      sigma_corr="adaptive")
    x = np.random.rand(2, 64, 64).astype(np.float32)
    out = np.asarray(den(jnp.asarray(x),
                         np.zeros(len(FULL_X_GRID), np.float32),
                         8.0, 10.0, 959.0))
    assert out.shape == x.shape and np.isfinite(out).all()


def test_tiled_adaptive_corr_is_frame_scoped():
    """With sigma_corr='adaptive', the tiled runner must resolve the
    guidance scale ONCE per frame (whole-frame statistics), not per
    tile batch — per-batch resolution steps the scale between
    neighboring tiles when batches straddle the clip threshold (a
    seam). With a t-sensitive model, tiled == whole-frame iff the same
    corr reaches every tile."""
    class _TModel:
        """Output shifts by the guidance scalar — exposes corr in the
        output so a corr mismatch between tiles breaks equality."""

        def apply(self, params, x, t):
            return jnp.clip(x + 0.05 * t[:, None, None, None], 0.0, 1.0)

    den = VSTDenoiser(_TModel(), None, guided=True, bias_corr=None,
                      vst_type="asym", sigma_corr="adaptive")
    rng = np.random.default_rng(9)
    frame = np.full((256, 256), 0.4, np.float32)
    frame[:, :96] = 1.0                      # saturated band: some tiles
    frame += rng.normal(0, 0.01, frame.shape).astype(np.float32)
    frame = np.clip(frame, 0, 1)
    curve = np.zeros(len(FULL_X_GRID), np.float32)
    runner = TiledRunner(den, tile=64, halo=16, batch=2)
    tiled, _ = runner.run_pair(frame, curve, 8.0, 10.0, 959.0)
    whole, _ = den.denoise_pair(jnp.asarray(frame), curve,
                                8.0, 10.0, 959.0)
    np.testing.assert_allclose(tiled, np.asarray(whole), atol=2e-3)

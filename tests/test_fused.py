"""Fused single-jit pipeline: must agree with the orchestrated engine."""
import numpy as np
import jax
import jax.numpy as jnp

from yondx.isp import bayer2rggb
from yondx.pipeline import VSTDenoiser, YONDEngine, PipelineConfig
from yondx.pipeline.fused import make_fused_blind_denoiser, device_bias_curve
from yondx.vst.lut import BiasLUT, bias_curve_for


class _BlurModel:
    def apply(self, params, x, t=None):
        from yondx.nle import box_mean
        return box_mean(x, 7)


def _scene(rng, K_true=6.0, sig_true=8.0, scale=959.0):
    clean = np.kron(rng.random((2, 2, 2)) * 0.6 + 0.1,
                    np.ones((1, 256, 256)))
    electrons = clean * scale / K_true
    noisy = (K_true * rng.poisson(electrons) +
             rng.normal(0, sig_true, clean.shape)) / scale
    return clean, np.clip(noisy, 0, 1).astype(np.float32)


def test_device_curve_matches_host_curve():
    lut = BiasLUT()
    for K, sigma in [(8.74, 12.81), (2.0, 1.0), (20.0, 5.0)]:
        host = bias_curve_for(K, sigma, lut.lut)
        dev = np.asarray(device_bias_curve(jnp.asarray(lut.lut),
                                           jnp.float32(K),
                                           jnp.float32(sigma)))
        np.testing.assert_allclose(dev, host, atol=2e-4, rtol=1e-3)


def test_device_curve_exact_beyond_sg10():
    """Fused device bias for sg = sigma/K > 10 e- must match the host's
    exact out-of-range evaluation (reference isp_algos.py:204-212) to
    <1e-3 VST units — the round-1 closed-form fallback lost accuracy in
    exactly the extreme-read-noise regime bias correction exists for."""
    from yondx.vst.lut import load_sgext_lut
    lut = BiasLUT()
    sgext = jnp.asarray(load_sgext_lut())
    for K, sigma in [(1.0, 12.0), (1.0, 20.0), (2.0, 30.0), (1.0, 150.0)]:
        host = bias_curve_for(K, sigma, lut.lut)
        dev = np.asarray(device_bias_curve(jnp.asarray(lut.lut),
                                           jnp.float32(K),
                                           jnp.float32(sigma), sgext))
        assert np.max(np.abs(dev - host)) < 1e-3, (K, sigma)


def test_fused_matches_engine():
    rng = np.random.default_rng(11)
    clean, noisy = _scene(rng)
    lut = BiasLUT()

    den = VSTDenoiser(_BlurModel(), None, guided=False, bias_corr="pre",
                      vst_type="exact")
    eng = YONDEngine(den, PipelineConfig(est_type="simple", max_iter=1),
                     biaslut=lut)
    p = {"wp": 1023, "bl": 64, "ratio": 1, "scale": 959.0,
         "gain": 1.0, "sigma": 0.0}
    ref = eng.iter_denoise({"lr": noisy}, p)

    fused = make_fused_blind_denoiser(_BlurModel(), None, lut.lut,
                                      guided=False, max_iter=1)
    rggb = bayer2rggb(jnp.asarray(noisy))
    dn, regs = fused(rggb, jnp.float32(959.0))
    regs = np.asarray(regs)

    # NLE params agree
    np.testing.assert_allclose(regs[0], ref["regs"][0], rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(regs[1], ref["regs"][1], rtol=1e-2, atol=1e-6)
    # final output agrees with the engine's final round
    from yondx.isp import rggb2bayer
    out = np.asarray(rggb2bayer(dn))
    np.testing.assert_allclose(out, ref["raw_dns"][-1], atol=1e-3)


def test_fused_single_dispatch_and_improves_psnr():
    from yondx.eval import psnr
    rng = np.random.default_rng(3)
    clean, noisy = _scene(rng)
    lut = BiasLUT()
    fused = make_fused_blind_denoiser(_BlurModel(), None, lut.lut,
                                      guided=False, max_iter=1)
    rggb = bayer2rggb(jnp.asarray(noisy))
    dn, regs = fused(rggb, jnp.float32(959.0))
    from yondx.isp import rggb2bayer
    out = np.asarray(rggb2bayer(dn))
    assert float(psnr(out, clean)) > float(psnr(noisy, clean)) + 3.0


def test_hist_threshold_close_to_sort():
    """Histogram percentiles track exact percentiles to bin width, and the
    resulting NLE params agree closely."""
    rng = np.random.default_rng(9)
    clean, noisy = _scene(rng)
    lut = BiasLUT()
    f_sort = make_fused_blind_denoiser(_BlurModel(), None, lut.lut,
                                       guided=False, max_iter=0,
                                       th_impl="sort")
    f_hist = make_fused_blind_denoiser(_BlurModel(), None, lut.lut,
                                       guided=False, max_iter=0,
                                       th_impl="hist")
    rggb = bayer2rggb(jnp.asarray(noisy))
    _, r_sort = f_sort(rggb, jnp.float32(959.0))
    _, r_hist = f_hist(rggb, jnp.float32(959.0))
    np.testing.assert_allclose(np.asarray(r_hist), np.asarray(r_sort),
                               rtol=0.05, atol=1e-6)


def test_frames_batch_mode_per_frame_params():
    """batch_mode='frames': independent frames get independent (K, sigma)
    and match scene-mode single-frame results."""
    rng = np.random.default_rng(21)
    lut = BiasLUT()
    scenes = [_scene(np.random.default_rng(s), K_true=k)[1][:1]
              for s, k in ((1, 4.0), (2, 12.0))]
    frames = np.concatenate(scenes, axis=0)  # [2, 512, 512]
    rggb = bayer2rggb(jnp.asarray(frames))

    fb = make_fused_blind_denoiser(_BlurModel(), None, lut.lut,
                                   guided=False, max_iter=1,
                                   batch_mode="frames")
    dn, regs = fb(rggb, jnp.float32(959.0))
    regs = np.asarray(regs)
    assert regs.shape == (2, 2, 2)
    K0, K1 = regs[0, 0, 0] * 959, regs[1, 0, 0] * 959
    assert abs(K0 - 4.0) / 4.0 < 0.3 and abs(K1 - 12.0) / 12.0 < 0.3

    # matches the scene-mode result frame by frame
    fs = make_fused_blind_denoiser(_BlurModel(), None, lut.lut,
                                   guided=False, max_iter=1)
    for i in range(2):
        dn_i, regs_i = fs(rggb[i:i + 1], jnp.float32(959.0))
        np.testing.assert_allclose(np.asarray(dn[i]), np.asarray(dn_i[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(regs[i], np.asarray(regs_i), rtol=1e-3,
                                   atol=1e-7)


def test_fused_refine_robust_matches_engine_and_improves():
    """The product config (refine + robust_nle) in ONE jit matches the
    orchestrated engine with the same options and beats the un-refined
    output on a blur 'denoiser' (which over-smooths by construction)."""
    from yondx.eval import psnr
    from yondx.isp import rggb2bayer
    rng = np.random.default_rng(17)
    clean, noisy = _scene(rng)
    lut = BiasLUT()

    den = VSTDenoiser(_BlurModel(), None, guided=False, bias_corr="pre",
                      vst_type="exact", refine=True, refine_floor="local")
    eng = YONDEngine(den, PipelineConfig(est_type="simple", max_iter=1),
                     biaslut=lut)
    p = {"wp": 1023, "bl": 64, "ratio": 1, "scale": 959.0,
         "gain": 1.0, "sigma": 0.0}
    ref = eng.iter_denoise({"lr": noisy}, p)

    fused = make_fused_blind_denoiser(_BlurModel(), None, lut.lut,
                                      guided=False, max_iter=1,
                                      refine=True, refine_floor="local",
                                      robust_nle=True)
    rggb = bayer2rggb(jnp.asarray(noisy))
    dn, regs = fused(rggb, jnp.float32(959.0))
    out = np.asarray(rggb2bayer(dn))
    np.testing.assert_allclose(out, ref["raw_dns"][-1], atol=1e-3)

    plain = make_fused_blind_denoiser(_BlurModel(), None, lut.lut,
                                      guided=False, max_iter=1,
                                      refine=False, robust_nle=True)
    dn0, _ = plain(rggb, jnp.float32(959.0))
    out0 = np.asarray(rggb2bayer(dn0))
    # blur destroys block edges; the refinement restores them
    assert float(psnr(out, clean)) > float(psnr(out0, clean)) + 0.5


def test_fused_abort_guard_keeps_round0_and_repeats_reg():
    """Aborted iteration in FUSED mode (collab beta1 < 0): the output must
    stay the round-0 result and regs must append the PREVIOUS round's reg.

    The reg-append is the documented deviation from the reference, which
    keeps the iter-0 output and appends NOTHING on abort
    (YOND_SIDD.py:445-447) — the fused graph is static, so regs has a fixed
    [max_iter+1, 2] shape and repeats the last good reg instead
    (fused.py guard selects). The denoised output contract is identical.

    Trip mechanism: a 'denoiser' whose output noise amplitude GROWS with
    brightness makes collab var = var_lr - var_dn decrease with mean, so
    the masked line fit returns a negative slope (beta1 < 0). Built with
    robust_nle=False: the guard path is what's under test, and the robust
    MAD cross-check would legitimately rescue this degenerate fit instead
    of aborting (the guard still protects the non-robust configs).
    """
    class _BrightNoiseModel:
        def apply(self, params, x, t=None):
            # deterministic high-frequency garbage, amplitude ~ x
            return jnp.clip(x + 0.4 * x * jnp.sin(x * 397.0), 0.0, 1.0)

    rng = np.random.default_rng(17)
    _, noisy = _scene(rng)
    lut = BiasLUT()
    f0 = make_fused_blind_denoiser(_BrightNoiseModel(), None, lut.lut,
                                   guided=False, max_iter=0,
                                   robust_nle=False)
    f1 = make_fused_blind_denoiser(_BrightNoiseModel(), None, lut.lut,
                                   guided=False, max_iter=1,
                                   robust_nle=False)
    rggb = bayer2rggb(jnp.asarray(noisy))
    dn0, regs0 = f0(rggb, jnp.float32(959.0))
    dn1, regs1 = f1(rggb, jnp.float32(959.0))
    regs1 = np.asarray(regs1)

    # the guard must actually have tripped: an un-aborted round would have
    # appended a (c1, c2) differing from round 0
    np.testing.assert_array_equal(regs1[1], regs1[0])
    np.testing.assert_array_equal(np.asarray(regs0[0]), regs1[0])
    # and the output is the round-0 output, untouched by round 1
    np.testing.assert_allclose(np.asarray(dn1), np.asarray(dn0), atol=1e-6)

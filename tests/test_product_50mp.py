"""The 12-50 MP product path (round-3 verdict Next #3): full iterated
pipeline on the overlap-tiled runner, and its row-sharded multi-chip
analog (parallel.product), both matching the whole-frame engine.

Small frames stand in for 50 MP ones: the code paths are size-blind (the
driver's dryrun_multichip exercises the sharded route at ~50 MP for
real), and CPU tests need to stay fast.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yondx.pipeline import VSTDenoiser, YONDEngine, PipelineConfig
from yondx.pipeline.policy import combine_rounds, reg_agreement
from yondx.vst.lut import FULL_X_GRID


class _BlurModel:
    """3x3 mean filter per channel: a real (if weak) denoiser with a
    1-px receptive field — tiled/sharded halos trivially cover it, so
    path equivalence is exact up to stitch indexing. Reflect padding
    matches the tiled runner's frame-edge convention (np_tile_overlap
    reflect-pads the frame), so whole-frame and tiled borders agree."""

    def apply(self, params, x, t=None):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        k = jnp.ones((3, 3, 1, 1), jnp.float32) / 9.0
        k = jnp.tile(k, (1, 1, 1, x.shape[-1]))
        return jax.lax.conv_general_dilated(
            xp, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x.shape[-1])


def _scene(seed=3, H=384, W=384, noise=0.02):
    rng = np.random.default_rng(seed)
    clean = np.kron(rng.random((4, 4)) * 0.6 + 0.2,
                    np.ones((H // 4, W // 4))).astype(np.float32)
    noisy = np.clip(clean + rng.normal(0, noise, clean.shape), 0, 1)
    return clean, noisy.astype(np.float32)


def _engine(extras=None):
    den = VSTDenoiser(_BlurModel(), None, guided=False, bias_corr=None,
                      vst_type="asym")
    pipe = PipelineConfig(est_type="simple", bias_corr=None, max_iter=1,
                          extras=dict(extras or {}))
    return YONDEngine(den, pipe)


P0 = {"wp": 1023, "bl": 64, "ratio": 1, "scale": 959.0,
      "gain": 1.0, "sigma": 0.0}


def test_tiled_iteration_matches_whole_frame_engine():
    """iter_denoise_tiled = iter_denoise when the halo covers the
    receptive field: same NLE (whole frame both rounds), same guards,
    same policy, same per-round outputs."""
    clean, noisy = _scene()
    eng = _engine()
    res_whole = eng.iter_denoise({"lr": noisy}, dict(P0))
    res_tiled = eng.iter_denoise_tiled({"lr": noisy}, dict(P0),
                                       tile=128, halo=32)
    assert len(res_whole["raw_dns"]) == len(res_tiled["raw_dns"])
    # regs agree as NOISE MODELS (predicted total variance at the scene
    # mean) — raw beta1 is ~0 on pure-Gaussian content and its tiny
    # tile-border jitter is meaningless relative to the model
    mu = float(np.mean(noisy))
    for rw, rt in zip(res_whole["regs"], res_tiled["regs"]):
        vw = rw[0] * mu + rw[1]
        vt = rt[0] * mu + rt[1]
        assert abs(vt - vw) <= 0.03 * vw, (rw, rt)
    # interiors are exact up to the tiny collab-reg jitter; the outermost
    # frame rows differ by pad convention (the tiled path reflects in the
    # BAYER domain, the toy model in the packed domain — a 1-px frame-
    # border effect only)
    for dw, dt in zip(res_whole["raw_dns"], res_tiled["raw_dns"]):
        np.testing.assert_allclose(dt[8:-8, 8:-8],
                                   np.asarray(dw)[8:-8, 8:-8], atol=1e-3)


def test_tiled_iteration_runs_collab_round():
    """The tiled path must actually iterate (round-3 verdict Missing #3:
    it used to stop after one pass): two rounds, second reg from the
    collaborative estimate."""
    clean, noisy = _scene(noise=0.04)
    eng = _engine({"iter_policy": "replace"})
    res = eng.iter_denoise_tiled({"lr": noisy}, dict(P0),
                                 tile=128, halo=32)
    assert len(res["raw_dns"]) == 2 and len(res["regs"]) == 2
    assert res["regs"][1] != res["regs"][0]


def test_sharded_product_matches_tiled_1pct():
    """The row-sharded mesh route (parallel.product) matches the
    single-device tiled route to <=1% relative on the product frame
    (verdict Next #3 done-criterion)."""
    from yondx.parallel import make_mesh
    from yondx.parallel.product import iter_denoise_frame_sharded
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(8)
    clean, noisy = _scene(H=512, W=512, noise=0.03)
    eng = _engine()
    res_tiled = eng.iter_denoise_tiled({"lr": noisy}, dict(P0),
                                       tile=128, halo=32)
    # 512-bayer frame -> 256 packed rows -> 32-row shards: halo must stay
    # under the shard height (one-neighbor ppermute exchange)
    res_shard = iter_denoise_frame_sharded(mesh, eng, noisy, dict(P0),
                                           halo=16)
    assert len(res_shard["raw_dns"]) == len(res_tiled["raw_dns"])
    # regs agree as NOISE MODELS to <=1% (raw beta1 is ~0 on Gaussian
    # content; its jitter is meaningless, as in the whole-frame test)
    mu = float(np.mean(noisy))
    for rt, rs in zip(res_tiled["regs"], res_shard["regs"]):
        vt = rt[0] * mu + rt[1]
        vs = rs[0] * mu + rs[1]
        assert abs(vs - vt) <= 0.01 * vt, (rt, rs)
    dt = res_tiled["raw_dns"][-1]
    ds = res_shard["raw_dns"][-1]
    assert ds.shape == dt.shape == noisy.shape
    rel = np.abs(ds - dt).mean() / max(dt.mean(), 1e-9)
    assert rel <= 0.01, rel


def test_sharded_product_with_refine_and_trained_shapes():
    """Smoke: the sharded route with refine=True (the product config)
    stays finite and in range on a guided tiny net."""
    from yondx.models import build_model
    from yondx.models.registry import init_params
    from yondx.parallel import make_mesh
    from yondx.parallel.product import iter_denoise_frame_sharded
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(8)
    arch = {"name": "GuidedResUnet", "guided": True, "in_nc": 4,
            "out_nc": 4, "nf": 4, "nframes": 1, "res": True, "norm": True}
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(0), (1, 64, 64, 4))
    den = VSTDenoiser(model, params, guided=True, bias_corr="pre",
                      vst_type="exact", refine=True, refine_floor="local")
    from yondx.vst.lut import BiasLUT
    eng = YONDEngine(den, PipelineConfig(est_type="simple", max_iter=1),
                     biaslut=BiasLUT())
    clean, noisy = _scene(H=1024, W=512, noise=0.03)
    res = iter_denoise_frame_sharded(mesh, eng, noisy, dict(P0), halo=32)
    dn = res["raw_dns"][-1]
    assert dn.shape == noisy.shape
    assert np.isfinite(dn).all() and dn.min() >= 0 and dn.max() <= 1


def test_policy_combine_semantics():
    dn0 = np.zeros((4, 4), np.float32)
    dn1 = np.ones((4, 4), np.float32)
    # replace always takes it1
    assert float(np.mean(combine_rounds(dn0, dn1, 0.0,
                                        policy="replace"))) == 1.0
    # avg always blends
    assert float(np.mean(combine_rounds(dn0, dn1, 9.9,
                                        policy="avg"))) == 0.5
    # guard: keep it0 on agreement, take it1 on |disagreement| (either
    # sign)
    assert float(np.mean(combine_rounds(dn0, dn1, 0.01, policy="guard",
                                        tol=0.1))) == 0.0
    assert float(np.mean(combine_rounds(dn0, dn1, -0.5, policy="guard",
                                        tol=0.1))) == 1.0
    # avg_guard: keep it0 on agreement, blend on disagreement
    assert float(np.mean(combine_rounds(dn0, dn1, 0.01,
                                        policy="avg_guard", tol=0.1))) == 0.0
    assert float(np.mean(combine_rounds(dn0, dn1, 0.5,
                                        policy="avg_guard", tol=0.1))) == 0.5
    # rescue (default): DIRECTIONAL — over-estimate (negative) keeps it0
    # no matter how large; under-estimate ramps 0 -> 1 over (tol, 3 tol)
    assert float(np.mean(combine_rounds(dn0, dn1, -5.0, policy="rescue",
                                        tol=0.15))) == 0.0
    assert float(np.mean(combine_rounds(dn0, dn1, 0.10, policy="rescue",
                                        tol=0.15))) == 0.0
    mid = float(np.mean(combine_rounds(dn0, dn1, 0.30, policy="rescue",
                                       tol=0.15)))
    assert 0.4 < mid < 0.6
    assert float(np.mean(combine_rounds(dn0, dn1, 0.50, policy="rescue",
                                        tol=0.15))) == 1.0
    # the input-floor gate multiplies the rescue weight by
    # (floor_frac > floor_frac_tol): below it the blend is exactly 0
    # even at full disagreement (certified-under-estimate gate,
    # pipeline/policy.py)
    assert float(np.mean(combine_rounds(
        dn0, dn1, 0.50, policy="rescue", tol=0.15,
        floor_frac=0.9, floor_frac_tol=1.5))) == 0.0
    assert float(np.mean(combine_rounds(
        dn0, dn1, 0.50, policy="rescue", tol=0.15,
        floor_frac=2.0, floor_frac_tol=1.5))) == 1.0
    with pytest.raises(ValueError):
        combine_rounds(dn0, dn1, 0.0, policy="nope")


def test_reg_agreement_signed():
    # identical models -> 0; doubled total variance at mu -> +1.0
    # (under-estimate direction); halved -> -0.5 (over-estimate)
    a = reg_agreement((1.0, 1.0), (1.0, 1.0), 0.5)
    assert float(a) == 0.0
    b = reg_agreement((1.0, 0.0), (2.0, 0.0), 0.5)
    assert abs(float(b) - 1.0) < 1e-6
    c = reg_agreement((2.0, 0.0), (1.0, 0.0), 0.5)
    assert abs(float(c) + 0.5) < 1e-6


def test_rescue_policy_rescues_underestimate():
    """The designed regime: round 0 runs at a far-too-low noise level
    (as clipped content induces), leaving noise in dn0. The collab
    re-estimate comes back much higher -> rescue ramps to the second
    pass, which must land within reach of an honestly-estimated run.

    Shot-noise-dominated content keeps the collab slope (beta1) positive
    — on pure-Gaussian scenes a weak denoiser leaves beta1 ~ 0 and the
    reference's beta1<0 abort guard (correctly) keeps round 0 instead."""
    rng = np.random.default_rng(11)
    H = W = 384
    clean = np.kron(rng.random((4, 4)) * 0.6 + 0.2,
                    np.ones((H // 4, W // 4))).astype(np.float32)
    K, sigma, scale = 24.0, 6.0, 959.0
    noisy = np.clip((K * rng.poisson(clean * scale / K)
                     + rng.normal(0, sigma, clean.shape)) / scale,
                    0, 1).astype(np.float32)
    class _GuidedBlur:
        """Noise-adaptive toy SNR-net: smoothing weight rises with the
        guidance t (like the trained net's behavior) — an under-estimate
        (small t) barely denoises, so a correct second pass can rescue."""

        def apply(self, params, x, t):
            xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)),
                         mode="reflect")
            k = jnp.ones((7, 7, 1, 1), jnp.float32) / 49.0
            k = jnp.tile(k, (1, 1, 1, x.shape[-1]))
            blur = jax.lax.conv_general_dilated(
                xp, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=x.shape[-1])
            # strong base smoothing + guidance-proportional extra: real
            # SNR-nets denoise substantially at any t (so the collab
            # proxy is mostly clean and the re-estimate sees the truth);
            # t shifts the smoothness/detail trade-off on top
            w = jnp.clip(0.55 + t * 4.0, 0.0, 1.0)[:, None, None, None]
            return x * (1.0 - w) + blur * w

    def _geng():
        den = VSTDenoiser(_GuidedBlur(), None, guided=True,
                          bias_corr=None, vst_type="asym")
        return YONDEngine(den, PipelineConfig(est_type="simple",
                                              bias_corr=None, max_iter=1))

    eng = _geng()   # default rescue policy
    honest = eng.iter_denoise({"lr": noisy}, dict(P0))

    lowball = _geng()
    real_est = lowball._estimate_self

    def bad_est(raw):
        b1, b2 = real_est(raw)
        return b1 * 0.04, b2 * 0.04 ** 2   # ~25x std under-estimate
    lowball._estimate_self = bad_est
    res = lowball.iter_denoise({"lr": noisy}, dict(P0))
    from yondx.eval import psnr
    p0 = float(psnr(res["raw_dns"][0], clean))
    p1 = float(psnr(res["raw_dns"][1], clean))
    p_honest = float(psnr(honest["raw_dns"][0], clean))
    assert p1 > p0 + 1.0, (p0, p1)            # iteration rescued
    assert p1 > p_honest - 1.0, (p1, p_honest)  # close to honest round 0

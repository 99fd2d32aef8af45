"""Deep-supervision losses vs the reference torch implementation
(losses/base_loss.py:115-139), and the fused-mode aborted-iteration guard
(fused.py vs YOND_SIDD.py:445-447) — VERDICT r2 gaps #4 and Weak #8."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yondx.train.losses import unet_dpsv_loss, unet_dpsv_loss_up


def _ref_losses():
    import sys
    from ref_compat import install_stubs, REF
    install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib
    return importlib.import_module("losses.base_loss")


class TestDpsvParity:
    @pytest.mark.parametrize("charb", [False, True])
    def test_dpsv_matches_reference(self, charb):
        import torch
        ref = _ref_losses()
        rng = np.random.default_rng(0)
        # decoder heads at scales 1, 1/2, 1/4 (NCHW for torch)
        preds = [rng.random((2, 4, 32 >> i, 32 >> i)).astype(np.float32)
                 for i in range(3)]
        target = rng.random((2, 4, 32, 32)).astype(np.float32)
        want = float(ref.Unet_dpsv_Loss(charbonnier=charb)(
            [torch.from_numpy(p) for p in preds], torch.from_numpy(target)))
        got = float(unet_dpsv_loss(
            [jnp.asarray(p.transpose(0, 2, 3, 1)) for p in preds],
            jnp.asarray(target.transpose(0, 2, 3, 1)), charbonnier=charb))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_dpsv_up_matches_reference(self):
        import torch
        ref = _ref_losses()
        rng = np.random.default_rng(1)
        # two full-res heads then the pyramid tail
        shapes = [32, 32, 16, 8]
        preds = [rng.random((2, 4, s, s)).astype(np.float32)
                 for s in shapes]
        target = rng.random((2, 4, 32, 32)).astype(np.float32)
        want = float(ref.Unet_dpsv_Loss_up()(
            [torch.from_numpy(p) for p in preds], torch.from_numpy(target)))
        got = float(unet_dpsv_loss_up(
            [jnp.asarray(p.transpose(0, 2, 3, 1)) for p in preds],
            jnp.asarray(target.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class _VarInflatingModel:
    """Stub denoiser whose output variance GROWS with local mean: the
    collaborative fit var_lr - var_dn vs mean then has negative slope
    (beta1 < 0), triggering the reference's abort-to-iter-0 guard
    (YOND_SIDD.py:445-447)."""

    def apply(self, params, x, t=None):
        H = x.shape[-3]
        stripe = (jnp.arange(H) % 2).astype(jnp.float32)[None, :, None, None]
        return jnp.clip(x + 0.25 * x * (stripe - 0.5), 0.0, 1.0)


def test_fused_abort_keeps_round0_output_and_reg():
    """When collab beta1 < 0, the fused graph must return the round-0
    output (reference keeps raw_dn of iter 0) and carry the round-0 reg
    forward (the fused regs row for the aborted round repeats round 0 —
    the documented static-shape trade-off vs the reference's shorter
    list)."""
    from yondx.pipeline.fused import make_fused_blind_denoiser
    from yondx.vst.lut import BiasLUT

    lut = BiasLUT().lut
    model = _VarInflatingModel()
    rng = np.random.default_rng(2)
    # piecewise-flat scene spanning brightness levels + mild noise
    levels = rng.random((4, 4)) * 0.6 + 0.1
    clean = np.kron(levels, np.ones((32, 32))).astype(np.float32)
    noisy = np.clip(clean + rng.normal(0, 0.01, clean.shape), 0, 1)
    rggb = jnp.asarray(
        np.stack([noisy] * 4, -1)[None].astype(np.float32))

    fused1 = make_fused_blind_denoiser(model, {}, lut, guided=True,
                                       max_iter=1, pad_base=8)
    fused0 = make_fused_blind_denoiser(model, {}, lut, guided=True,
                                       max_iter=0, pad_base=8)
    dn1, regs1 = jax.device_get(fused1(rggb, jnp.float32(959.0)))
    dn0, regs0 = jax.device_get(fused0(rggb, jnp.float32(959.0)))

    # the stub really does trip the guard (collab slope negative)
    # regs1[1] must equal regs1[0] (carried), NOT a fresh negative beta1
    np.testing.assert_allclose(regs1[1], regs1[0], rtol=1e-6)
    assert regs1[0][0] > 0
    # aborted round -> output identical to the max_iter=0 run
    np.testing.assert_allclose(dn1, dn0, atol=1e-6)

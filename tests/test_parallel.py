"""Multi-chip sharding tests on the virtual 8-device CPU mesh: data-parallel
training step consistency, spatial halo-exchange exactness, sharded NLE."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yondx.parallel import (make_mesh, shard_batch, replicate,
                            sharded_box_stats)
from yondx.parallel.spatial import sharded_self_nlf, spatial_denoise_sharded
from yondx.nle import box_mean, stdfilt, self_nlf


def test_mesh_has_8_devices():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8


def test_sharded_box_stats_exact():
    """Halo-exchanged sharded filters == single-device filters, bit-near."""
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    x = rng.random((256, 128, 4)).astype(np.float32)
    xs = shard_batch(mesh, x)          # H sharded over 8 -> 32 rows/chip
    mean_s, var_s, tex_s = sharded_box_stats(mesh, xs, k=29)
    mean = np.asarray(box_mean(jnp.asarray(x), 29))
    var = np.asarray(stdfilt(jnp.asarray(x), 29)) ** 2
    tex = np.asarray(stdfilt(box_mean(jnp.asarray(x), 19), 29))
    np.testing.assert_allclose(np.asarray(mean_s), mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_s), var, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tex_s), tex, atol=1e-5)


def test_sharded_self_nlf_close_to_single_device():
    mesh = make_mesh(8)
    rng = np.random.default_rng(3)
    beta1, beta2 = 2e-3, 1e-4
    levels = rng.random((4, 4)) * 0.6 + 0.05
    clean = np.kron(levels, np.ones((128, 32)))[..., None].repeat(4, -1)
    noisy = (clean + rng.normal(0, np.sqrt(beta1 * clean + beta2),
                                clean.shape)).astype(np.float32)
    b1_ref, b2_ref = self_nlf(jnp.asarray(noisy), k=29)
    xs = shard_batch(mesh, noisy)
    b1, b2 = sharded_self_nlf(mesh, xs, k=29)
    # histogram threshold is approximate; betas must agree closely
    assert abs(float(b1) - float(b1_ref)) < 0.3 * abs(float(b1_ref)) + 1e-5
    assert abs(float(b2) - float(b2_ref)) < 0.5 * abs(float(b2_ref)) + 1e-5


def test_spatial_denoise_sharded_matches_single_device():
    """Row-sharded fused VST denoise == single-device VSTDenoiser in the
    interior (identity network, so exactly equal everywhere)."""
    from yondx.pipeline import VSTDenoiser
    from yondx.vst.lut import FULL_X_GRID
    from yondx.isp import bayer2rggb, rggb2bayer

    class _Id:
        def apply(self, params, x, t=None):
            return x

    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    bayer = rng.random((512, 128)).astype(np.float32)
    rggb = np.asarray(bayer2rggb(jnp.asarray(bayer)))  # [256,64,4]
    curve = np.zeros(len(FULL_X_GRID), np.float32)

    xs = shard_batch(mesh, rggb)
    out_s = spatial_denoise_sharded(
        mesh, _Id().apply, {}, xs, curve, 8.0, 10.0, 959.0,
        halo=16, bias_corr=None, exact_inverse=False, guided=False)

    den = VSTDenoiser(_Id(), None, guided=False, bias_corr=None,
                      vst_type="asym")
    ref = np.asarray(den(jnp.asarray(bayer), curve, 8.0, 10.0, 959.0))
    ref_rggb = np.asarray(bayer2rggb(jnp.asarray(ref)))
    np.testing.assert_allclose(np.asarray(out_s), ref_rggb, atol=2e-3)


def test_dp_train_step_replicated_params_stay_synced():
    """After a sharded train step, params must be identical across devices
    (the psum'd gradient path)."""
    from yondx.train import AWGNTrainer
    args = {
        "model_name": "dp_test", "fast_ckpt": "/tmp/dp_ckpt",
        "checkpoint": "/tmp/dp_saved", "result_dir": "/tmp/dp_img",
        "arch": {"name": "UNetSeeInDark", "in_nc": 4, "out_nc": 4,
                 "nf": 4, "nframes": 1, "res": True, "norm": False},
        "hyper": {"lr_scheduler": "WarmupCosine", "learning_rate": 1e-3,
                  "batch_size": 8, "last_epoch": 0, "step_size": 1,
                  "stop_epoch": 1, "T": 1, "save_freq": 10,
                  "plot_freq": 100},
        "dst_train": {"patch_size": 64, "sigma_min": 5, "sigma_max": 50,
                      "clip": True, "command": "", "synthetic_len": 16,
                      "mode": "train"},
        "dst_eval": {"patch_size": 64, "sigma_list": [10, 25, 50],
                     "clip": True, "command": "", "synthetic_len": 8,
                     "mode": "eval"},
    }
    mesh = make_mesh(8)
    tr = AWGNTrainer(args, mesh=mesh)
    tr.train(stop_epoch=1, steps_per_epoch=2)
    leaf = jax.tree.leaves(tr.params)[0]
    # fetch per-device copies and compare
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)

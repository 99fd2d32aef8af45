"""Tests for the remaining inventory items: stride-style raw packing,
var_corr, RANSAC fit, Brooks sampler, sample_params_max, GAN losses, SID
raw dataset + device aug, one-channel AWGN."""
import numpy as np
import jax
import jax.numpy as jnp


def test_pack_raw_roundtrip_and_order():
    from yondx.isp.raw_io import pack_raw, unpack_raw
    bayer = np.arange(16, dtype=np.float32).reshape(4, 4)
    p = np.asarray(pack_raw(jnp.asarray(bayer)))
    # RGBG: R@00, G1@01, B@11, G2@10
    assert p[0, 0, 0] == bayer[0, 0]
    assert p[0, 0, 1] == bayer[0, 1]
    assert p[0, 0, 2] == bayer[1, 1]
    assert p[0, 0, 3] == bayer[1, 0]
    np.testing.assert_array_equal(np.asarray(unpack_raw(jnp.asarray(p))),
                                  bayer)


def test_raw2bayer_bayer2raw():
    from yondx.isp.raw_io import raw2bayer, bayer2raw
    rng = np.random.default_rng(0)
    raw = rng.integers(512, 16383, (8, 8)).astype(np.float32)
    packed = raw2bayer(raw, wp=16383, bl=512)
    assert packed.shape == (4, 4, 4)
    back = bayer2raw(packed, wp=16383, bl=512)
    np.testing.assert_allclose(back.astype(np.float32), raw, atol=1.0)


def test_space_depth_roundtrip():
    from yondx.isp.raw_io import space_to_depth, depth_to_space
    x = np.random.rand(8, 8, 1).astype(np.float32)
    y = space_to_depth(x)
    assert y.shape == (4, 4, 4)
    np.testing.assert_array_equal(depth_to_space(y), x)


def test_var_corr_flat_is_one():
    from yondx.nle import box_mean
    from yondx.nle.boxfilter import var_corr
    x = jnp.full((32, 32), 0.5)
    r = np.asarray(var_corr(x, 5))
    np.testing.assert_allclose(r, 1.0, atol=1e-6)


def test_ransac_linefit_robust_to_outliers():
    from yondx.nle.fit import ransac_linefit
    rng = np.random.default_rng(1)
    x = rng.random(2000)
    y = 0.4 * x + 0.02 + rng.normal(0, 0.005, 2000)
    y[:200] += 5.0  # gross outliers
    b1, b2 = ransac_linefit(x, y)
    assert abs(b1 - 0.4) < 0.05 and abs(b2 - 0.02) < 0.02


def test_brooks_sampler_and_noise():
    from yondx.data.noise import brooks_noise_levels, brooks_add_noise
    shot, read = brooks_noise_levels(jax.random.PRNGKey(0))
    assert 1e-4 <= float(shot) <= 0.012
    img = jnp.full((64, 64), 0.25)
    noisy = brooks_add_noise(jax.random.PRNGKey(1), img,
                             float(shot), float(read))
    var = float(jnp.var(noisy - img))
    expect = 0.25 * float(shot) + float(read)
    assert abs(var - expect) / expect < 0.2


def test_sample_params_max():
    from yondx.data.noise import sample_params_max
    rng = np.random.default_rng(2)
    p = sample_params_max("SonyA7S2", iso=25600, rng=rng)
    assert abs(p["K"] - 24.48) < 1.0     # Kmax at ISO 25600
    assert 100 <= p["ratio"] <= 300
    p2 = sample_params_max("NikonD850", rng=rng)
    assert p2["K"] > 0 and p2["sigGs"] > 0


def test_gan_losses_finite():
    from yondx.train.losses import gan_loss
    r = jnp.asarray(np.random.randn(16).astype(np.float32))
    f = jnp.asarray(np.random.randn(16).astype(np.float32))
    for kind in ("SGAN", "RSGAN", "RaSGAN", "RaLSGAN"):
        for disc in (True, False):
            v = float(gan_loss(r, f, kind, disc))
            assert np.isfinite(v)


def test_sid_raw_dataset_and_aug(tmp_path):
    from yondx.data.raw_dataset import (SIDRawDataset, raw_awgn_batch,
                                        awgn_one_channel_batch)
    d = tmp_path / "train"
    d.mkdir()
    rng = np.random.default_rng(3)
    for i in range(2):
        frame = rng.integers(512, 16383, (256, 256)).astype(np.uint16)
        np.save(d / f"f{i}.npy", frame)
    ds = SIDRawDataset(str(tmp_path), mode="train", patch_size=64,
                       crop_per_image=4, croptype="random")
    crops = ds[0]
    assert crops.shape == (4, 32, 32, 4)
    lr, hr, sigma = raw_awgn_batch(jax.random.PRNGKey(0),
                                   jnp.asarray(crops))
    assert lr.shape == crops.shape and np.isfinite(np.asarray(lr)).all()

    lr1, _ = awgn_one_channel_batch(jax.random.PRNGKey(1),
                                    jnp.asarray(crops), channel=2)
    diff = np.abs(np.asarray(lr1) - crops)
    assert diff[..., 2].max() > 0
    assert diff[..., 0].max() == 0 and diff[..., 1].max() == 0 \
        and diff[..., 3].max() == 0

"""Bayer packing / CFA tests vs faithful numpy re-statements of the
reference semantics (utils/isp_ops.py:57-71, sidd_utils.py:182-213,
yond_datasets.py:15-19)."""
import numpy as np
import jax.numpy as jnp

from yondx.isp import (
    bayer2rggb, rggb2bayer, bayer_aug, rot_bayer, flip_bayer,
    bayer2rows, rows2bayer, bayer2gray,
)


def ref_bayer2rggb(bayer):
    H, W = bayer.shape
    return bayer.reshape(H // 2, 2, W // 2, 2).transpose(0, 2, 1, 3).reshape(
        H // 2, W // 2, 4)


def ref_rggb2bayer(rggb):
    H, W, _ = rggb.shape
    return rggb.reshape(H, W, 2, 2).transpose(0, 2, 1, 3).reshape(H * 2, W * 2)


def test_pack_matches_reference_semantics():
    x = np.random.rand(16, 24).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(bayer2rggb(x)), ref_bayer2rggb(x))


def test_roundtrip():
    x = np.random.rand(32, 32).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(rggb2bayer(bayer2rggb(x))), x)
    r = np.random.rand(8, 8, 4).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(bayer2rggb(rggb2bayer(r))), r)
    np.testing.assert_array_equal(np.asarray(rggb2bayer(jnp.asarray(r))),
                                  ref_rggb2bayer(r))


def test_batched_pack():
    x = np.random.rand(5, 16, 16).astype(np.float32)
    got = np.asarray(bayer2rggb(x))
    for i in range(5):
        np.testing.assert_array_equal(got[i], ref_bayer2rggb(x[i]))


def test_channel_positions():
    # R at (0,0), G1 at (0,1), G2 at (1,0), B at (1,1)
    bayer = np.zeros((4, 4), np.float32)
    bayer[0::2, 0::2] = 1  # R
    bayer[0::2, 1::2] = 2  # G1
    bayer[1::2, 0::2] = 3  # G2
    bayer[1::2, 1::2] = 4  # B
    rggb = np.asarray(bayer2rggb(bayer))
    assert (rggb[..., 0] == 1).all() and (rggb[..., 1] == 2).all()
    assert (rggb[..., 2] == 3).all() and (rggb[..., 3] == 4).all()


def ref_bayer_aug(rggb, k):
    bayer = ref_rggb2bayer(rggb)
    bayer = np.rot90(bayer, k=k, axes=(-2, -1))
    return ref_bayer2rggb(bayer)


def test_bayer_aug_matches_and_inverts():
    r = np.random.rand(8, 8, 4).astype(np.float32)
    for k in range(4):
        got = np.asarray(bayer_aug(jnp.asarray(r), k))
        np.testing.assert_array_equal(got, ref_bayer_aug(r, k))
        back = np.asarray(bayer_aug(jnp.asarray(got), (4 - k) % 4))
        np.testing.assert_array_equal(back, r)


def test_rot_bayer_reversible():
    x = np.random.rand(16, 16).astype(np.float32)
    for pat in ([[1, 2], [2, 3]], [[2, 1], [3, 2]],
                [[2, 3], [1, 2]], [[3, 2], [2, 1]]):
        y = rot_bayer(jnp.asarray(x), pat)
        z = np.asarray(rot_bayer(y, pat, rev=True))
        np.testing.assert_array_equal(z, x)


def ref_flip_bayer(image, bp):
    if bp == [[1, 2], [2, 3]]:
        return image
    if bp == [[2, 1], [3, 2]]:
        return np.fliplr(image)
    if bp == [[2, 3], [1, 2]]:
        return np.flipud(image)
    return np.flipud(np.fliplr(image))


def test_flip_bayer_matches():
    x = np.random.rand(16, 16).astype(np.float32)
    for pat in ([[1, 2], [2, 3]], [[2, 1], [3, 2]],
                [[2, 3], [1, 2]], [[3, 2], [2, 1]]):
        np.testing.assert_array_equal(
            np.asarray(flip_bayer(jnp.asarray(x), pat)),
            ref_flip_bayer(x, pat))


def test_rows_roundtrip():
    x = np.random.rand(16, 12).astype(np.float32)
    rows = bayer2rows(jnp.asarray(x))
    assert rows.shape == (2, 8, 12)
    np.testing.assert_array_equal(np.asarray(rows2bayer(rows)), x)


def test_bayer2gray_matches_cv2():
    import cv2
    x = np.random.rand(32, 32).astype(np.float32)
    kernel = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32) / 16.0
    ref = cv2.filter2D(x, -1, kernel, borderType=cv2.BORDER_REFLECT)
    got = np.asarray(bayer2gray(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-6)

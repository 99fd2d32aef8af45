"""Coverage for core tiling, config loader, and render helpers."""
import numpy as np
import jax.numpy as jnp

from yondx.core.tiling import (pad_to_multiple, unpad, tile_overlap,
                               untile_overlap, np_tile_overlap)
from yondx.config import load_runfile
from yondx.isp.render import process_rggb, fast_isp, simple_isp


def test_pad_unpad_roundtrip():
    x = jnp.asarray(np.random.rand(2, 50, 70, 4).astype(np.float32))
    xp, p2d = pad_to_multiple(x, 32)
    assert xp.shape[1] % 32 == 0 and xp.shape[2] % 32 == 0
    back = unpad(xp, p2d)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_tile_untile_roundtrip():
    x = jnp.asarray(np.random.rand(150, 210).astype(np.float32))
    tiles, plan = tile_overlap(x, tile=64, halo=16)
    back = untile_overlap(tiles, plan, halo=16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-7)
    # numpy twin agrees
    nt, nplan = np_tile_overlap(np.asarray(x), tile=64, halo=16)
    np.testing.assert_allclose(nt, np.asarray(tiles), atol=1e-7)


def test_load_runfile_normalizations(tmp_path):
    rf = tmp_path / "r.yml"
    rf.write_text("""
mode: 'train'
dst: &d
  root_dir: 'X'
dst_eval:
  <<: *d
pipeline:
  bias_corr: 'none'
arch: {name: 'UNetSeeInDark'}
""")
    args = load_runfile(str(rf), mode="eval", host_prefix="/data")
    assert args["mode"] == "eval"
    assert args["dst"]["clip"] is False          # default applied
    assert args["pipeline"]["bias_corr"] is None  # 'none' -> None
    assert args["dst"]["root_dir"].startswith("/data")


def test_process_rggb_render():
    rggb = jnp.asarray(np.random.rand(2, 16, 16, 4).astype(np.float32))
    wb = jnp.asarray(np.array([[2.0, 1.0, 1.0, 1.8]] * 2, np.float32))
    cam2rgb = jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * 2))
    out = np.asarray(process_rggb(rggb, wb, cam2rgb))
    assert out.shape == (2, 16, 16, 3)
    assert out.min() >= 0 and out.max() <= 1
    # 8-bit quantization grid
    assert np.allclose(out * 255, np.round(out * 255), atol=1e-4)


def test_fast_isp_and_simple_isp():
    img4c = np.random.rand(16, 16, 4).astype(np.float32) * 0.5
    out = fast_isp(img4c, wb=[2.0, 1.0, 1.8])
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1
    s = simple_isp((img4c * 16000).astype(np.float32))
    assert s.shape == (16, 16, 3)

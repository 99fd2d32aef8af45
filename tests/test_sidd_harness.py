"""SIDD harness end-to-end on synthetic 32-crop scenes: metrics contract,
npy cache, per-iteration meters, sRGB render."""
import os
import pickle

import numpy as np
import jax.numpy as jnp

from yondx.pipeline import VSTDenoiser, YONDEngine, PipelineConfig
from yondx.eval.sidd import SIDDEvalHarness
from yondx.nle import box_mean


class _Blur:
    def apply(self, p, x, t=None):
        return box_mean(x, 7)


class _FakeSIDD:
    """2 scenes x 8 crops of 256x256 bayer with PG noise."""

    def __len__(self):
        return 2

    def __getitem__(self, i):
        rng = np.random.default_rng(100 + i)
        clean = np.kron(rng.random((8, 2, 2)) * 0.5 + 0.2,
                        np.ones((1, 128, 128))).astype(np.float32)
        K, sig, scale = 6.0, 8.0, 959.0
        noisy = (K * rng.poisson(clean * scale / K)
                 + rng.normal(0, sig, clean.shape)) / scale
        return {"name": f"{i:04d}_scene", "lr":
                np.clip(noisy, 0, 1).astype(np.float32),
                "hr": clean, "cfa": [[1, 2], [2, 3]]}


def test_sidd_harness_end_to_end(tmp_path):
    den = VSTDenoiser(_Blur(), None, guided=False, bias_corr="pre")
    eng = YONDEngine(den, PipelineConfig(est_type="simple", max_iter=1))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        h = SIDDEvalHarness(eng, _FakeSIDD(), "harness_test", max_iter=1)
        res = h.run(wp=1023, bl=64)
    finally:
        os.chdir(cwd)
    # per-iteration metrics populated and improving over noise
    assert res["psnr"][0] > 25
    assert len(res["psnr"]) == 3  # iter0, iter1, last
    # metrics pkl contract
    with open(tmp_path / "metrics" / "harness_test_metrics.pkl", "rb") as f:
        m = pickle.load(f)
    assert "0000_scene" in m and "psnr" in m["0000_scene"]
    assert "reg" in m["0000_scene"]
    # npy cache contract (npy/{method}/{k:03d}.npy)
    assert os.path.exists(tmp_path / "npy" / "harness_test" / "000.npy")
    out = np.load(tmp_path / "npy" / "harness_test" / "000.npy")
    assert out.shape[0] == 2  # two iterations cached


def test_score_scene_per_crop_psnr_protocol(tmp_path):
    """Raw metric protocol parity (YOND_SIDD.py:645-656): per-crop PSNR at
    data_range=1 meaned over crops (NOT one PSNR over the stack — a
    different, systematically lower statistic on heterogeneous crops),
    per-crop SSIM x255, and non-positive outputs update -1."""
    from yondx.eval.metrics import psnr, matlab_ssim
    rng = np.random.default_rng(3)
    # heterogeneous crops: very different MSEs so stack-PSNR != mean-PSNR
    hr = rng.random((4, 64, 64)).astype(np.float32)
    dn = hr + np.stack([rng.normal(0, s, (64, 64))
                        for s in (0.001, 0.01, 0.05, 0.2)]).astype(np.float32)
    want_psnr = float(np.mean([float(psnr(d, h, data_range=1.0))
                               for d, h in zip(dn, hr)]))
    want_ssim = float(np.mean([float(matlab_ssim(d * 255, h * 255))
                               for d, h in zip(dn, hr)]))
    stack_psnr = float(psnr(dn, hr, data_range=1.0))
    assert abs(want_psnr - stack_psnr) > 1.0  # the two statistics differ

    h = SIDDEvalHarness(None, None, "proto_test", max_iter=1,
                        sample_dir=str(tmp_path),
                        logfile=str(tmp_path / "log.log"))
    h._score_scene("s", [dn, np.zeros_like(dn)], dn, hr)  # 2nd output <= 0
    assert abs(h.psnrs[0].avg - want_psnr) < 1e-6
    assert abs(h.ssims[0].avg - want_ssim) < 1e-6
    assert h.psnrs[1].avg == -1 and h.ssims[1].avg == -1


def test_sidd_harness_srgb_branch(tmp_path):
    """save_plot wires process_sidd_image: PNGs written, per-crop sRGB
    PSNR/SSIM at data_range=255 recorded (YOND_SIDD.py:658-670)."""
    class _FakeSIDDMeta(_FakeSIDD):
        def __getitem__(self, i):
            d = super().__getitem__(i)
            d["meta"] = {"bayer_2by2": [[1, 2], [2, 3]],
                         "wb": np.array([[0.5, 1.0, 0.6]]),
                         "cst2": np.eye(3) * 0.8 + 0.1}
            return d

    den = VSTDenoiser(_Blur(), None, guided=False, bias_corr="pre")
    eng = YONDEngine(den, PipelineConfig(est_type="simple", max_iter=0))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        h = SIDDEvalHarness(eng, _FakeSIDDMeta(), "srgb_test", max_iter=0,
                            save_plot=True, sample_dir=str(tmp_path / "png"),
                            cache_npy=False)
        res = h.run(wp=1023, bl=64, limit=1)
    finally:
        os.chdir(cwd)
    assert "psnr_rgb" in res and res["psnr_rgb"][0] > 10
    assert os.path.exists(tmp_path / "png" / "0000_noisy.png")
    assert os.path.exists(tmp_path / "png" / "0000_gt.png")
    assert os.path.exists(tmp_path / "png" / "0000_0.png")
    with open(tmp_path / "metrics" / "srgb_test_metrics.pkl", "rb") as f:
        m = pickle.load(f)
    assert m["0000_scene"]["psnr_rgb"]


def test_process_sidd_render():
    from yondx.isp import process_sidd_image
    bayer = np.random.rand(64, 64).astype(np.float32)
    wb = np.array([[0.5, 1.0, 0.6]])
    cst2 = np.eye(3) * 0.8 + 0.1
    out = process_sidd_image(bayer, [[1, 2], [2, 3]], wb, cst2)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8

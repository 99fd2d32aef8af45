"""Aux subsystem tests: io loader, video index plumbing, profiling,
eval-dataset gating, PG est-net trainer smoke."""
import os

import numpy as np
import jax.numpy as jnp
import pytest


def test_dataload_npy_mat_png(tmp_path):
    from yondx.core.io import dataload
    a = np.random.rand(8, 8).astype(np.float32)
    np.save(tmp_path / "x.npy", a)
    np.testing.assert_array_equal(dataload(str(tmp_path / "x.npy")), a)
    import scipy.io as sio
    sio.savemat(str(tmp_path / "x.mat"), {"x": a})
    np.testing.assert_allclose(dataload(str(tmp_path / "x.mat")), a)
    import cv2
    img = (np.random.rand(8, 8, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "x.png"), img)
    out = dataload(str(tmp_path / "x.png"))
    np.testing.assert_array_equal(out, img[:, :, ::-1])
    with pytest.raises(ImportError):
        open(tmp_path / "x.dng", "wb").close()
        dataload(str(tmp_path / "x.dng"))


def test_frame_index_splitor():
    from yondx.data.video import frame_index_splitor, multi_frame_loader
    idx = frame_index_splitor(nframes=3, pad=True, reflect=True)
    assert idx.shape == (7, 3)
    assert idx.min() >= 0 and idx.max() <= 6
    # center window of first group reflects: [-1,0,1] -> [1,0,1]
    np.testing.assert_array_equal(idx[0], [1, 0, 1])
    frames = jnp.asarray(np.random.rand(2, 7, 4, 4, 1).astype(np.float32))
    stacks = multi_frame_loader(frames, idx)
    assert stacks.shape == (7, 2, 3, 4, 4, 1)
    gts = multi_frame_loader(frames, idx, gt=True)
    assert gts.shape == (7, 2, 4, 4, 1)


def test_profiling_counters():
    from yondx.core import profiling as prof
    prof.reset()

    @prof.fn_timer
    def f():
        return 1

    f(); f()
    assert prof.fn_calls["test_profiling_counters.<locals>.f"] == 2
    rt = {}
    with prof.stage_timer(rt, "net"):
        pass
    assert "net" in rt


def test_eval_datasets_gate_cleanly(tmp_path):
    from yondx.data.eval_datasets import LRIDDataset, ELDDataset
    with pytest.raises(FileNotFoundError):
        LRIDDataset(str(tmp_path), subset="indoor")
    with pytest.raises(FileNotFoundError):
        ELDDataset(str(tmp_path))


def test_eval_dataset_npy_layout(tmp_path):
    from yondx.data.eval_datasets import LRIDDataset
    d = tmp_path / "indoor" / "scene01"
    d.mkdir(parents=True)
    wp, bl = 1023, 64
    noisy = (np.random.rand(64, 64) * (wp - bl) + bl).astype(np.uint16)
    gt = (np.random.rand(64, 64) * (wp - bl) + bl).astype(np.uint16)
    np.save(d / "00_noisy.npy", noisy)
    np.save(d / "10_gt.npy", gt)
    ds = LRIDDataset(str(tmp_path), subset="indoor")
    item = ds[0]
    assert item["lr"].shape == (64, 64)
    assert "hr" in item and 0 <= item["lr"].min() <= item["lr"].max() <= 1


def test_pg_est_trainer_smoke(tmp_path):
    from yondx.train.pg_trainer import PGEstTrainer
    args = {
        "model_name": "est_tiny", "fast_ckpt": str(tmp_path),
        "arch": {"name": "EstUnet", "in_nc": 12, "out_nc": 4, "nf": 4,
                 "depth": 2, "res": False, "use_type": "std", "pge": False,
                 "nframes": 1, "k": 19},
        "hyper": {"lr_scheduler": "WarmupCosine", "learning_rate": 1e-3,
                  "batch_size": 4, "last_epoch": 0, "step_size": 1,
                  "stop_epoch": 1, "T": 1, "save_freq": 1},
        "dst_train": {"patch_size": 64, "synthetic_len": 8},
    }
    tr = PGEstTrainer(args)
    loss = tr.train(epochs=1, steps_per_epoch=2)
    assert np.isfinite(loss)
    assert os.path.exists(tmp_path / "est_tiny_last_model.ckpt")


def test_pg_est_trainer_pge_flavor(tmp_path):
    """est_UNet arch selects the PGE scalar flavor: log-space (beta1,
    sqrt(beta2)) regression; the trained output shape feeds the engine's
    'pge' est_type as (pred[0], pred[1]**2)."""
    import jax
    import jax.numpy as jnp
    from yondx.train.pg_trainer import PGEstTrainer
    args = {
        "model_name": "est_pge_tiny", "fast_ckpt": str(tmp_path),
        "arch": {"name": "est_UNet", "in_nc": 4, "out_nc": 2, "nf": 4,
                 "depth": 2},
        "hyper": {"lr_scheduler": "WarmupCosine", "learning_rate": 1e-3,
                  "batch_size": 4, "last_epoch": 0, "step_size": 1,
                  "stop_epoch": 1, "T": 1, "save_freq": 1},
        "dst_train": {"patch_size": 64, "synthetic_len": 8},
    }
    tr = PGEstTrainer(args)
    assert tr.flavor == "pge"
    loss = tr.train(epochs=1, steps_per_epoch=2)
    assert np.isfinite(loss)
    out = tr.model.apply(tr.params,
                         jnp.ones((3, 32, 32, 4), jnp.float32))
    assert out.shape == (3, 2)
    assert bool(jnp.all(out >= 0))     # squared head: positive scalars


def test_dnd_dataset_layout(tmp_path):
    """DND reader on a synthetic official-layout bundle (HDF5 v7.3-style)."""
    import h5py
    from yondx.data.eval_datasets import DNDDataset
    img_dir = tmp_path / "images_raw"
    img_dir.mkdir()
    noisy = np.random.rand(64, 48).astype(np.float32)
    with h5py.File(img_dir / "0001.mat", "w") as f:
        f.create_dataset("Inoisy", data=noisy.T)
    ds = DNDDataset(str(tmp_path))
    item = ds[0]
    np.testing.assert_allclose(item["lr"], noisy)
    assert item["name"] == "0001"
    with pytest.raises(FileNotFoundError):
        DNDDataset(str(tmp_path / "missing"))

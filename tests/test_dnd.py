"""DND submission harness on synthetic stand-in .mat files (round-3
verdict Next #5): correct box extraction, bundle shapes, and the official
file/key contract — without the real (unavailable) dnd_2017 archive."""
import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")
sio = pytest.importorskip("scipy.io")

from yondx.pipeline import VSTDenoiser, YONDEngine, PipelineConfig


class _IdModel:
    def apply(self, params, x, t=None):
        return x


def _make_dnd_root(tmp_path, n_imgs=2, n_boxes=3, H=256, W=320):
    """A miniature dnd_2017 layout: images_raw/%04d.mat (HDF5, 'Inoisy')
    + info.mat with per-image bounding-box object references."""
    root = tmp_path / "dnd"
    img_dir = root / "images_raw"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(5)
    frames = []
    for i in range(n_imgs):
        frame = rng.random((H, W)).astype(np.float32) * 0.5 + 0.1
        frames.append(frame)
        with h5py.File(img_dir / f"{i + 1:04d}.mat", "w") as f:
            # DNDDataset reads np.array(f['Inoisy']).T
            f.create_dataset("Inoisy", data=frame.T)
    boxes = []
    with h5py.File(root / "info.mat", "w") as f:
        info = f.create_group("info")
        refs = []
        for i in range(n_imgs):
            b = np.zeros((n_boxes, 4), np.float64)
            for k in range(n_boxes):
                y0 = 16 + 64 * k
                x0 = 32 + 64 * k
                b[k] = [y0 + 1, x0 + 1, y0 + 64, x0 + 64]  # 1-indexed
            boxes.append(b)
            d = f.create_dataset(f"bb_{i}", data=b.T)  # stored transposed
            refs.append(d.ref)
        # official access pattern: info['boundingboxes'][0][i]
        ref_arr = np.array(refs, dtype=h5py.ref_dtype).reshape(1, n_imgs)
        info.create_dataset("boundingboxes", data=ref_arr)
    return root, frames, boxes


def test_dnd_dataset_and_submission(tmp_path):
    from yondx.data.eval_datasets import DNDDataset
    from yondx.eval.dnd import denoise_dnd, bundle_submissions_raw
    root, frames, boxes = _make_dnd_root(tmp_path)
    ds = DNDDataset(str(root))
    assert len(ds) == 2
    item = ds[0]
    np.testing.assert_allclose(item["lr"], frames[0], atol=1e-6)
    np.testing.assert_allclose(item["boxes"], boxes[0])

    den = VSTDenoiser(_IdModel(), None, guided=False, bias_corr=None,
                      vst_type="asym")
    eng = YONDEngine(den, PipelineConfig(est_type="simple", max_iter=1,
                                         bias_corr=None, data_type="DND"))
    out = tmp_path / "submit"
    bundled = denoise_dnd(eng, ds, str(out))
    # per-crop files exist with the official key and the box size
    c = sio.loadmat(os.path.join(bundled, "0001_01.mat"))["Idenoised_crop"]
    assert c.shape == (64, 64) and c.dtype == np.float32
    assert np.isfinite(c).all() and c.min() >= 0 and c.max() <= 1

    n = bundle_submissions_raw(bundled)
    assert n == 2
    m = sio.loadmat(os.path.join(bundled, "0001.mat"))
    assert m["israw"].squeeze()
    assert str(np.squeeze(m["eval_version"])) == "1.0"
    cells = m["Idenoised"]
    assert cells.shape == (1, 3)
    assert cells[0, 0].shape == (64, 64)
    # identity net + asym VST chain ~= identity: the crop content survives
    y0, x0 = 16, 32
    np.testing.assert_allclose(cells[0, 0],
                               frames[0][y0:y0 + 64, x0:x0 + 64],
                               atol=5e-3)

"""Full-frame eval datasets: LRID, ELD (+ the DND/ANY file layout).

Rebuild of the reference's LRID_Dataset (yond_datasets.py:870-975),
ELD_Full_Dataset (:977-1067) and ELDEvalDataset (process.py:793-845). These
consume camera-raw archives that are not shipped in this image; each class
gates clearly on the files being present and exposes the same item schema
the YOND engine consumes: {'name', 'lr' (bayer [H,W] in [0,1]), optional
'hr', 'cfa', 'wp', 'bl', 'ratio'}.

Frames already converted to .npy/.mat load without rawpy; native camera
formats require rawpy (gated in yondx.core.io.dataload).
"""
from __future__ import annotations

import glob
import os
import pickle
from typing import List, Optional, Sequence

import numpy as np

from ..core.io import dataload


def _norm(raw, wp, bl, ratio=1.0):
    x = (np.asarray(raw, np.float32) - bl) / (wp - bl)
    return np.clip(x * ratio, 0.0, 1.0) if ratio != 1.0 else x


class LRIDDataset:
    """LRID (IMX686) full-res eval: 3472x4624 frames, wp=1023, bl=64
    (SURVEY.md §2.5; reference uses .info pkl indexes + dng files).

    Layout: {root}/{scene}/{name}.{npy|mat|dng} with a GT long-exposure
    frame per scene; `infos/{subset}.info` pkl index optional (falls back
    to directory scan).
    """
    WP, BL = 1023, 64

    def __init__(self, root_dir: str, subset: str = "indoor",
                 ratio_list: Sequence[int] = (1,)):
        self.root = root_dir
        self.ratio_list = list(ratio_list)
        info_path = os.path.join(root_dir, "infos", f"{subset}.info")
        if os.path.exists(info_path):
            with open(info_path, "rb") as f:
                self.infos = pickle.load(f)
        else:
            scenes = sorted(glob.glob(os.path.join(root_dir, subset, "*")))
            if not scenes:
                raise FileNotFoundError(
                    f"no LRID data under {root_dir}/{subset}")
            self.infos = [{"name": os.path.basename(s), "dir": s}
                          for s in scenes]

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, idx: int) -> dict:
        info = self.infos[idx]
        d = info.get("dir", os.path.join(self.root, info["name"]))
        frames = sorted(glob.glob(os.path.join(d, "*")))
        if not frames:
            raise FileNotFoundError(d)
        lr = _norm(dataload(frames[0]), self.WP, self.BL)
        data = {"name": info["name"], "lr": lr, "wp": self.WP,
                "bl": self.BL, "ratio": 1.0,
                "cfa": [[1, 2], [2, 3]]}
        if len(frames) > 1:
            data["hr"] = _norm(dataload(frames[-1]), self.WP, self.BL)
        return data


class ELDDataset:
    """ELD 4-camera eval grid: scene x iso x ratio with the nearest
    long-exposure GT frame (reference ELD_Full_Dataset,
    yond_datasets.py:977-1067; scene dirs 'scene-*', files indexed by
    img_ids with GT at ids 1/16).

    camera_suffix: e.g. ('SonyA7S2', '.ARW'); frames pre-converted to npy
    with the same stem also load.
    """
    CAM_META = {
        "SonyA7S2": {"wp": 16383, "bl": 512},
        "NikonD850": {"wp": 16383, "bl": 512},
        "CanonEOS70D": {"wp": 16383, "bl": 2048},
        "CanonEOS700D": {"wp": 16383, "bl": 2048},
    }
    # ELD id grid: noisy ids per (iso, ratio); GT ids
    GT_IDS = (1, 16)

    def __init__(self, basedir: str, camera_suffix=("SonyA7S2", ".ARW"),
                 scenes: Optional[Sequence[int]] = None,
                 img_ids: Optional[Sequence[int]] = None):
        self.cam, self.suffix = camera_suffix
        self.basedir = os.path.join(basedir, self.cam)
        self.scenes = list(scenes) if scenes else list(range(1, 11))
        self.img_ids = list(img_ids) if img_ids else [4, 9, 14]
        meta = self.CAM_META.get(self.cam, {"wp": 16383, "bl": 512})
        self.wp, self.bl = meta["wp"], meta["bl"]
        if not os.path.isdir(self.basedir):
            raise FileNotFoundError(f"no ELD data under {self.basedir}")
        self.items: List[dict] = []
        for s in self.scenes:
            sdir = os.path.join(self.basedir, f"scene-{s}")
            for i in self.img_ids:
                self.items.append({"scene": s, "img_id": i, "dir": sdir})

    def _find(self, d: str, img_id: int) -> str:
        for ext in (self.suffix, ".npy", ".mat"):
            cands = glob.glob(os.path.join(d, f"IMG_{img_id:04d}{ext}")) or \
                glob.glob(os.path.join(d, f"*{img_id:04d}{ext}"))
            if cands:
                return cands[0]
        raise FileNotFoundError(f"{d}: id {img_id}")

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int) -> dict:
        it = self.items[idx]
        lr_path = self._find(it["dir"], it["img_id"])
        # nearest GT frame (ids 1 or 16)
        gt_id = min(self.GT_IDS, key=lambda g: abs(g - it["img_id"]))
        hr_path = self._find(it["dir"], gt_id)
        lr = _norm(dataload(lr_path), self.wp, self.bl)
        hr = _norm(dataload(hr_path), self.wp, self.bl)
        return {"name": f"{self.cam}_s{it['scene']:02d}_{it['img_id']:04d}",
                "lr": lr, "hr": hr, "wp": self.wp, "bl": self.bl,
                "ratio": 1.0, "cfa": [[1, 2], [2, 3]]}


class DNDDataset:
    """DND raw benchmark layout (the official dnd_2017 release):
    {root}/images_raw/{0001..0050}.mat (key 'Inoisy', HDF5 v7.3) +
    {root}/info.mat with per-image bounding boxes and camera metadata.
    No ground truth (server-scored benchmark); items carry the 20 crop
    boxes so a harness can produce the submission blocks.
    """

    def __init__(self, root_dir: str):
        import h5py
        self.root = root_dir
        img_dir = os.path.join(root_dir, "images_raw")
        self.paths = sorted(glob.glob(os.path.join(img_dir, "*.mat")))
        if not self.paths:
            raise FileNotFoundError(f"no DND images under {img_dir}")
        self.boxes = None
        info_path = os.path.join(root_dir, "info.mat")
        if os.path.exists(info_path):
            with h5py.File(info_path, "r") as f:
                info = f["info"]
                self.boxes = [np.array(f[ref]).T
                              for ref in info["boundingboxes"][0]]

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int) -> dict:
        import h5py
        with h5py.File(self.paths[idx], "r") as f:
            noisy = np.array(f["Inoisy"]).T.astype(np.float32)
        data = {"name": os.path.basename(self.paths[idx])[:-4],
                "lr": noisy, "wp": 1, "bl": 0, "ratio": 1.0,
                "cfa": [[1, 2], [2, 3]]}
        if self.boxes is not None:
            data["boxes"] = self.boxes[idx]
        return data


class MultiDataset:
    """Concatenation wrapper (reference MultiDataset,
    data_process/__init__.py:5-40)."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self.lengths = [len(d) for d in self.datasets]

    def __len__(self):
        return sum(self.lengths)

    def __getitem__(self, idx: int):
        for d, n in zip(self.datasets, self.lengths):
            if idx < n:
                return d[idx]
            idx -= n
        raise IndexError(idx)

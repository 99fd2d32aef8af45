"""Multi-format frame loader (reference `dataload`, utils/utils.py:319-335).

Formats: .npy, .mat (scipy.io with h5py fallback for v7.3, key 'x'),
.png/.jpg (BGR->RGB via cv2), .raw (fixed 1440x2560 uint16). Camera raw
formats (.ARW/.DNG/.NEF/.CR2) need LibRaw/rawpy, which this image does not
ship — they raise a clear gate error instead.
"""
from __future__ import annotations

import os

import numpy as np

RAW_EXTS = {".arw", ".dng", ".nef", ".cr2"}


def dataload(path: str):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        return np.load(path)
    if ext == ".mat":
        try:
            import scipy.io as sio
            mat = sio.loadmat(path)
            keys = [k for k in mat if not k.startswith("__")]
            return mat["x"] if "x" in mat else mat[keys[0]]
        except NotImplementedError:  # MATLAB v7.3 -> HDF5
            import h5py
            with h5py.File(path, "r") as f:
                key = "x" if "x" in f else list(f.keys())[0]
                return np.array(f[key]).T
    if ext in (".png", ".jpg", ".jpeg", ".bmp"):
        import cv2
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
        if img.ndim == 3:
            img = img[:, :, ::-1]  # BGR -> RGB
        return img
    if ext == ".raw":
        return np.fromfile(path, np.uint16).reshape(1440, 2560)
    if ext in RAW_EXTS:
        try:
            import rawpy
        except ImportError as e:
            raise ImportError(
                f"loading {ext} requires rawpy/LibRaw, which is not "
                "available in this environment") from e
        with rawpy.imread(path) as raw:
            return raw.raw_image_visible.copy()
    raise ValueError(f"unsupported format: {path}")

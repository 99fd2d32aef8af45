"""Import the reference YOND implementation (/root/reference) for golden
gates, stubbing the pip wheels absent from this image (rawpy, exifread,
bm3d, skimage, natsort, torchsummary). The stubs only satisfy module-level
imports; any *use* of a stubbed symbol raises, so a gate can never silently
depend on fake numerics (except compare_psnr/compare_ssim, which get real
numpy implementations because the reference metric protocol uses them).
"""
from __future__ import annotations

import sys
import types

import numpy as np

REF = "/root/reference"


def _unavailable(name):
    def f(*a, **k):
        raise RuntimeError(f"stubbed module {name} was called")
    return f


def _np_psnr(image_true, image_test, data_range=None):
    err = np.mean((np.asarray(image_true, np.float64)
                   - np.asarray(image_test, np.float64)) ** 2)
    return 10.0 * np.log10(float(data_range) ** 2 / err)


def install_stubs():
    if "torchsummary" not in sys.modules:
        m = types.ModuleType("torchsummary")
        m.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = m
    for name in ("rawpy", "rawpy.enhance", "exifread"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.imread = _unavailable(name)
            m.process_file = _unavailable(name)
            sys.modules[name] = m
    if "bm3d" not in sys.modules:
        m = types.ModuleType("bm3d")
        m.bm3d = _unavailable("bm3d")
        sys.modules["bm3d"] = m
    if "natsort" not in sys.modules:
        m = types.ModuleType("natsort")
        m.natsort = m
        m.natsorted = sorted
        sys.modules["natsort"] = m
    if "kornia" not in sys.modules:
        m = types.ModuleType("kornia")
        kf = types.ModuleType("kornia.filters")
        kf.median_blur = _unavailable("kornia.filters.median_blur")
        kf.gaussian_blur2d = _unavailable("kornia.filters.gaussian_blur2d")
        m.filters = kf
        sys.modules["kornia"] = m
        sys.modules["kornia.filters"] = kf
    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        met = types.ModuleType("skimage.metrics")
        met.peak_signal_noise_ratio = _np_psnr
        met.structural_similarity = _unavailable("skimage ssim")
        sk.metrics = met
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = met


def load_reference_yond():
    """Import and return the reference YOND_SIDD module."""
    install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib
    return importlib.import_module("YOND_SIDD")

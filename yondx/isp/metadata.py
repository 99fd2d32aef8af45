"""SIDD .MAT metadata parsing (reference utils/sidd_utils.py:3-73) and
gated camera-file metadata readers (reference utils/isp_ops.py:3-54)."""
from __future__ import annotations

import numpy as np


def read_wb_ccm(path: str):
    """White balance + CCM from a camera raw via rawpy (reference
    read_wb_ccm, isp_ops.py:3-18). Gated: rawpy is not in this image."""
    try:
        import rawpy
    except ImportError as e:
        raise ImportError("read_wb_ccm needs rawpy/LibRaw (not available "
                          "in this environment)") from e
    with rawpy.imread(path) as raw:
        wb = np.array(raw.camera_whitebalance, np.float32)
        wb = wb / wb[1]
        ccm = np.array(raw.color_matrix[:3, :3], np.float32)
        return wb, ccm


def get_iso_exposure(path: str):
    """EXIF ISO + exposure time (reference get_ISO_ExposureTime/metainfo,
    isp_ops.py:20-54). Gated: exifread is not in this image."""
    try:
        import exifread
    except ImportError as e:
        raise ImportError("get_iso_exposure needs exifread (not available "
                          "in this environment)") from e
    with open(path, "rb") as f:
        tags = exifread.process_file(f)
    iso = int(str(tags.get("EXIF ISOSpeedRatings", 0)))
    expo = str(tags.get("EXIF ExposureTime", "0"))
    if "/" in expo:
        a, b = expo.split("/")
        exposure = float(a) / float(b)
    else:
        exposure = float(expo)
    return iso, exposure

_CAM_DICT = {"Apple": "IP", "Google": "GP", "samsung": "S6",
             "motorola": "N6", "LGE": "G4"}
_BAYER_TAG_ID = 33422


def _get_iso(meta):
    try:
        return meta["ISOSpeedRatings"][0][0]
    except Exception:
        return meta["DigitalCamera"][0, 0]["ISOSpeedRatings"][0][0]


def _get_bayer_pattern(meta):
    for grab in (
        lambda m: m["UnknownTags"],
        lambda m: m["SubIFDs"][0, 0]["UnknownTags"][0, 0],
        lambda m: m["SubIFDs"][0, 1]["UnknownTags"],
    ):
        try:
            tags = grab(meta)
            if tags[1]["ID"][0][0][0] == _BAYER_TAG_ID:
                return tags[1]["Value"][0][0]
        except Exception:
            continue
    return [1, 2, 2, 3]  # assume RGGB


def read_sidd_metadata(matdata) -> dict:
    """Parse a loaded *_METADATA_*.MAT dict into the pipeline's metadata
    (reference read_metadata, sidd_utils.py:3-20): noise-model betas from
    UnknownTags[7], camera code, 2x2 bayer pattern (S6 forced GBRG), wb,
    CST2, iso."""
    meta = matdata["metadata"][0, 0]
    beta1, beta2 = meta["UnknownTags"][7, 0][2][0][0:2]
    cam = _CAM_DICT[meta["Make"][0]]
    bayer_pattern = _get_bayer_pattern(meta)
    if cam == "S6":
        bayer_pattern = [1, 2, 0, 1]  # corrected GBRG (sidd_utils.py:9-10)
    bayer_2by2 = (np.asarray(bayer_pattern) + 1).reshape((2, 2)).tolist()
    wb = meta["AsShotNeutral"]
    cst2 = meta["ColorMatrix2"].reshape((3, 3))
    iso = _get_iso(meta)
    return {
        "meta": meta, "beta1": beta1, "beta2": beta2,
        "bayer_2by2": bayer_2by2, "wb": wb, "cst2": cst2,
        "iso": iso, "cam": cam,
    }

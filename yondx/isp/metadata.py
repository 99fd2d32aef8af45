"""SIDD .MAT metadata parsing (reference utils/sidd_utils.py:3-73)."""
from __future__ import annotations

import numpy as np

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

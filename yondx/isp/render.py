"""sRGB renders for visualization / sRGB-domain metrics.

These are off the hot path (visualization only — reference renders with cv2
on the host: `FastISP` isp_ops.py:171-198, `process_sidd_image`
sidd_utils.py:156-180, batch `process` data_process/process.py:142-155). The
host paths here use cv2's edge-aware demosaic for parity with reference
PNGs; `process_rggb` is a pure-jnp batched render (half-res RGB, no
demosaic) suitable for on-device training previews.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .bayer import flip_bayer, bayer2rggb

# sRGB D65 primaries, reference sidd_utils.py:161-167 / unprocess.py:29-31.
RGB2XYZ = np.array([
    [0.4124564, 0.3575761, 0.1804375],
    [0.2126729, 0.7151522, 0.0721750],
    [0.0193339, 0.1191920, 0.9503041],
])

# Default Sony CCM used by FastISP when none is given (isp_ops.py:189-192).
SONY_CCM = np.array([
    [1.9712269, -0.6789218, -0.29230508],
    [-0.29104823, 1.748401, -0.45735288],
    [0.02051281, -0.5380369, 1.5175241],
])


def process_rggb(rggb, wb, cam2rgb, gamma: float = 2.2):
    """Pure-jnp batched render: RGGB planes -> half-res sRGB.

    Equivalent of reference `process` (data_process/process.py:142-155):
    wb gains -> clip -> green-average binning -> CCM -> clip -> gamma with
    8-bit quantization. rggb: [..., h, w, 4] RGGB; wb: [..., 4] per-channel
    gains (R, G1, G2, B); cam2rgb: [..., 3, 3].
    """
    x = rggb * wb[..., None, None, :]
    x = jnp.clip(x, 0.0, 1.0)
    rgb = jnp.stack([
        x[..., 0],
        (x[..., 1] + x[..., 2]) * 0.5,
        x[..., 3],
    ], axis=-1)
    rgb = jnp.einsum("...hwc,...dc->...hwd", rgb, cam2rgb)
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = jnp.clip(rgb, 1e-8, None) ** (1.0 / gamma)
    # 8-bit quantization like gamma_compression (process.py:124-129)
    rgb = jnp.clip(jnp.floor(rgb * 255.0), 0, 255) / 255.0
    return rgb


def fast_isp(img4c: np.ndarray, wb=None, ccm=None, gamma: float = 2.2):
    """Host render of RGBG packed planes via cv2 EA demosaic (reference
    FastISP, isp_ops.py:171-198). img4c: [h, w, 4] in RGBG order
    (R, G1, G2, B at channels 0,1,2,3)."""
    import cv2
    img4c = np.asarray(img4c)
    h, w = img4c.shape[:2]
    H, W = h * 2, w * 2
    raw = np.zeros((H, W), np.float32)
    red_gain = wb[0] if wb is not None else 2
    blue_gain = wb[2] if wb is not None else 2
    raw[0:H:2, 0:W:2] = img4c[:, :, 0] * red_gain
    raw[0:H:2, 1:W:2] = img4c[:, :, 1]
    raw[1:H:2, 0:W:2] = img4c[:, :, 2]
    raw[1:H:2, 1:W:2] = img4c[:, :, 3] * blue_gain
    raw = np.clip(raw, 0, 1)
    wp = 16383
    img = cv2.cvtColor((raw * wp).astype(np.uint16),
                       cv2.COLOR_BAYER_BG2RGB_EA) / wp
    if ccm is None:
        ccm = SONY_CCM
    img = np.sum(img[:, :, None, :] * np.asarray(ccm)[None, None, :, :], axis=-1)
    return np.clip(img, 0, 1) ** (1 / gamma)


def simple_isp(rggb: np.ndarray, bl=512, wp=16383, wb=(2, 1, 1, 2),
               gamma: float = 2.2):
    """Half-res render without demosaic (reference SimpleISP,
    isp_ops.py:162-169)."""
    raw = (np.asarray(rggb, np.float32) - bl) / (wp - bl)
    raw = raw * np.asarray(wb).reshape(1, 1, -1)
    raw = raw.clip(0, 1)[:, :, (0, 1, 3)]
    return raw ** (1 / gamma)


def raw2rgb_rawpy(packed_raw, raw=None, wb=None, ccm=None,
                  template: str | None = None):
    """LibRaw template render (reference raw2rgb_rawpy, isp_ops.py:199-232):
    write the packed RGBG planes (or a bare bayer frame) into a template
    raw file's visible area and run rawpy.postprocess with the camera (or
    given) wb/ccm. Gated: the rawpy wheel is absent from this image.

    packed_raw: [h, w, 4] RGBG planes in [0, 1], or [H, W] bayer DN.
    template: path to a .dng/.ARW template (the reference hardcodes
    'templet.dng' for >1500-px-wide frames, else 'templet.ARW')."""
    try:
        import rawpy
    except ImportError as e:
        raise ImportError(
            "raw2rgb_rawpy needs rawpy/LibRaw which is not available in "
            "this environment; use process_sidd_image/fast_isp for "
            "template-free renders") from e
    from .raw_io import bayer2raw
    if raw is None:
        if template is None:
            big = packed_raw.shape[-2] > 1500
            template = "templet.dng" if big else "templet.ARW"
        raw = rawpy.imread(template)
        wp, bl = (1023, 64) if template.endswith(".dng") else (16383, 512)
    else:
        wp, bl = 1023, 64
    if wb is None:
        wb = np.array(raw.camera_whitebalance, np.float64)
        wb = wb / wb[1]
    wb = list(np.asarray(wb).reshape(-1))
    if ccm is not None and np.max(np.abs(np.asarray(ccm) - np.eye(3))) == 0:
        ccm = SONY_CCM  # the reference's SonyA7S2 fallback (isp_ops.py:222)
    if np.asarray(packed_raw).ndim >= 3:
        raw.raw_image_visible[:] = np.asarray(
            bayer2raw(packed_raw, wp=wp, bl=bl))
    else:
        raw.raw_image_visible[:] = np.asarray(packed_raw)
    return raw.postprocess(use_camera_wb=False, user_wb=wb, half_size=False,
                           no_auto_bright=True, output_bps=8, bright=1,
                           user_black=None, user_sat=None)


def process_sidd_image(bayer: np.ndarray, bayer_2by2, wb, cst2,
                       save_file_rgb: str | None = None) -> np.ndarray:
    """SIDD render: bayer -> uint8 BGR sRGB (reference
    process_sidd_image, sidd_utils.py:156-180 + process :270-277):
    clip -> flip CFA to RGGB -> plane stack -> wb -> cv2 EA demosaic at
    14-bit -> cam2rgb (row-normalized inverse of cst2*rgb2xyz) -> gamma 2.2.
    """
    import cv2
    image = np.clip(np.asarray(bayer), 0, 1)
    image = np.asarray(flip_bayer(jnp.asarray(image), bayer_2by2))
    rggb = np.asarray(bayer2rggb(jnp.asarray(image)))
    rgb2cam = np.matmul(np.asarray(cst2), RGB2XYZ)
    cam2rgb = np.linalg.inv(rgb2cam)
    cam2rgb = cam2rgb / np.sum(cam2rgb, axis=-1, keepdims=True)
    wb = np.asarray(wb).reshape(-1)
    gains = np.array([1 / wb[0], 1 / wb[1], 1 / wb[1], 1 / wb[2]])
    x = np.clip(rggb * gains[None, None, :], 0.0, 1.0)
    # RGGB plane stack -> bayer -> cv2 EA demosaic at 14-bit
    h, w = x.shape[:2]
    bay = np.zeros((h * 2, w * 2), np.float32)
    bay[0::2, 0::2] = x[:, :, 0]
    bay[0::2, 1::2] = x[:, :, 1]
    bay[1::2, 0::2] = x[:, :, 2]
    bay[1::2, 1::2] = x[:, :, 3]
    dem = cv2.cvtColor(np.clip(bay * 16383, 0, 16383).astype(np.uint16),
                       cv2.COLOR_BayerBG2RGB_EA).astype(np.float32) / 16383
    rgb = np.sum(dem[:, :, None, :] * cam2rgb[None, None, :, :], axis=-1)
    rgb = np.clip(rgb, 0.0, 1.0)
    rgb = np.maximum(rgb, 1e-8) ** (1.0 / 2.2)
    bgr = rgb[:, :, ::-1]
    out = (bgr * 255.0).astype(np.uint8)
    if save_file_rgb:
        cv2.imwrite(save_file_rgb, out)
    return out

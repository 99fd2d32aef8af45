"""ISP ops: Bayer pack/unpack, CFA normalization, sRGB renders.

TPU-native rebuild of the reference's L1 layer (utils/isp_ops.py,
utils/sidd_utils.py). Everything here is pure jnp (jit/vmap/grad-safe) with
trailing-channel (NHWC) layout; host-side numpy twins are provided where a
function naturally runs on the IO path.
"""
from .bayer import (
    bayer2rggb, rggb2bayer, bayer_aug, rot_bayer_k, rot_bayer, flip_bayer,
    bayer2rows, rows2bayer, bayer2gray,
)
from .render import (fast_isp, simple_isp, process_rggb,
                     process_sidd_image, raw2rgb_rawpy)
from .metadata import read_sidd_metadata
from .filters import (
    guided_filter, fast_guided_filter, bilateral_1d, row_denoise,
    blur1d_log,
)
from .raw_io import (
    pack_raw, unpack_raw, raw2bayer, bayer2raw, repair_bad_pixels,
    space_to_depth, depth_to_space,
)

__all__ = [
    "bayer2rggb", "rggb2bayer", "bayer_aug", "rot_bayer_k", "rot_bayer",
    "flip_bayer", "bayer2rows", "rows2bayer", "bayer2gray",
    "fast_isp", "simple_isp", "process_rggb", "process_sidd_image",
    "raw2rgb_rawpy",
    "read_sidd_metadata",
    "guided_filter", "fast_guided_filter", "bilateral_1d", "row_denoise",
    "blur1d_log",
    "pack_raw", "unpack_raw", "raw2bayer", "bayer2raw",
    "repair_bad_pixels", "space_to_depth", "depth_to_space",
]

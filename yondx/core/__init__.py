"""Foundation utilities: dtypes, tiling, padding, rng, logging, meters.

TPU-native rebuild of the reference's L0 layer (utils/utils.py in
fenghansen/YOND_public): seeding (`setup_seed`, utils/utils.py:54), logging
(`log`, :85), meters (`AverageMeter`, :100), pad-to-multiple (`get_p2d`,
:246) and big-image tiling (`big_image_split/merge`, :254).
"""
from .rng import setup_seed, rng_seq
from .tiling import pad_to_multiple, unpad, tile_overlap, untile_overlap
from .logging import log, set_logfile, timestamp
from .meters import AverageMeter, MetricsRecorder

__all__ = [
    "setup_seed", "rng_seq",
    "pad_to_multiple", "unpad", "tile_overlap", "untile_overlap",
    "log", "set_logfile", "timestamp",
    "AverageMeter", "MetricsRecorder",
]

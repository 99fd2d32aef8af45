"""Data engine: sRGB -> pseudo-raw unprocessing, physics-based noise
synthesis, and dataset readers.

TPU-first redesign of the reference's L3/L4 layers (data_process/): the
reference runs `unprocess` + noise synthesis per-item in CPU DataLoader
workers (yond_datasets.py:277-333); here the host only yields uint8 sRGB
crops and the whole augmentation pipeline (CCM/WB inversion, gamma, mosaic,
CFA-phase rotation, AWGN or Poisson-Gaussian synthesis) runs *inside the
training jit* under jax.random — zero host preprocessing on the hot path.
"""
from .unprocess import (
    random_ccm, random_gains, unprocess_batch, mosaic, srgb_to_pseudo_raw,
)
from .noise import (
    awgn_log_uniform, sample_pg_params, add_pg_noise,
    CAMERA_NOISE_PARAMS, get_camera_noisy_params, sample_params,
    generate_noisy,
)
from .datasets import (
    SyntheticSRGBDataset, NpyFolderDataset, SIDDValDataset, BatchLoader,
)
from .eval_datasets import LRIDDataset, ELDDataset, DNDDataset, MultiDataset
from .augment import (
    get_aug_param, sna, illuminance_correct, HighBitRecovery,
)
from .pg_dataset import pg_training_batch, pg_est_features
from .raw_dataset import SIDRawDataset, raw_awgn_batch

__all__ = [
    "random_ccm", "random_gains", "unprocess_batch", "mosaic",
    "srgb_to_pseudo_raw",
    "awgn_log_uniform", "sample_pg_params", "add_pg_noise",
    "CAMERA_NOISE_PARAMS", "get_camera_noisy_params", "sample_params",
    "generate_noisy",
    "SyntheticSRGBDataset", "NpyFolderDataset", "SIDDValDataset",
    "BatchLoader",
    "LRIDDataset", "ELDDataset", "DNDDataset", "MultiDataset",
    "get_aug_param", "sna", "illuminance_correct", "HighBitRecovery",
    "pg_training_batch", "pg_est_features",
    "SIDRawDataset", "raw_awgn_batch",
]

"""Parallelism over a jax.sharding.Mesh.

The reference's entire distributed surface is DDP gradient all-reduce +
DistributedSampler over local GPUs via NCCL (trainer_base.py:117-125,
trainer_AWGN.py:43-61 — SURVEY.md §2.10). The TPU-native equivalent:

- data parallelism: a 1-D mesh over all chips, batch sharded on the 'data'
  axis, params replicated; XLA inserts the gradient all-reduce (psum) over
  ICI — no explicit communication code;
- spatial sharding (the image analog of sequence/context parallelism): a
  full-resolution frame split along H across chips with shard_map + halo
  exchange (ppermute) so box-filter NLE windows and the UNet's receptive
  field see their neighbors' borders;
- multi-host: jax.distributed.initialize + per-host data loading (the
  DistributedSampler analog); barriers are implicit in SPMD collectives.
"""
from .mesh import make_mesh, shard_batch, replicate
from .spatial import (sharded_box_stats, spatial_denoise_sharded,
                      spatial_denoise_sharded_pair,
                      sharded_mad_self_estimate, sharded_self_nlf_robust)
from .product import iter_denoise_frame_sharded

__all__ = ["make_mesh", "shard_batch", "replicate",
           "sharded_box_stats", "spatial_denoise_sharded",
           "spatial_denoise_sharded_pair", "iter_denoise_frame_sharded",
           "sharded_mad_self_estimate", "sharded_self_nlf_robust"]

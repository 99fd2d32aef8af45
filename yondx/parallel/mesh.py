"""Mesh construction + sharding helpers (data parallelism)."""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D (default) mesh over the first n devices. For multi-axis meshes
    pass axis_names and n_devices as the product of the desired shape."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.array(devs[:n])
    if len(axis_names) == 1:
        return Mesh(devs, axis_names)
    # split n into a near-square grid for 2-D meshes
    a = int(np.floor(np.sqrt(n)))
    while n % a:
        a -= 1
    return Mesh(devs.reshape(a, n // a), axis_names)


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host array with its leading dim sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(batch, sharding)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Multi-host (DCN) initialization — the TPU-native analog of the
    reference's torch.distributed.init_process_group + LOCAL_RANK plumbing
    (trainer_base.py:73,117-125). Call once per host before building the
    mesh; with no args it reads the standard cluster env (TPU pods
    auto-discover). Returns this host's process index. Data loading should
    shard by process index (the DistributedSampler analog)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif coordinator is None:
        try:
            jax.distributed.initialize()
        except Exception:
            pass  # single-process / already initialized
    return jax.process_index()

"""Deterministic RNG plumbing.

The reference pins global numpy/torch seeds for reproducible eval
(`setup_seed`, reference utils/utils.py:54-60; per-item reseeding in
yond_datasets.py:289). In JAX randomness is explicit: everything on-device
draws from `jax.random` keys. `setup_seed` here covers the residual host-side
numpy randomness (dataset shuffles, synthetic fixtures) and `rng_seq` is a
convenience splitter for host loops.
"""
from __future__ import annotations

import numpy as np
import jax


def setup_seed(seed: int) -> None:
    """Pin host-side numpy RNG (reference utils/utils.py:54-60 analog)."""
    np.random.seed(seed)


def rng_seq(seed_or_key):
    """Infinite generator of fresh JAX PRNG keys.

    >>> keys = rng_seq(0)
    >>> k1, k2 = next(keys), next(keys)
    """
    key = (
        jax.random.PRNGKey(seed_or_key)
        if isinstance(seed_or_key, int)
        else seed_or_key
    )
    while True:
        key, sub = jax.random.split(key)
        yield sub

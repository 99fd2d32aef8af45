"""Test config: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised the TPU-native way — an
xla_force_host_platform_device_count CPU mesh — since real multi-chip
hardware is absent (SURVEY.md §4).
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment force-registers the axon TPU plugin regardless of
# JAX_PLATFORMS;
# config.update is the reliable way to pin tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(1997)  # reference's global seed (utils/utils.py:54-60)
    yield

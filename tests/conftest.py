"""Test harness: run everything on a virtual 8-device CPU platform.

This is the TPU-world "fake backend" the reference lacks (SURVEY.md §4):
sharding/collective code paths are exercised on 8 virtual CPU devices so
multi-chip logic is tested without hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-registers the TPU plugin and overwrites
# jax_platforms programmatically; undo that before any backend initializes so
# tests run on the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Test config: force JAX onto a virtual 8-device CPU mesh.

The axon sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon, so env vars set here are too late — but backends
initialize lazily, so jax.config.update('jax_platforms', 'cpu') before
the first device use works (and XLA_FLAGS is still read at backend init).
Real-TPU compiles go through a remote-compile relay (~90 s each), far too
slow for tests; the TPU path is exercised by bench.py instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Device mesh helpers (SURVEY.md §5 "distributed backend": the
reference has none; the TPU equivalent is jax.sharding over ICI)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "P", "NamedSharding"]


def make_mesh(n_devices: int = None, axis: str = "d") -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)} — tests use "
                f"XLA_FLAGS=--xla_force_host_platform_device_count")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=(axis,))

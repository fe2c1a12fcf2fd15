"""Mesh helpers for multi-chip execution."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def default_mesh(n_devices: int | None = None, axis: str = "rows") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))

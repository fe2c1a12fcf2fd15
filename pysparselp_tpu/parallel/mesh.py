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


def pad_gather_width(mats_v, mats_i, k_max=None):
    """Stack per-shard (rows, K_i, ...) value/index pairs after padding
    every K_i to a common gather width (zero values, index 0) — shard_map
    requires shape-uniform shards.  Shared by the sharded ADMM tile
    builder and the sharded-IPM ELL builder."""
    if k_max is None:
        k_max = max(v.shape[1] for v in mats_v)
    out_v, out_i = [], []
    for v, i in zip(mats_v, mats_i):
        pad = k_max - v.shape[1]
        if pad:
            v = np.concatenate(
                [v, np.zeros((v.shape[0], pad) + v.shape[2:], v.dtype)], 1)
            i = np.concatenate(
                [i, np.zeros((i.shape[0], pad), i.dtype)], 1)
        out_v.append(v)
        out_i.append(i)
    return np.stack(out_v), np.stack(out_i)

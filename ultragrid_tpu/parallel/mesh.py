"""Device mesh helpers for frame-parallel execution."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    data: int = 1,
    spatial: Optional[int] = None,
) -> Mesh:
    """Create a ("data", "spatial") mesh over the first n devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if spatial is None:
        spatial = n // data
    assert data * spatial == n, f"mesh {data}x{spatial} != {n} devices"
    arr = np.array(devs).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def shard_frame_rows(mesh: Mesh):
    """Sharding for a single frame [H, linesize]: rows across 'spatial'."""
    return NamedSharding(mesh, P("spatial", None))


def shard_batch(mesh: Mesh):
    """Sharding for a batch of frames [B, H, linesize]: frames across 'data',
    rows across 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial", None))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())

"""Device-mesh helpers for multi-chip / multi-host sharding."""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MAP_AXIS = "map"


def make_mesh(n_devices: Optional[int] = None, axis: str = MAP_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def map_sharding(mesh: Mesh, axis: str = MAP_AXIS) -> NamedSharding:
    """Shard leading (slot) dimension of the voxel-map arrays."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

"""Multi-host initialization and DCN x ICI mesh construction.

BASELINE config 5: keyframe/map-block partitioning over N >= 2 hosts.
Host-level parallelism uses a 2-D mesh with a `host` axis laid out over
DCN and the `map` axis over ICI, so the frequent collectives (kNN
all_gather merges, psum normal-equation reductions inside a host's map
shard group) ride the fast intra-slice interconnect, while only the
windowed-BA block exchange and pose-graph synchronization cross DCN.

This module cannot be exercised on the single-chip CI environment; the
mesh logic is validated on the virtual multi-device CPU backend
(tests/test_distributed_loop.py), a REAL 2-process gloo run
(tests/test_distributed_multiprocess.py), and `dryrun_multichip` covers
the sharded compute path.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

HOST_AXIS = "host"
MAP_AXIS = "map"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed bootstrap (no-op when single-process).

    Honors the standard JAX env vars (JAX_COORDINATOR_ADDRESS etc.) when
    arguments are omitted."""
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def make_host_map_mesh(map_parallelism: Optional[int] = None) -> Mesh:
    """2-D (host, map) mesh: `host` spans processes (DCN), `map` spans the
    local devices of each process (ICI).

    With a single process this degenerates to (1, n_devices) and behaves
    exactly like the 1-D map mesh."""
    devices = jax.devices()
    n_proc = jax.process_count()
    per_host = len(devices) // n_proc
    if map_parallelism is not None:
        per_host = min(per_host, map_parallelism)
    grid = np.array(
        sorted(devices, key=lambda d: (d.process_index, d.id))
    )[: n_proc * per_host].reshape(n_proc, per_host)
    return Mesh(grid, (HOST_AXIS, MAP_AXIS))


def shard_keyframes_by_host(n_keyframes: int, mesh: Mesh) -> Tuple[int, int]:
    """Contiguous keyframe range [lo, hi) owned by this process (keyframe
    partitioning for distributed windowed BA)."""
    n_hosts = mesh.shape[HOST_AXIS]
    me = jax.process_index()
    per = -(-n_keyframes // n_hosts)
    lo = min(me * per, n_keyframes)
    hi = min(lo + per, n_keyframes)
    return lo, hi

"""Device-resident voxel-hash map: the TPU replacement for robin_map.

The reference keeps two `tsl::robin_map<voxel, voxelBlock>` instances
(geometry 1.0 m and color 0.1 m voxels, cloudMap.h:171) mutated point by
point.  Here the map is a fixed-capacity open-addressing hash table laid
out as flat device arrays, and every operation is a batched, vectorized
array program:

  * insertion  — multi-round parallel slot claiming (scatter-min arbitration
    emulating atomic CAS) + sorted-segment append, mirroring the semantics of
    addPointToMap (lioOptimization.cpp:400-446): per-voxel capacity K,
    min-distance spacing vs existing points, no growth beyond capacity;
  * lookup/kNN — 27-voxel neighborhood gather + top-k
    (searchNeighbors, optimize.cpp:365-426).

Voxel coordinates use C++ truncation-toward-zero semantics
(`static_cast<short>(x / voxel_size)`, cloudMap.h:136-139) for parity with
the reference's voxel partitioning.  The spatial hash mirrors the 3-prime
hash (cloudMap.h:173-183) in uint32 arithmetic.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

# Sentinel marking an empty hash slot (coordinates from real points are
# bounded by det_range/voxel_size << 2^30).
EMPTY = jnp.int32(0x7FFFFFFF)

_P1 = jnp.uint32(73856093)
_P2 = jnp.uint32(19349669)
_P3 = jnp.uint32(83492791)


class VoxelMap(NamedTuple):
    """Open-addressing voxel hash table as flat device arrays.

    capacity C must be a power of two; K = points per voxel block.
    """
    keys: jnp.ndarray      # (C, 3) int32 voxel coords; keys[:,0]==EMPTY => free
    points: jnp.ndarray    # (C, K, 3) f32 world positions
    counts: jnp.ndarray    # (C,) int32 number of valid points in the block
    point_ids: jnp.ndarray  # (C, K) int32 external payload id (-1 = none)


def make_map(capacity: int, voxel_points: int, dtype=jnp.float32) -> VoxelMap:
    assert capacity & (capacity - 1) == 0, "capacity must be a power of two"
    return VoxelMap(
        keys=jnp.full((capacity, 3), EMPTY, jnp.int32),
        points=jnp.zeros((capacity, voxel_points, 3), dtype),
        counts=jnp.zeros((capacity,), jnp.int32),
        point_ids=jnp.full((capacity, voxel_points), -1, jnp.int32),
    )


def voxel_coords(pts: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """World points -> int32 voxel coords, truncation toward zero (C++ cast)."""
    return jnp.trunc(pts / voxel_size).astype(jnp.int32)


def voxel_hash(coords: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """3-prime spatial hash (cloudMap.h:173-183) masked to the table size."""
    c = coords.astype(jnp.uint32)
    h = c[..., 0] * _P1 + c[..., 1] * _P2 + c[..., 2] * _P3
    return (h & jnp.uint32(capacity - 1)).astype(jnp.int32)


def _keys_equal(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def lookup(vmap: VoxelMap, coords: jnp.ndarray, max_probe: int) -> jnp.ndarray:
    """Find slot indices for voxel coords; -1 where absent.

    coords: (..., 3) int32.  Returns (...,) int32 slot ids.
    """
    capacity = vmap.keys.shape[0]
    base = voxel_hash(coords, capacity)
    slot = jnp.full(base.shape, -1, jnp.int32)
    # A probe chain is terminated by the first EMPTY slot; track liveness so a
    # match after an empty slot (impossible under linear probing w/o deletes)
    # is not falsely accepted.
    alive = jnp.ones(base.shape, bool)
    for r in range(max_probe):
        cand = (base + r) & (capacity - 1)
        k = vmap.keys[cand]
        is_empty = k[..., 0] == EMPTY
        match = _keys_equal(k, coords) & alive & (slot < 0)
        slot = jnp.where(match, cand, slot)
        alive = alive & ~is_empty
    return slot


def insert(vmap: VoxelMap, pts: jnp.ndarray, valid: jnp.ndarray,
           voxel_size: float, min_distance: float, max_probe: int,
           point_ids: Optional[jnp.ndarray] = None,
           ) -> Tuple[VoxelMap, jnp.ndarray]:
    """Insert a batch of world points with addPointToMap semantics.

    Per point: locate (or create) the voxel block; append if the block is not
    full AND the point is farther than `min_distance` from every point
    already in the block.  Batch-internal ordering is deterministic
    (ascending point index within a voxel).  Unlike the strictly sequential
    reference loop (lioOptimization.cpp:400-446), points of the *same batch*
    landing in the same voxel are not distance-checked against each other;
    upstream voxel-grid subsampling at >= min_distance spacing makes the
    difference immaterial.

    Returns (new_map, accepted) where accepted is a bool mask of points that
    were stored.  `point_ids` optionally tags stored points with an external
    payload id (used by the color-map registry).
    """
    capacity, K = vmap.points.shape[0], vmap.points.shape[1]
    n = pts.shape[0]
    coords = voxel_coords(pts, voxel_size)
    base = voxel_hash(coords, capacity)
    if point_ids is None:
        point_ids = jnp.full((n,), -1, jnp.int32)

    keys = vmap.keys
    slot = jnp.full((n,), -1, jnp.int32)
    # Multi-round claim: each unresolved point probes (hash + r); the winner
    # (lowest point index, via scatter-min) writes its key into an empty
    # slot, then everyone re-checks for a key match.  This reproduces what
    # concurrent CAS insertion would do, deterministically.
    for r in range(max_probe):
        unresolved = (slot < 0) & valid
        cand = (base + r) & (capacity - 1)
        k = keys[cand]
        match = _keys_equal(k, coords) & unresolved
        slot = jnp.where(match, cand, slot)
        unresolved = (slot < 0) & valid

        is_empty = (k[..., 0] == EMPTY) & unresolved
        claim = jnp.full((capacity,), n, jnp.int32)
        claim = claim.at[jnp.where(is_empty, cand, capacity)].min(
            jnp.arange(n, dtype=jnp.int32), mode="drop")
        winner = is_empty & (claim[cand] == jnp.arange(n, dtype=jnp.int32))
        keys = keys.at[jnp.where(winner, cand, capacity)].set(
            coords, mode="drop")
        # Losers re-check: their target slot may now hold their key.
        k2 = keys[cand]
        match2 = _keys_equal(k2, coords) & unresolved
        slot = jnp.where(match2, cand, slot)

    has_slot = slot >= 0
    safe_slot = jnp.where(has_slot, slot, 0)

    # Min-distance gate vs points already in the block (pre-batch contents).
    blk_pts = vmap.points[safe_slot]                      # (n, K, 3)
    blk_cnt = vmap.counts[safe_slot]                      # (n,)
    occ = jnp.arange(K)[None, :] < blk_cnt[:, None]       # (n, K)
    d2 = jnp.sum((blk_pts - pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(occ, d2, jnp.inf)
    min_d2 = jnp.min(d2, axis=-1)
    far_enough = min_d2 > (min_distance * min_distance)

    want = valid & has_slot & far_enough

    # Rank points within each slot by sorting (slot, index); position in the
    # block = old count + within-slot rank.
    order = jnp.argsort(jnp.where(want, slot, capacity), stable=True)
    slot_sorted = jnp.where(want, slot, capacity)[order]
    seg_start = jnp.concatenate(
        [jnp.ones((1,), bool), slot_sorted[1:] != slot_sorted[:-1]])
    idx_in_sorted = jnp.arange(n)
    start_idx = jnp.where(seg_start, idx_in_sorted, 0)
    start_idx = jax.lax.associative_scan(jnp.maximum, start_idx)
    rank_sorted = idx_in_sorted - start_idx
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted.astype(jnp.int32))

    pos = blk_cnt + rank
    accept = want & (pos < K)

    flat_idx = jnp.where(accept, safe_slot * K + pos, capacity * K)
    points_flat = vmap.points.reshape(capacity * K, 3)
    points_flat = points_flat.at[flat_idx].set(pts, mode="drop")
    ids_flat = vmap.point_ids.reshape(capacity * K)
    ids_flat = ids_flat.at[flat_idx].set(point_ids, mode="drop")

    add = jnp.zeros((capacity,), jnp.int32).at[
        jnp.where(accept, safe_slot, capacity)].add(1, mode="drop")
    counts = vmap.counts + add

    return VoxelMap(keys=keys,
                    points=points_flat.reshape(capacity, K, 3),
                    counts=counts,
                    point_ids=ids_flat.reshape(capacity, K)), accept


_OFFSETS27 = None


def _offsets(nb: int) -> jnp.ndarray:
    rng = jnp.arange(-nb, nb + 1, dtype=jnp.int32)
    ox, oy, oz = jnp.meshgrid(rng, rng, rng, indexing="ij")
    return jnp.stack([ox.ravel(), oy.ravel(), oz.ravel()], axis=-1)


@functools.partial(jax.jit, static_argnames=(
    "voxel_size", "max_neighbors", "max_probe", "nb_voxels"))
def knn(vmap: VoxelMap, queries: jnp.ndarray, *, voxel_size: float,
        max_neighbors: int, max_probe: int, nb_voxels: int = 1,
        threshold_capacity: int = 1,
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """k-nearest-neighbors over the (2*nb+1)^3 voxel neighborhood.

    Semantics of searchNeighbors (optimize.cpp:365-426): visit neighboring
    voxels of each query, skip blocks with fewer than `threshold_capacity`
    points, rank all contained points by Euclidean distance, keep the
    closest `max_neighbors`.

    Returns (neighbors (Q, M, 3), neighbor_valid (Q, M) bool, dists (Q, M))
    sorted ascending by distance.
    """
    K = vmap.points.shape[1]
    q_coords = voxel_coords(queries, voxel_size)           # (Q, 3)
    offs = _offsets(nb_voxels)                             # (V, 3)
    coords27 = q_coords[:, None, :] + offs[None, :, :]     # (Q, V, 3)
    slots = lookup(vmap, coords27, max_probe)              # (Q, V)
    found = slots >= 0
    safe = jnp.where(found, slots, 0)

    cnt = jnp.where(found, vmap.counts[safe], 0)           # (Q, V)
    cnt = jnp.where(cnt >= threshold_capacity, cnt, 0)
    cand = vmap.points[safe]                               # (Q, V, K, 3)
    cand_ok = jnp.arange(K)[None, None, :] < cnt[:, :, None]

    Q, V = slots.shape
    cand = cand.reshape(Q, V * K, 3)
    cand_ok = cand_ok.reshape(Q, V * K)
    d2 = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand_ok, d2, jnp.inf)

    neg_d2, idx = jax.lax.top_k(-d2, max_neighbors)        # ascending distance
    nb_pts = jnp.take_along_axis(cand, idx[..., None], axis=1)
    nb_ok = jnp.take_along_axis(cand_ok, idx, axis=1)
    dists = jnp.sqrt(jnp.maximum(jnp.where(nb_ok, -neg_d2, 0.0), 0.0))
    return nb_pts, nb_ok, dists


def map_size(vmap: VoxelMap) -> jnp.ndarray:
    """Total stored points (reference mapSize, lioOptimization.cpp:574)."""
    return jnp.sum(vmap.counts)


def remove_far_voxels(vmap: VoxelMap, location: jnp.ndarray,
                      distance: float) -> VoxelMap:
    """Evict voxels whose first point is farther than `distance` from
    `location` (removePointsFarFromLocation, lioOptimization.cpp:556-572).

    Note: eviction frees slots mid-chain; subsequent lookups tolerate this
    because insertion re-claims empty slots and lookup() stops at the first
    empty slot only for chains created after the eviction.  To keep probe
    chains coherent we do not mark the key EMPTY but TOMBSTONE-free the
    block by zeroing counts; the slot keeps matching its key and can be
    refilled by future inserts of the same voxel.
    """
    first_pt = vmap.points[:, 0, :]
    d2 = jnp.sum((first_pt - location[None, :]) ** 2, axis=-1)
    evict = (vmap.counts > 0) & (d2 > distance * distance)
    counts = jnp.where(evict, 0, vmap.counts)
    return vmap._replace(counts=counts)

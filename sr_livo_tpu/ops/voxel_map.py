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
hash (cloudMap.h:173-183) in int32 wraparound arithmetic (bit-identical
to uint32 modular arithmetic; uint32 multiply is pathological on this
TPU backend — see the note above _P1).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Sentinel marking an empty hash slot (coordinates from real points are
# bounded by det_range/voxel_size << 2^30).
EMPTY = np.int32(0x7FFFFFFF)

# All hash arithmetic runs in int32 two's-complement (bit-identical to the
# uint32 modular arithmetic of the reference hash, cloudMap.h:173-183),
# and every constant is a HOST scalar (np.int32), never a module-level
# jnp scalar: on this TPU backend, an integer multiply whose constant is a
# closed-over concrete DEVICE scalar takes minutes to compile AND
# permanently degrades every subsequent program execution on the device
# (~30x dispatch floor, measured); the same multiply with a literal
# constant is instant.  Signature primes >= 2^31 are written as their
# wrapped int32 bit patterns.
_P1 = np.int32(73856093)
_P2 = np.int32(19349669)
_P3 = np.int32(83492791)

# Independent primes for the 31-bit slot signature (int32 bit patterns of
# 2654435761, 2246822519, 3266489917).
_S1 = np.int32(-1640531535)
_S2 = np.int32(-2048144777)
_S3 = np.int32(-1028477379)
SIG_EMPTY = np.int32(-1)


def voxel_sig(coords: jnp.ndarray) -> jnp.ndarray:
    """31-bit non-negative voxel signature (never equals SIG_EMPTY)."""
    c = coords
    h = c[..., 0] * _S1 + c[..., 1] * _S2 + c[..., 2] * _S3
    h = h ^ jax.lax.shift_right_logical(h, 15)
    return h & np.int32(0x7FFFFFFF)


class VoxelMap(NamedTuple):
    """Open-addressing voxel hash table as flat device arrays.

    capacity C must be a power of two; K = points per voxel block.
    Probing scans the compact `sig` column (one word per slot, 31-bit
    signature of the voxel key) and exactly verifies the selected slot
    against `keys` — TPU random-gather bandwidth on one int32 column is
    ~3x that of a 3-int32 row gather.
    """
    keys: jnp.ndarray      # (C, 3) int32 voxel coords; keys[:,0]==EMPTY => free
    sig: jnp.ndarray       # (C,) int32 signature; SIG_EMPTY (-1) => free slot
    points: jnp.ndarray    # (C*K, 3) f32 positions; block c at rows [c*K, c*K+K)
    counts: jnp.ndarray    # (C,) int32 number of valid points in the block
    point_ids: jnp.ndarray  # (C*K,) int32 external payload id (-1 = none)

    # `points`/`point_ids` are stored FLAT, not (C, K, ...): TPU scatter into
    # a (C, K, 3) operand forces a physical relayout of the whole table
    # around the update (~11 ms at 2^19x20 blocks) whereas a row scatter
    # into the flat layout is ~1 ms and alias-updates in place under
    # donation.  Block row c occupies rows [c*K, (c+1)*K).  GATHERS go the
    # other way: an element-wise flat gather of (..., K) rows is ~8x slower
    # than gathering whole blocks through a reshape view — use
    # `gather_blocks`, never `points[slots*K + arange(K)]`.

    @property
    def block_capacity(self) -> int:
        return self.points.shape[0] // self.counts.shape[0]


def block_rows(slots: jnp.ndarray, K: int) -> jnp.ndarray:
    """Flat row indices of all K slots of each block: (..., K).
    For SCATTER index computation only — for gathers use gather_blocks."""
    return slots[..., None] * K + jnp.arange(K, dtype=jnp.int32)


def gather_blocks(table: jnp.ndarray, slots: jnp.ndarray, K: int
                  ) -> jnp.ndarray:
    """Gather whole K-row blocks from a flat table: (..., K[, d]).

    Lowered as a row gather through a (C, K[, d]) reshape view — one
    contiguous K-row slice per index, ~8x faster on TPU than an
    element-wise gather of the same rows."""
    C = table.shape[0] // K
    return table.reshape((C, K) + table.shape[1:])[slots]


def make_map(capacity: int, voxel_points: int, dtype=jnp.float32) -> VoxelMap:
    assert capacity & (capacity - 1) == 0, "capacity must be a power of two"
    return VoxelMap(
        keys=jnp.full((capacity, 3), EMPTY, jnp.int32),
        sig=jnp.full((capacity,), SIG_EMPTY, jnp.int32),
        points=jnp.zeros((capacity * voxel_points, 3), dtype),
        counts=jnp.zeros((capacity,), jnp.int32),
        point_ids=jnp.full((capacity * voxel_points,), -1, jnp.int32),
    )


def voxel_coords(pts: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """World points -> int32 voxel coords, truncation toward zero (C++ cast)."""
    return jnp.trunc(pts / voxel_size).astype(jnp.int32)


def voxel_hash(coords: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """3-prime spatial hash (cloudMap.h:173-183) masked to the table size.

    int32 wraparound arithmetic — bit-identical low bits to the reference's
    uint32 modular hash (see the dtype note above _P1)."""
    c = coords
    h = c[..., 0] * _P1 + c[..., 1] * _P2 + c[..., 2] * _P3
    return h & np.int32(capacity - 1)


def _keys_equal(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def _probe_chain(sig_col: jnp.ndarray, coords: jnp.ndarray, max_probe: int):
    """All probe positions at once over the one-word signature column:
    returns (cand (..., P), match_idx, empty_idx) where *_idx are the first
    signature-match/empty position along the chain (== P when absent).
    One compact gather instead of P sequential rounds — the TPU-friendly
    formulation of linear probing.  Matches are probabilistic (31-bit
    signature); callers verify the selected slot against `keys`."""
    capacity = sig_col.shape[0]
    base = voxel_hash(coords, capacity)
    offs = jnp.arange(max_probe, dtype=jnp.int32)
    cand = (base[..., None] + offs) & (capacity - 1)      # (..., P)
    s = sig_col[cand]                                     # (..., P) u32
    want = voxel_sig(coords)
    match = s == want[..., None]
    empty = s == SIG_EMPTY
    match_idx = jnp.where(jnp.any(match, -1),
                          jnp.argmax(match, -1), max_probe)
    empty_idx = jnp.where(jnp.any(empty, -1),
                          jnp.argmax(empty, -1), max_probe)
    return cand, match_idx, empty_idx


def _resolve(vmap_keys, cand, match_idx, empty_idx, coords, max_probe):
    """Slot of the first signature match (before the first empty), exactly
    verified against the keys column; -1 when absent or on a (2^-31)
    signature false positive."""
    found = (match_idx < max_probe) & (match_idx < empty_idx)
    take = jnp.minimum(match_idx, max_probe - 1)
    slot = jnp.take_along_axis(cand, take[..., None], axis=-1)[..., 0]
    verify = jnp.all(vmap_keys[slot] == coords, axis=-1)
    return jnp.where(found & verify, slot, -1)


def lookup(vmap: VoxelMap, coords: jnp.ndarray, max_probe: int) -> jnp.ndarray:
    """Find slot indices for voxel coords; -1 where absent.

    coords: (..., 3) int32.  Returns (...,) int32 slot ids.  A probe chain
    is terminated by the first EMPTY slot (no deletes shorten chains).
    """
    cand, match_idx, empty_idx = _probe_chain(vmap.sig, coords, max_probe)
    return _resolve(vmap.keys, cand, match_idx, empty_idx, coords, max_probe)


def _insert_gate_phase(vmap: VoxelMap, pts: jnp.ndarray, valid: jnp.ndarray,
                       coords: jnp.ndarray, min_distance: float,
                       max_probe: int):
    """Phases 1-2 of insert(): one batched probe + the cheap full-batch
    candidate gate.  Returns (cand_mask, slot, blk_cnt): cand_mask is True
    for points that would enter the claim/append phases (existing-voxel
    append passing min-distance and capacity, or a new-voxel claim with
    probe room); slot is the resolved block (-1 = absent)."""
    K = vmap.block_capacity
    n = pts.shape[0]
    # Phase 1 — one batched probe resolves every point whose voxel already
    # exists (the common case on a warm map).
    cand, match_idx, empty_idx = _probe_chain(vmap.sig, coords, max_probe)
    slot = _resolve(vmap.keys, cand, match_idx, empty_idx, coords, max_probe)
    has_slot = slot >= 0
    safe_slot = jnp.where(has_slot, slot, 0)

    # Phase 2 — cheap full-batch gate: min-distance vs the block's current
    # points + block-not-full, and claim eligibility for absent voxels.
    blk_cnt = jnp.where(has_slot, vmap.counts[safe_slot], 0)   # (n,)
    if min_distance > 0.0:
        blk_pts = gather_blocks(vmap.points, safe_slot, K)  # (n, K, 3)
        occ = jnp.arange(K)[None, :] < blk_cnt[:, None]
        d2 = jnp.sum((blk_pts - pts[:, None, :]) ** 2, axis=-1)
        min_d2 = jnp.min(jnp.where(occ, d2, jnp.inf), axis=-1)
        far_enough = min_d2 > (min_distance * min_distance)
    else:
        far_enough = jnp.ones((n,), bool)
    ok_existing = valid & has_slot & far_enough & (blk_cnt < K)
    needs_claim = valid & ~has_slot & (empty_idx < max_probe)
    return ok_existing | needs_claim, slot, blk_cnt


def _insert_gate_phase_chunked(vmap: VoxelMap, pts, valid, coords,
                               min_distance: float, max_probe: int,
                               chunk: int):
    """_insert_gate_phase over only rows up to the LAST VALID row of the
    batch, in `chunk`-row slices with a dynamic trip count.  The gate is
    per-row (probe + block-distance vs the PRE-insert table only), so
    chunking is exact for ANY validity pattern: the trip count covers
    through the last valid row (not the valid popcount, which would
    under-run a batch whose validity has holes mid-prefix — e.g. the
    sharded engine's budget-masked insert batch); the skipped tail gets
    (False, -1, 0) — identical to what the full-batch phase returns for
    invalid rows.  Prefix-compacted batches still pay only
    ceil(popcount/chunk) trips, so static insert budgets carry imbalance
    slack without probe work for the padding (same trick as
    models.lio.chunked_assoc)."""
    n = pts.shape[0]
    chunk = min(chunk, n)
    n_rows = jnp.max(jnp.where(valid, jnp.arange(n, dtype=jnp.int32) + 1, 0))
    n_chunks = (n_rows + chunk - 1) // chunk

    def body(i, bufs):
        cm, sl, bc = bufs
        off = i * chunk
        sli = lambda a: jax.lax.dynamic_slice_in_dim(a, off, chunk)
        m, s, b = _insert_gate_phase(vmap, sli(pts), sli(valid),
                                     sli(coords), min_distance, max_probe)
        upd = jax.lax.dynamic_update_slice_in_dim
        return (upd(cm, m, off, 0), upd(sl, s, off, 0), upd(bc, b, off, 0))

    bufs0 = (jnp.zeros((n,), bool), jnp.full((n,), -1, jnp.int32),
             jnp.zeros((n,), jnp.int32))
    return jax.lax.fori_loop(0, n_chunks, body, bufs0)


def insert_gate(vmap: VoxelMap, pts: jnp.ndarray, valid: jnp.ndarray,
                voxel_size: float, min_distance: float, max_probe: int,
                gate_chunk: int = 0, with_aux: bool = False):
    """Standalone candidate predicate of insert() (phases 1-2 only):
    which points of the batch would be insertion candidates against the
    CURRENT table.  Used by the sharded engine to reproduce the
    single-chip `budget` prefix globally (parallel.sharded_lio).

    `with_aux=True` additionally returns the (slot, blk_cnt) aux arrays,
    which insert() can consume via `pre_gate` to skip re-running the
    probe/distance phase (the gate is the dominant insert cost — one
    K-point block gather per row)."""
    coords = voxel_coords(pts, voxel_size)
    if gate_chunk and gate_chunk < pts.shape[0]:
        gate, slot, cnt = _insert_gate_phase_chunked(
            vmap, pts, valid, coords, min_distance, max_probe, gate_chunk)
    else:
        gate, slot, cnt = _insert_gate_phase(vmap, pts, valid, coords,
                                             min_distance, max_probe)
    return (gate, slot, cnt) if with_aux else gate


def insert(vmap: VoxelMap, pts: jnp.ndarray, valid: jnp.ndarray,
           voxel_size: float, min_distance: float, max_probe: int,
           point_ids: Optional[jnp.ndarray] = None,
           budget: Optional[int] = None,
           gate_chunk: int = 0,
           pre_gate: Optional[Tuple[jnp.ndarray, jnp.ndarray,
                                    jnp.ndarray]] = None,
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

    `budget` bounds how many candidate points go through the expensive
    claim/rank/scatter phases per call (a cheap full-batch pre-gate rejects
    the common failures first).  Overflowing candidates are dropped for this
    call — on a live map the same voxels reappear next sweep, so the map
    self-heals; None processes the full batch.

    `gate_chunk` > 0 runs the probe/distance gate phase in chunks over
    only the rows up to the last valid one (exact for any validity
    pattern — the gate is per-row against the pre-insert table; cheapest
    when validity is prefix-compacted).

    Returns (new_map, accepted) where accepted is a bool mask of points that
    were stored.  `point_ids` optionally tags stored points with an external
    payload id (used by the color-map registry).
    """
    capacity, K = vmap.counts.shape[0], vmap.block_capacity
    n = pts.shape[0]
    b = n if budget is None else min(budget, n)
    coords = voxel_coords(pts, voxel_size)
    if point_ids is None:
        point_ids = jnp.full((n,), -1, jnp.int32)

    keys = vmap.keys
    sig_col = vmap.sig

    if pre_gate is not None:
        # caller already ran insert_gate(with_aux=True) against THIS
        # table state; `valid` may be a narrowing of the gate's valid
        # (e.g. the sharded engine's global insert-budget mask)
        g, slot, blk_cnt = pre_gate
        cand_mask = g & valid
    elif gate_chunk and gate_chunk < n:
        cand_mask, slot, blk_cnt = _insert_gate_phase_chunked(
            vmap, pts, valid, coords, min_distance, max_probe, gate_chunk)
    else:
        cand_mask, slot, blk_cnt = _insert_gate_phase(
            vmap, pts, valid, coords, min_distance, max_probe)

    # Phase 3 — compact candidates to the budget (stable by index) with a
    # cumsum scatter (cheaper than a full-length sort).
    idx_b = jnp.arange(b, dtype=jnp.int32)
    if b < n:
        rank_n = jnp.cumsum(cand_mask.astype(jnp.int32)) - 1
        dst = jnp.where(cand_mask & (rank_n < b), rank_n, b)
        sel = jnp.full((b,), n - 1, jnp.int32).at[dst].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True)
        live = jnp.zeros((b,), bool).at[dst].set(
            True, mode="drop", unique_indices=True)
    else:
        sel = jnp.arange(n, dtype=jnp.int32)
        live = cand_mask
    pts_c = pts[sel]
    coords_c = coords[sel]
    ids_c = point_ids[sel]
    slot_c = jnp.where(live, slot[sel], -1)
    cnt_c = blk_cnt[sel]
    want_c = voxel_sig(coords_c)

    # Phase 4 — claim rounds for new voxels on the compacted set: each
    # still-pending point targets the first empty slot of its probe chain;
    # scatter-min arbitration elects one winner per slot (emulating the CAS
    # that concurrent insertion would perform), the winner writes sig+keys,
    # everyone else re-probes (same-voxel losers then match the winner's
    # signature and join its block).  The loop runs until no claim is
    # pending — every point either lands in a block or provably cannot
    # (probe chain full), so the outcome is layout-independent, matching
    # the sequential reference semantics.  On a warm map (no new voxels)
    # the loop exits without running a single round.
    def _claim_round(carry):
        keys, sig_col, slot_c, cnt_c, pending = carry
        cand_c, mi_c, ei_c = _probe_chain(sig_col, coords_c, max_probe)
        resolved = _resolve(keys, cand_c, mi_c, ei_c, coords_c, max_probe)
        joined = pending & (resolved >= 0)
        slot_c = jnp.where(joined, resolved, slot_c)
        cnt_c = jnp.where(joined, 0, cnt_c)

        unresolved = pending & ~joined & (ei_c < max_probe)
        tgt = jnp.take_along_axis(
            cand_c, jnp.minimum(ei_c, max_probe - 1)[..., None], -1)[..., 0]
        claim = jnp.full((capacity,), b, jnp.int32)
        claim = claim.at[jnp.where(unresolved, tgt, capacity)].min(
            idx_b, mode="drop")
        winner = unresolved & (claim[tgt] == idx_b)
        # dropped rows get distinct out-of-bounds indices so the
        # unique_indices contract holds
        w_idx = jnp.where(winner, tgt, capacity + idx_b)
        keys = keys.at[w_idx].set(coords_c, mode="drop", unique_indices=True)
        sig_col = sig_col.at[w_idx].set(want_c, mode="drop",
                                        unique_indices=True)
        slot_c = jnp.where(winner, tgt, slot_c)
        cnt_c = jnp.where(winner, 0, cnt_c)
        # keep only losers whose chain still has room: at least one winner
        # is elected per contended slot each round, so this terminates
        pending = unresolved & ~winner
        return keys, sig_col, slot_c, cnt_c, pending

    keys, sig_col, slot_c, cnt_c, _ = jax.lax.while_loop(
        lambda c: jnp.any(c[4]), _claim_round,
        (keys, sig_col, slot_c, cnt_c, live & (slot_c < 0)))

    ok_c = live & (slot_c >= 0)
    safe_c = jnp.where(ok_c, slot_c, 0)

    # Phase 5 — within-voxel rank by sorting (slot, index); position in the
    # block = current count + rank.
    ro = jnp.argsort(jnp.where(ok_c, slot_c, capacity), stable=True)
    ss = jnp.where(ok_c, slot_c, capacity)[ro]
    seg = jnp.concatenate([jnp.ones((1,), bool), ss[1:] != ss[:-1]])
    start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(seg, jnp.arange(b), 0))
    rank = jnp.zeros((b,), jnp.int32).at[ro].set(
        (jnp.arange(b) - start).astype(jnp.int32))

    pos = cnt_c + rank
    accept_c = ok_c & (pos < K)

    # Phase 6 — budget-sized scatters directly into the flat table.
    flat_idx = jnp.where(accept_c, safe_c * K + pos, capacity * K + idx_b)
    points_new = vmap.points.at[flat_idx].set(pts_c, mode="drop",
                                              unique_indices=True)
    ids_new = vmap.point_ids.at[flat_idx].set(ids_c, mode="drop",
                                              unique_indices=True)
    add = jnp.zeros((capacity,), jnp.int32).at[
        jnp.where(accept_c, safe_c, capacity)].add(1, mode="drop")
    counts = vmap.counts + add

    accepted = jnp.zeros((n,), bool).at[sel].set(accept_c)

    return VoxelMap(keys=keys, sig=sig_col, points=points_new,
                    counts=counts, point_ids=ids_new), accepted


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
    K = vmap.block_capacity
    q_coords = voxel_coords(queries, voxel_size)           # (Q, 3)
    offs = _offsets(nb_voxels)                             # (V, 3)
    coords27 = q_coords[:, None, :] + offs[None, :, :]     # (Q, V, 3)
    slots = lookup(vmap, coords27, max_probe)              # (Q, V)
    found = slots >= 0
    safe = jnp.where(found, slots, 0)

    cnt = jnp.where(found, vmap.counts[safe], 0)           # (Q, V)
    cnt = jnp.where(cnt >= threshold_capacity, cnt, 0)
    cand = gather_blocks(vmap.points, safe, K)             # (Q, V, K, 3)
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
    refilled by future inserts of the same voxel.  On a long traverse the
    table monotonically fills with dead keys — use compact_map()
    periodically to actually reclaim the slots (the erase semantics of
    the reference robin_map).
    """
    first_pt = vmap.points[::vmap.block_capacity, :]
    d2 = jnp.sum((first_pt - location[None, :]) ** 2, axis=-1)
    evict = (vmap.counts > 0) & (d2 > distance * distance)
    counts = jnp.where(evict, 0, vmap.counts)
    return vmap._replace(counts=counts)


def compact_map_impl(vmap: VoxelMap, location: jnp.ndarray, *,
                     distance: float, max_probe: int
                     ) -> Tuple[VoxelMap, jnp.ndarray]:
    """Rebuild the table keeping only voxels within `distance` of
    `location`: the slot-reclaiming eviction (erase semantics of
    removePointsFarFromLocation, lioOptimization.cpp:556-572 — robin_map
    `erase` frees the bucket; the tombstone in remove_far_voxels does
    not).  Every surviving voxel is re-hashed into a FRESH table with the
    same claim-round arbitration as insert(), so probe chains come out
    coherent and minimal.  O(capacity * rounds) — run it every
    eviction_every_n_frames, off the per-sweep path.

    Returns (new_map, n_dropped): voxels that could not be re-placed
    within `max_probe` (possible only at pathological load factors;
    counted, never silent).
    """
    capacity, K = vmap.counts.shape[0], vmap.block_capacity
    first_pt = vmap.points[::K, :]
    d2 = jnp.sum((first_pt - location[None, :]) ** 2, axis=-1)
    live = (vmap.counts > 0) & (d2 <= distance * distance)
    coords = vmap.keys
    want = voxel_sig(coords)
    idx = jnp.arange(capacity, dtype=jnp.int32)

    new_keys = jnp.full((capacity, 3), EMPTY, jnp.int32)
    new_sig = jnp.full((capacity,), SIG_EMPTY, jnp.int32)

    # Claim rounds at voxel granularity: all keys are DISTINCT (they came
    # from one table), so no same-key joins happen — each round every
    # still-pending voxel targets the first empty slot of its probe chain
    # in the NEW table, scatter-min elects one winner per slot, losers
    # re-probe past the now-occupied slot.
    def _round(carry):
        new_keys, new_sig, slot_new, pending = carry
        cand, _mi, ei = _probe_chain(new_sig, coords, max_probe)
        can = pending & (ei < max_probe)
        tgt = jnp.take_along_axis(
            cand, jnp.minimum(ei, max_probe - 1)[..., None], -1)[..., 0]
        claim = jnp.full((capacity,), capacity, jnp.int32).at[
            jnp.where(can, tgt, capacity)].min(idx, mode="drop")
        winner = can & (claim[tgt] == idx)
        w_idx = jnp.where(winner, tgt, capacity + idx)
        new_keys = new_keys.at[w_idx].set(coords, mode="drop",
                                          unique_indices=True)
        new_sig = new_sig.at[w_idx].set(want, mode="drop",
                                        unique_indices=True)
        slot_new = jnp.where(winner, tgt, slot_new)
        pending = pending & ~winner & (ei < max_probe)
        return new_keys, new_sig, slot_new, pending

    new_keys, new_sig, slot_new, pending = jax.lax.while_loop(
        lambda c: jnp.any(c[3]), _round,
        (new_keys, new_sig, jnp.full((capacity,), -1, jnp.int32), live))
    placed = live & (slot_new >= 0)
    n_dropped = (jnp.sum(live) - jnp.sum(placed)).astype(jnp.int32)

    # Move blocks to their new homes with whole-block scatters.
    dst_rows = block_rows(jnp.where(placed, slot_new, capacity + idx),
                          K).reshape(-1)
    src = gather_blocks(vmap.points, idx, K).reshape(capacity * K, 3)
    src_ids = gather_blocks(vmap.point_ids, idx, K).reshape(capacity * K)
    new_points = jnp.zeros_like(vmap.points).at[dst_rows].set(
        src, mode="drop", unique_indices=True)
    new_ids = jnp.full_like(vmap.point_ids, -1).at[dst_rows].set(
        src_ids, mode="drop", unique_indices=True)
    new_counts = jnp.zeros_like(vmap.counts).at[
        jnp.where(placed, slot_new, capacity + idx)].set(
        vmap.counts, mode="drop", unique_indices=True)
    return VoxelMap(keys=new_keys, sig=new_sig, points=new_points,
                    counts=new_counts, point_ids=new_ids), n_dropped


compact_map = functools.partial(
    jax.jit, static_argnames=("distance", "max_probe"), donate_argnums=(0,)
)(compact_map_impl)

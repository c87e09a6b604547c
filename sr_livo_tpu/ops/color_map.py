"""Colored map: global RGB point registry + 0.1 m color voxel table.

TPU-native re-design of the reference visual map (rgbPoint +
color_voxel_map + Hash_map_3d dedup + rgb_points_vec registry;
cloudMap.h/cloudMap.cpp + addPointToColorMap lioOptimization.cpp:448-518
+ rgbMapTracker renderer).  The registry is SoA device arrays addressed
by integer ids; voxel blocks store registry ids; rendering (Bayesian
color fusion, cloudMap.cpp:59-100) is one masked scatter program —
no mutexes, unlike the reference's per-point lock in
threadRenderPointsInVoxel (rgbMapTracker.cpp:206-212).

Design deviation (documented): the reference appends near-duplicate
points (dedup-grid hits) into voxel blocks without registering them;
those copies only consume render time.  Here a point is stored iff it
claims a new dedup cell AND its block accepts it, so every stored point
is registered.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sr_livo_tpu.ops import image_ops
from sr_livo_tpu.ops import voxel_map as vm

# Render constants (rgbMapTracker.cpp:176-177 / cloudMap.cpp:56-57).
IMAGE_OBS_COV = 15.0
PROCESS_NOISE_SIGMA = 0.1


# Packed-registry column layout: every per-point field lives in one
# (R, 16) f32 row so the render path does ONE row gather + ONE row scatter
# instead of 5 + 5 per-field ops (random row access is the scarce resource
# on TPU; a 16-wide f32 row is one vector register lane group).
C_RGB = slice(0, 3)
C_COV = slice(3, 6)
C_POS = slice(6, 9)
C_NRGB = 9            # observation count (exact in f32 below 2^24)
C_DIST = 10
C_TIME = 11
C_VEL = slice(12, 14)
C_OUT = 14            # outlier count
C_VALID = 15          # 0.0 / 1.0
REG_WIDTH = 16


class ColorMap(NamedTuple):
    # packed registry, capacity R
    reg: jnp.ndarray            # (R, 16) f32, columns per C_* above
    count: jnp.ndarray          # () int32 allocated ids (including holes)
    # color voxel table (point_ids -> registry ids)
    vox: vm.VoxelMap
    vox_last_visit: jnp.ndarray  # (C,) f32
    # dedup grid: signature-only open-addressing set at min_distance
    # resolution (a 2^-31 signature collision wrongly drops one point —
    # immaterial for a visualization map)
    dedup_sig: jnp.ndarray       # (D,) int32; SIG_EMPTY (-1) = free
    # compacted list of voxel slots touched by the latest insert (-1 pad);
    # replaces a top_k scan over the whole table in the render/select paths
    recent_slots: jnp.ndarray    # (V,) int32

    # ---- column views (convenience accessors; slices are cheap in XLA) --
    @property
    def pos(self):
        return self.reg[:, C_POS]

    @property
    def rgb(self):
        return self.reg[:, C_RGB]

    @property
    def cov_rgb(self):
        return self.reg[:, C_COV]

    @property
    def n_rgb(self):
        return self.reg[:, C_NRGB].astype(jnp.int32)

    @property
    def obs_dist(self):
        return self.reg[:, C_DIST]

    @property
    def last_obs_time(self):
        return self.reg[:, C_TIME]

    @property
    def img_vel(self):
        return self.reg[:, C_VEL]

    @property
    def outlier_count(self):
        return self.reg[:, C_OUT].astype(jnp.int32)

    @property
    def reg_valid(self):
        return self.reg[:, C_VALID] > 0.5


def make_color_map(registry: int, capacity: int, voxel_points: int,
                   recent: int = 2048, dtype=jnp.float32) -> ColorMap:
    return ColorMap(
        reg=jnp.zeros((registry, REG_WIDTH), dtype),
        count=jnp.int32(0),
        vox=vm.make_map(capacity, voxel_points, dtype),
        vox_last_visit=jnp.full((capacity,), -1.0, dtype),
        dedup_sig=jnp.full((capacity * 2,), vm.SIG_EMPTY, jnp.int32),
        recent_slots=jnp.full((recent,), -1, jnp.int32),
    )


def _claim_dedup(dedup_sig: jnp.ndarray, coords: jnp.ndarray,
                 valid: jnp.ndarray, max_probe: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Claim cells in the signature-only dedup set.  Returns
    (new_sig, is_new): is_new[i] True iff point i claimed a previously-
    absent cell (and is the batch winner for it).  Scatter-min arbitration
    elects one winner per cell (as in the voxel-map insert); a same-cell
    loser matches the winner's signature on its next probe and resolves
    as a duplicate.  Claim rounds run to a FIXPOINT (while_loop, like
    voxel_map.insert phase 4): a valid non-duplicate point is only ever
    dropped when its whole probe chain is full — never because a
    different-signature winner beat it to a cell in a bounded number of
    rounds.  Terminates: each round elects >= 1 winner per contended
    cell, and a point whose chain has no empty cell left is resolved as
    dropped."""
    cap = dedup_sig.shape[0]
    n = coords.shape[0]
    base = vm.voxel_hash(coords, cap)
    want = vm.voxel_sig(coords)
    idx_n = jnp.arange(n, dtype=jnp.int32)
    offs = jnp.arange(max_probe, dtype=jnp.int32)

    def _round(carry):
        sig, is_new, resolved = carry
        cand = (base[:, None] + offs) & (cap - 1)
        g = sig[cand]
        match = jnp.any(g == want[:, None], axis=-1)
        empty = g == vm.SIG_EMPTY
        has_empty = jnp.any(empty, axis=-1)
        ei = jnp.where(has_empty, jnp.argmax(empty, -1), max_probe)
        resolved = resolved | match          # duplicate (pre-existing or
        unres = ~resolved & (ei < max_probe)  # claimed by an earlier winner)
        tgt = jnp.take_along_axis(
            cand, jnp.minimum(ei, max_probe - 1)[:, None], -1)[..., 0]
        claim = jnp.full((cap,), n, jnp.int32).at[
            jnp.where(unres, tgt, cap)].min(idx_n, mode="drop")
        winner = unres & (claim[tgt] == idx_n)
        sig = sig.at[jnp.where(winner, tgt, cap + idx_n)].set(
            want, mode="drop", unique_indices=True)
        is_new = is_new | winner
        # resolved: matched, won, or probe chain exhausted (dropped)
        resolved = resolved | winner | ~has_empty
        return sig, is_new, resolved

    sig, is_new, _ = jax.lax.while_loop(
        lambda c: ~jnp.all(c[2]), _round,
        (dedup_sig, jnp.zeros((n,), bool), ~valid))
    return sig, is_new


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=(
    "voxel_size", "min_distance", "max_probe", "budget"))
def color_insert(cmap: ColorMap, pts: jnp.ndarray, valid: jnp.ndarray,
                 obs_time, *, voxel_size: float, min_distance: float,
                 max_probe: int, budget=None
                 ) -> Tuple[ColorMap, jnp.ndarray]:
    """Insert sweep points into the colored map (addPointToColorMap
    semantics, lioOptimization.cpp:448-518) and update the recent-visited
    voxel timestamps.

    Returns (new_map, n_new_visited) where n_new_visited counts voxels whose
    visit stamp first became `obs_time` in this call
    (number_of_new_visited_voxel, lioOptimization.cpp:509-516).

    The map argument is DONATED: callers must rebind (`cmap, n = color_insert
    (cmap, ...)`) and must not reuse the old arrays.  Dedup winners are
    compacted to `budget` before the voxel insert, so the expensive
    probe/claim/scatter phases run on `budget`-sized arrays; over-budget
    winners are dropped for this call (their dedup cells stay claimed —
    a bounded, self-limiting leak on pathological single-sweep bursts).
    """
    registry = cmap.pos.shape[0]
    n = pts.shape[0]
    b = n if budget is None else min(budget, n)

    dd_coords = vm.voxel_coords(pts, min_distance)
    dedup_sig, is_new = _claim_dedup(cmap.dedup_sig, dd_coords, valid,
                                     max_probe)

    # Compact dedup winners to the budget (stable by index): registry ids
    # are consecutive in compacted order.
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    dst = jnp.where(is_new & (rank < b), rank, b)
    sel = jnp.full((b,), 0, jnp.int32).at[dst].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True)
    live = jnp.zeros((b,), bool).at[dst].set(
        True, mode="drop", unique_indices=True)
    pts_c = pts[sel]
    ids_c = cmap.count + jnp.arange(b, dtype=jnp.int32)
    cand_c = live & (ids_c < registry)

    vox_new, accepted_c = vm.insert(
        cmap.vox, pts_c, cand_c, voxel_size, 0.0, max_probe,
        point_ids=ids_c)

    safe_ids = jnp.where(accepted_c, ids_c, registry)
    rows = jnp.zeros((b, REG_WIDTH), cmap.reg.dtype)
    rows = rows.at[:, C_POS].set(pts_c)
    rows = rows.at[:, C_VALID].set(1.0)
    reg = cmap.reg.at[safe_ids].set(rows, mode="drop")
    count = cmap.count + jnp.sum(cand_c.astype(jnp.int32))

    # recent-visited tracking: every valid point's voxel slot
    coords = vm.voxel_coords(pts, voxel_size)
    slots = vm.lookup(vox_new, coords, max_probe)
    ok = valid & (slots >= 0)
    now = jnp.asarray(obs_time, cmap.vox_last_visit.dtype)
    visit = cmap.vox_last_visit.at[
        jnp.where(ok, slots, cmap.vox_last_visit.shape[0])].set(
            now, mode="drop")
    n_new_visited = jnp.sum(
        (visit == now) & (cmap.vox_last_visit != now)).astype(jnp.int32)

    # compacted unique touched-slot list for the render/select paths
    # (winner-per-slot arbitration by scatter-min, then stable compaction)
    cap_v = cmap.vox_last_visit.shape[0]
    idx_pts = jnp.arange(n, dtype=jnp.int32)
    claim = jnp.full((cap_v,), n, jnp.int32).at[
        jnp.where(ok, slots, cap_v)].min(idx_pts, mode="drop")
    winner = ok & (claim[jnp.clip(slots, 0, cap_v - 1)] == idx_pts)
    n_recent = cmap.recent_slots.shape[0]
    vrank = jnp.cumsum(winner.astype(jnp.int32)) - 1
    vdst = jnp.where(winner & (vrank < n_recent), vrank, n_recent)
    recent_slots = jnp.full((n_recent,), -1, jnp.int32).at[vdst].set(
        slots, mode="drop", unique_indices=True)

    new_map = cmap._replace(reg=reg, count=count, vox=vox_new,
                            vox_last_visit=visit, dedup_sig=dedup_sig,
                            recent_slots=recent_slots)
    return new_map, n_new_visited


def project_points(pts: jnp.ndarray, q_cw: jnp.ndarray, t_cw: jnp.ndarray,
                   intr: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                               jnp.ndarray]:
    """World -> pixel projection (project3dTo2d, lioOptimization.cpp:142).

    intr = [fx, fy, cx, cy].  Returns (uv (N, 2), z_ok (N,), pc (N, 3))."""
    from sr_livo_tpu.utils import lie
    pc = lie.quat_rotate(jnp.broadcast_to(q_cw, (pts.shape[0], 4)), pts) + t_cw
    z = pc[..., 2]
    z_ok = z > 0.001
    z_safe = jnp.where(z_ok, z, 1.0)
    u = pc[..., 0] * intr[0] / z_safe + intr[2]
    v = pc[..., 1] * intr[1] / z_safe + intr[3]
    return jnp.stack([u, v], axis=-1), z_ok, pc


def in_fov(uv: jnp.ndarray, cols: int, rows: int,
           margin: float) -> jnp.ndarray:
    """if2dPointsAvailable (lioOptimization.cpp:48-60)."""
    u, v = uv[..., 0], uv[..., 1]
    return ((u >= margin * cols + 1) & (u < (1 - margin) * cols - 1)
            & (v >= margin * rows + 1) & (v < (1 - margin) * rows - 1))


def update_rgb(cmap: ColorMap, ids: jnp.ndarray, obs_rgb: jnp.ndarray,
               obs_dist: jnp.ndarray, obs_time, upd_mask: jnp.ndarray,
               obs_sigma: float = IMAGE_OBS_COV,
               rows: jnp.ndarray = None) -> ColorMap:
    """Vectorized rgbPoint::updateRgb (cloudMap.cpp:59-100) over unique ids.

    One packed row gather + one packed row scatter; `rows` optionally
    passes pre-gathered registry rows (reg[clip(ids)]) from the caller."""
    registry = cmap.reg.shape[0]
    if rows is None:
        rows = cmap.reg[jnp.clip(ids, 0, registry - 1)]

    cur_rgb = rows[:, C_RGB]
    cur_cov = rows[:, C_COV]
    cur_n = rows[:, C_NRGB]
    cur_dist = rows[:, C_DIST]
    cur_time = rows[:, C_TIME]

    obs_time = jnp.asarray(obs_time, cmap.reg.dtype)
    # occlusion gate (cloudMap.cpp:61-64)
    gate = (cur_dist == 0) | (obs_dist <= cur_dist * 1.2)
    mask = upd_mask & gate
    first = cur_n == 0

    # first observation
    rgb_first = jnp.round(obs_rgb)
    cov_first = jnp.full_like(cur_cov, obs_sigma)

    # Bayesian fusion
    cov_pn = cur_cov + PROCESS_NOISE_SIGMA * jnp.maximum(
        obs_time - cur_time, 0.0)[..., None]
    cov_pn = jnp.maximum(cov_pn, 1e-3)
    new_cov = jnp.sqrt(1.0 / (1.0 / (cov_pn * cov_pn) + 1.0 / (obs_sigma ** 2)))
    rgb_fused = (new_cov * new_cov
                 * (cur_rgb / (cov_pn * cov_pn) + obs_rgb / (obs_sigma ** 2)))

    rows_new = rows
    rows_new = rows_new.at[:, C_RGB].set(
        jnp.where(first[..., None], rgb_first, rgb_fused))
    rows_new = rows_new.at[:, C_COV].set(
        jnp.where(first[..., None], cov_first, new_cov))
    rows_new = rows_new.at[:, C_NRGB].set(cur_n + 1)
    rows_new = rows_new.at[:, C_DIST].set(
        jnp.where(first, obs_dist, jnp.minimum(cur_dist, obs_dist)))
    rows_new = rows_new.at[:, C_TIME].set(obs_time)

    # distinct out-of-bounds indices for dropped rows (unique_indices holds:
    # valid ids are unique — each registry id lives in one voxel slot)
    sel = jnp.where(mask, ids,
                    registry + jnp.arange(ids.shape[0], dtype=jnp.int32))
    reg = cmap.reg.at[sel].set(rows_new, mode="drop", unique_indices=True)
    return cmap._replace(reg=reg)


@functools.partial(jax.jit, static_argnames=(
    "max_render_points", "cols", "rows"))
def render_recent(cmap: ColorMap, image: jnp.ndarray, q_cw: jnp.ndarray,
                  t_cw: jnp.ndarray, t_wc_world: jnp.ndarray,
                  intr: jnp.ndarray, obs_time, *,
                  cols: int, rows: int,
                  max_render_points: int = 8192,
                  fov_margin: float = 0.005) -> ColorMap:
    """Color registry points in recently-visited voxels from `image`
    (renderPointsInRecentVoxel, rgbMapTracker.cpp:181-237).

    The recent-voxel set is the compacted `recent_slots` list recorded by
    the latest `color_insert` (no full-table scan).  Visibility
    (projection + FoV) is evaluated on the voxel table's own
    position blocks (contiguous gathers, no registry traffic); only the
    up-to-`max_render_points` visible winners pay the registry row
    gather + image sampling + Bayesian-fusion scatter.  Like the
    recent-voxel bound, the point budget bounds per-frame work —
    overflowing points are re-rendered on a later visit of their voxel."""
    K = cmap.vox.block_capacity
    slot_ok = cmap.recent_slots >= 0
    slot_idx = jnp.clip(cmap.recent_slots, 0,
                        cmap.vox_last_visit.shape[0] - 1)

    ids = vm.gather_blocks(cmap.vox.point_ids, slot_idx, K)  # (V, K)
    pts_blk = vm.gather_blocks(cmap.vox.points, slot_idx, K)  # (V, K, 3)
    cnt = jnp.where(slot_ok, cmap.vox.counts[slot_idx], 0)
    id_ok = (jnp.arange(K)[None, :] < cnt[:, None]) & (ids >= 0)
    ids = ids.reshape(-1)
    id_ok = id_ok.reshape(-1)
    pts_all = pts_blk.reshape(-1, 3)

    uv_all, z_ok, _pc = project_points(pts_all, q_cw, t_cw, intr)
    vis = id_ok & z_ok & in_fov(uv_all, cols, rows, fov_margin)

    # Compact visible winners to the render budget.
    R = max_render_points
    rank = jnp.cumsum(vis.astype(jnp.int32)) - 1
    dst = jnp.where(vis & (rank < R), rank, R)
    n_all = ids.shape[0]
    sel = jnp.zeros((R,), jnp.int32).at[dst].set(
        jnp.arange(n_all, dtype=jnp.int32), mode="drop",
        unique_indices=True)
    live = jnp.zeros((R,), bool).at[dst].set(True, mode="drop",
                                             unique_indices=True)

    registry = cmap.reg.shape[0]
    ids_c = jnp.clip(ids[sel], 0, registry - 1)
    reg_rows = cmap.reg[ids_c]                              # (R, 16) gather
    live = live & (reg_rows[:, C_VALID] > 0.5)

    pts = pts_all[sel]
    uv = uv_all[sel]
    color = image_ops.bilinear_sample(image, uv)
    depth = jnp.linalg.norm(pts - t_wc_world[None, :], axis=-1)
    return update_rgb(cmap, ids_c, color, depth, obs_time, live,
                      rows=reg_rows)


@functools.partial(jax.jit, static_argnames=(
    "max_out", "cols", "rows", "grid_px"))
def select_points_for_projection(cmap: ColorMap, q_cw: jnp.ndarray,
                                 t_cw: jnp.ndarray, t_wc_world: jnp.ndarray,
                                 intr: jnp.ndarray, obs_time, *,
                                 max_out: int,
                                 cols: int, rows: int, grid_px: int = 10,
                                 fov_margin: float = 0.005,
                                 min_depth: float = 0.1,
                                 max_depth: float = 200.0,
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                            jnp.ndarray]:
    """Candidate map points for track replenishment
    (selectPointsForProjection, rgbMapTracker.cpp:45-152): one representative
    (the newest) point per recent voxel (the `recent_slots` list from the
    latest insert), deduplicated on a `grid_px` image grid keeping the
    closest-depth point per cell.

    Returns (ids (max_out,), uv (max_out, 2), valid (max_out,))."""
    slot_idx = jnp.clip(cmap.recent_slots, 0,
                        cmap.vox_last_visit.shape[0] - 1)
    slot_ok = (cmap.recent_slots >= 0) & (cmap.vox.counts[slot_idx] > 0)
    last = jnp.maximum(cmap.vox.counts[slot_idx] - 1, 0)
    ids = cmap.vox.point_ids[
        slot_idx * cmap.vox.block_capacity + last]          # newest per voxel
    registry = cmap.reg.shape[0]
    ids_c = jnp.clip(ids, 0, registry - 1)
    reg_rows = cmap.reg[ids_c]
    ok = slot_ok & (ids >= 0) & (reg_rows[:, C_VALID] > 0.5)

    pts = reg_rows[:, C_POS]
    depth = jnp.linalg.norm(pts - t_wc_world[None, :], axis=-1)
    uv, z_ok, _ = project_points(pts, q_cw, t_cw, intr)
    ok = (ok & z_ok & in_fov(uv, cols, rows, fov_margin)
          & (depth > min_depth) & (depth < max_depth))

    # occupancy grid: keep closest depth per cell via scatter-min
    gx = jnp.round(uv[:, 0] / grid_px).astype(jnp.int32)
    gy = jnp.round(uv[:, 1] / grid_px).astype(jnp.int32)
    ncx = cols // grid_px + 2
    ncy = rows // grid_px + 2
    cell = jnp.clip(gy, 0, ncy - 1) * ncx + jnp.clip(gx, 0, ncx - 1)
    grid = jnp.full((ncx * ncy,), jnp.inf, depth.dtype)
    grid = grid.at[jnp.where(ok, cell, ncx * ncy)].min(depth, mode="drop")
    winner = ok & (grid[cell] == depth)

    # compact to max_out
    order = jnp.argsort(~winner, stable=True)[:max_out]
    out_ok = winner[order]
    return ids_c[order], uv[order], out_ok

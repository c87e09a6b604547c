"""Sweep-frame assembly ops: motion undistortion, voxel-grid subsampling.

TPU-native replacements for the reference frame pipeline
(buildFrame, lioOptimization.cpp:821-893 + utility.cpp:167-332): every op
is a fixed-shape masked array program over padded sweep tensors.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sr_livo_tpu.models.eskf import ImuStates
from sr_livo_tpu.utils import lie


def make_point_alpha(t_rel: jnp.ndarray, duration) -> jnp.ndarray:
    """Per-point alpha time in [0, 1) (makePointTimestamp,
    lioOptimization.cpp:786-819).  `t_rel` is seconds from sweep begin."""
    alpha = t_rel / jnp.maximum(duration, 1e-9)
    return jnp.clip(alpha, 0.0, 1.0 - 1e-5)


def undistort_constant(raw_pts: jnp.ndarray, t_rel: jnp.ndarray,
                       imu_states: ImuStates,
                       r_il: jnp.ndarray, t_il: jnp.ndarray) -> jnp.ndarray:
    """Constant-velocity de-skew (distortFrameByConstant, utility.cpp:203-236).

    Each LiDAR point is moved into the world frame using the slerp of the
    begin/end IMU poses of the sweep at the point's capture time.
    Returns world-frame `imu_point`s, shape (N, 3).
    """
    valid = imu_states.valid
    idx_last = jnp.maximum(jnp.sum(valid.astype(jnp.int32)) - 1, 0)
    q0, t0 = imu_states.q[0], imu_states.p[0]
    q1, t1 = imu_states.q[idx_last], imu_states.p[idx_last]
    t_end = imu_states.t[idx_last]
    alpha = jnp.clip(t_rel / jnp.maximum(t_end, 1e-9), 0.0, 1.0)

    q_a = lie.slerp(jnp.broadcast_to(q0, (raw_pts.shape[0], 4)),
                    jnp.broadcast_to(q1, (raw_pts.shape[0], 4)), alpha)
    t_a = (1.0 - alpha)[:, None] * t0 + alpha[:, None] * t1
    pts_imu = raw_pts @ r_il.T + t_il
    return lie.quat_rotate(q_a, pts_imu) + t_a


def undistort_imu(raw_pts: jnp.ndarray, t_rel: jnp.ndarray,
                  imu_states: ImuStates,
                  r_il: jnp.ndarray, t_il: jnp.ndarray) -> jnp.ndarray:
    """Full-IMU de-skew (distortFrameByImu, utility.cpp:238-312).

    Point at time t in interval [t_i, t_{i+1}) integrates from state i:
      q(t) = q_i * exp(un_gyr_{i+1} dt),  p(t) = p_i + v_i dt + 0.5 a dt^2.
    """
    ts = jnp.where(imu_states.valid, imu_states.t, jnp.inf)
    # interval index: largest i with ts[i] <= t  (points before ts[0] use 0)
    idx = jnp.searchsorted(ts, t_rel, side="right") - 1
    n_valid = jnp.sum(imu_states.valid.astype(jnp.int32))
    idx = jnp.clip(idx, 0, jnp.maximum(n_valid - 2, 0))

    q_i = imu_states.q[idx]
    p_i = imu_states.p[idx]
    v_i = imu_states.v[idx]
    un_gyr = imu_states.un_gyr[idx + 1]
    un_acc = imu_states.un_acc[idx + 1]
    dt = jnp.clip(t_rel - imu_states.t[idx], 0.0, None)

    q_pt = lie.quat_normalize(
        lie.quat_mul(q_i, lie.exp_so3_quat(un_gyr * dt[:, None])))
    p_pt = p_i + v_i * dt[:, None] + 0.5 * un_acc * (dt * dt)[:, None]
    pts_imu = raw_pts @ r_il.T + t_il
    return lie.quat_rotate(q_pt, pts_imu) + p_pt


def to_end_frame(imu_pts: jnp.ndarray, imu_states: ImuStates,
                 r_il: jnp.ndarray, t_il: jnp.ndarray) -> jnp.ndarray:
    """Re-express de-skewed world points in the end-of-sweep LiDAR frame
    (transformAllImuPoint, utility.cpp:320-332)."""
    valid = imu_states.valid
    idx_last = jnp.maximum(jnp.sum(valid.astype(jnp.int32)) - 1, 0)
    q_end, p_end = imu_states.q[idx_last], imu_states.p[idx_last]
    body = lie.quat_rotate(lie.quat_conj(q_end)[None, :], imu_pts - p_end)
    return (body - t_il) @ r_il  # == R_il^T @ (body - t_il), batched


def transform_to_world(raw_pts: jnp.ndarray, q: jnp.ndarray, t: jnp.ndarray,
                       r_il: jnp.ndarray, t_il: jnp.ndarray) -> jnp.ndarray:
    """world = R(q) (R_il raw + t_il) + t (transformPoint, utility.cpp:314)."""
    pts_imu = raw_pts @ r_il.T + t_il
    return lie.quat_rotate(jnp.broadcast_to(q, (raw_pts.shape[0], 4)),
                           pts_imu) + t


# int32 wraparound hash with HOST-scalar constants (an integer multiply by
# a closed-over device scalar is pathological on this TPU backend — see
# ops.voxel_map._P1 note); masked to 31 bits so the invalid sentinel
# (INT32_MAX) sorts after every real key.
_SP1 = np.int32(73856093)
_SP2 = np.int32(19349669)
_SP3 = np.int32(83492791)
_KEY_INVALID = np.int32(0x7FFFFFFF)


def _voxel_key(pts: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    c = jnp.trunc(pts / voxel_size).astype(jnp.int32)
    h = c[..., 0] * _SP1 + c[..., 1] * _SP2 + c[..., 2] * _SP3
    return h & np.int32(0x7FFFFFFE)


# Round-salt mixing primes for bucket_dedup_min (int32 bit patterns of
# 2654435769 and 2246822519) — decorrelate successive probe rounds.
_R1 = np.int32(-1640531527)
_R2 = np.int32(-2048144777)


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 1).bit_length()


def bucket_dedup_min(h: jnp.ndarray, pri: jnp.ndarray, valid: jnp.ndarray,
                     table_size: int = None) -> jnp.ndarray:
    """Winner mask of a key-grouped argmin, SORT-FREE: for each distinct
    key `h` among valid rows, True at the single row with the minimum
    `pri` (priorities must be unique per row — ranks/indices are).

    TPU-native mechanism (argsort is the slowest op class on TPU —
    O(N log^2 N) bitonic — and dominates the subsample stages on CPU
    too): claim rounds on a scatter-min bucket table, the same
    arbitration pattern as ops.voxel_map.insert.  Each round, every
    unresolved row probes a round-salted bucket; scatter-min elects the
    minimum key per bucket, that key's whole group resolves (its min-pri
    row flagged winner), losers re-probe next round.  At least one
    contended group resolves per round, so the loop terminates; with
    `table_size` >= 2x the distinct keys it converges in a handful of
    rounds.
    """
    n = h.shape[0]
    T = table_size or min(_next_pow2(2 * n), 1 << 21)
    idx = jnp.arange(n, dtype=jnp.int32)
    oob = T + idx

    def body(carry):
        resolved, winner, r = carry
        live = valid & ~resolved
        slot = ((h ^ (r * _R1)) * _R2) & np.int32(T - 1)
        tgt = jnp.where(live, slot, oob)
        # scatter-MIN tolerates duplicate indices (associative)
        a = jnp.full((T,), _KEY_INVALID, jnp.int32).at[tgt].min(
            h, mode="drop")
        in_grp = live & (a[slot] == h)
        b = jnp.full((T,), np.int32(0x7FFFFFFF), jnp.int32).at[
            jnp.where(in_grp, slot, oob)].min(pri, mode="drop")
        win_r = in_grp & (b[slot] == pri)
        return resolved | in_grp, winner | win_r, r + 1

    def cond(carry):
        resolved, _w, _r = carry
        return jnp.any(valid & ~resolved)

    _res, winner, _r = jax.lax.while_loop(
        cond, body, (jnp.zeros((n,), bool), jnp.zeros((n,), bool),
                     jnp.int32(0)))
    return winner


@functools.lru_cache(maxsize=8)
def subsample_perm(n: int) -> np.ndarray:
    """Deterministic pseudorandom priority permutation for
    voxel_subsample — the array-program equivalent of the reference's
    std::shuffle of the frame before subSampleFrame (buildFrame,
    lioOptimization.cpp:843).  HOST int32 constant: close it over the
    jitted program (never a device array, see LioEngine.__init__)."""
    return np.random.RandomState(0x5EED).permutation(n).astype(np.int32)


def voxel_subsample(key_pts: jnp.ndarray, valid: jnp.ndarray,
                    voxel_size: float, max_out: int,
                    payload: Tuple[jnp.ndarray, ...] = (),
                    priority: np.ndarray = None,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """Keep one point per voxel, compacted to `max_out` slots in
    PRIORITY ORDER (ascending `priority`; input index when None).

    Mirrors shuffle + subSampleFrame/gridSampling (utility.cpp:167-201,
    buildFrame:843): one representative per occupied voxel.  The
    reference SHUFFLES the frame first, so its representative is random
    and — critically — the downstream max_num_residuals cap
    (optimize.cpp:107) takes a spatially RANDOM subset of keypoints.
    Passing `priority` = subsample_perm(n) reproduces that: without it,
    scan-order output makes the residual cap keep a contiguous azimuth
    WEDGE of the sweep, which costs ~3x ATE under aggressive motion
    (round-4 regression, found vs the round-3 hash-ordered output).

    Uses a 32-bit spatial hash as the voxel identity — hash collisions
    merge two distinct voxels with probability ~N^2/2^33 per sweep
    (~1e-4 for 30k points); immaterial.

    Sort-free: winner election via bucket_dedup_min claim rounds + a
    histogram-rank compaction (the round-3 formulation paid two argsorts
    per call — the slowest op class on TPU); the sharded engine
    reproduces the same priorities globally (parallel.sharded_lio).

    Returns (points (max_out, 3), valid (max_out,), gathered payload).
    """
    n = key_pts.shape[0]
    h = jnp.where(valid, _voxel_key(key_pts, voxel_size), _KEY_INVALID)
    # representative = lowest-INPUT-index point of the voxel (stable,
    # de-skew-time-coherent); `priority` randomizes only the OUTPUT
    # ORDER (and thereby which winners survive max_out / the residual
    # cap), like the reference's shuffle randomizes its vector order
    winner = bucket_dedup_min(h, jnp.arange(n, dtype=jnp.int32), valid)
    if priority is None:
        rank = jnp.cumsum(winner.astype(jnp.int32)) - 1
    else:
        pri = jnp.asarray(priority)
        # rank in priority order via ONE histogram + cumsum (sort-free)
        oob = n + jnp.arange(n, dtype=jnp.int32)
        flags = jnp.zeros((n,), jnp.int32).at[
            jnp.where(winner, pri, oob)].set(1, mode="drop",
                                             unique_indices=True)
        prefix = jnp.cumsum(flags) - flags
        rank = prefix[pri]
    ok = winner & (rank < max_out)
    dst = jnp.where(ok, rank, max_out)          # shared OOB slot -> dropped
    src = jnp.zeros((max_out,), jnp.int32).at[dst].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True)
    out_valid = jnp.zeros((max_out,), bool).at[dst].set(
        True, mode="drop", unique_indices=True)
    out_pts = jnp.where(out_valid[:, None], key_pts[src], 0.0)
    out_payload = tuple(
        jnp.where(out_valid.reshape((-1,) + (1,) * (p.ndim - 1)), p[src],
                  jnp.zeros_like(p[src])) for p in payload)
    return out_pts, out_valid, out_payload

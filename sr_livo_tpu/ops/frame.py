"""Sweep-frame assembly ops: motion undistortion, voxel-grid subsampling.

TPU-native replacements for the reference frame pipeline
(buildFrame, lioOptimization.cpp:821-893 + utility.cpp:167-332): every op
is a fixed-shape masked array program over padded sweep tensors.
"""

from __future__ import annotations

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


def voxel_subsample(key_pts: jnp.ndarray, valid: jnp.ndarray,
                    voxel_size: float, max_out: int,
                    payload: Tuple[jnp.ndarray, ...] = (),
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    """Keep one point per voxel, compacted to `max_out` slots.

    Mirrors subSampleFrame/gridSampling (utility.cpp:167-201): one
    representative per occupied voxel (here: the lowest-index point; the
    reference picks an effectively random one after shuffling).  Uses a
    32-bit spatial hash as the voxel identity — hash collisions merge two
    distinct voxels with probability ~N^2/2^33 per sweep (≈1e-4 for 30k
    points), losing at most one representative point; immaterial.

    Returns (points (max_out, 3), valid (max_out,), gathered payload).
    """
    n = key_pts.shape[0]
    h = jnp.where(valid, _voxel_key(key_pts, voxel_size), _KEY_INVALID)
    order = jnp.argsort(h)
    h_sorted = h[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), h_sorted[1:] != h_sorted[:-1]])
    keep_sorted = first & (h_sorted != _KEY_INVALID)
    # Compact: selected indices first (stable), then truncate to max_out.
    sel_order = jnp.argsort(~keep_sorted, stable=True)
    src = order[sel_order]
    if src.shape[0] < max_out:
        src = jnp.concatenate(
            [src, jnp.zeros(max_out - src.shape[0], src.dtype)])
    src = src[:max_out]
    n_keep = jnp.sum(keep_sorted)
    out_valid = jnp.arange(max_out) < n_keep
    out_pts = jnp.where(out_valid[:, None], key_pts[src], 0.0)
    out_payload = tuple(
        jnp.where(out_valid.reshape((-1,) + (1,) * (p.ndim - 1)), p[src],
                  jnp.zeros_like(p[src])) for p in payload)
    return out_pts, out_valid, out_payload

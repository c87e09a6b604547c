"""Tests: host-map mesh helpers + loop-closure detection/verification."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr_livo_tpu.parallel import distributed as dist
from sr_livo_tpu.parallel import loop_closure as lc
from sr_livo_tpu.utils import lie

RNG = np.random.RandomState(31)


def test_host_map_mesh_single_process():
    mesh = dist.make_host_map_mesh()
    assert mesh.shape[dist.HOST_AXIS] == 1
    assert mesh.shape[dist.MAP_AXIS] == len(jax.devices())
    lo, hi = dist.shard_keyframes_by_host(16, mesh)
    assert (lo, hi) == (0, 16)


def test_find_candidates_revisit():
    # loop trajectory: comes back near the start after 50 frames
    t = np.linspace(0, 2 * np.pi, 60)
    pos = np.c_[3 * np.cos(t), 3 * np.sin(t), np.zeros_like(t)]
    cands = lc.find_candidates(pos, radius=1.0, min_gap=20)
    assert len(cands) >= 1
    i, j = cands[0]
    assert j - i >= 20
    assert np.linalg.norm(pos[i] - pos[j]) < 1.0


def test_find_candidates_no_false_positive():
    pos = np.c_[np.linspace(0, 50, 60), np.zeros(60), np.zeros(60)]
    assert lc.find_candidates(pos, radius=1.0, min_gap=10) == []


def _scan(world, pose_q, pose_t, n=800):
    """Body-frame scan of world points from a pose."""
    sel = RNG.choice(world.shape[0], n, replace=False)
    r = np.asarray(lie.quat_to_rot(jnp.asarray(pose_q, jnp.float32)))
    body = (world[sel] - pose_t) @ r
    return body.astype(np.float32)


def test_verify_closure_recovers_relative_pose():
    u = RNG.uniform(-6, 6, (8000, 2))
    world = np.concatenate([
        np.c_[u[:, 0], u[:, 1], np.zeros(8000)],
        np.c_[np.full(8000, 6.0), u[:, 0], u[:, 1] * 0.3 + 1.5],
        np.c_[u[:, 0], np.full(8000, 6.0), u[:, 1] * 0.3 + 1.5],
    ]).astype(np.float32)

    q_i = np.asarray(lie.exp_so3_quat(jnp.asarray([0, 0, 0.3], jnp.float32)))
    t_i = np.array([0.5, -0.3, 1.0], np.float32)
    q_j_true = np.asarray(lie.exp_so3_quat(jnp.asarray([0, 0, 0.5],
                                                       jnp.float32)))
    t_j_true = np.array([1.0, 0.4, 1.1], np.float32)

    scan_i = _scan(world, q_i, t_i)
    scan_j = _scan(world, q_j_true, t_j_true)

    # drifted initial guess for j (what odometry would believe)
    q_j0 = np.asarray(lie.quat_mul(
        jnp.asarray(q_j_true), lie.exp_so3_quat(
            jnp.asarray([0.02, -0.03, 0.05], jnp.float32))))
    t_j0 = t_j_true + np.array([0.25, -0.2, 0.1], np.float32)

    res = lc.verify_closure(
        jnp.asarray(scan_i), jnp.ones(len(scan_i), bool),
        jnp.asarray(scan_j), jnp.ones(len(scan_j), bool),
        jnp.asarray(q_i), jnp.asarray(t_i),
        jnp.asarray(q_j0), jnp.asarray(t_j0))

    assert float(res.fitness) > 0.7, float(res.fitness)
    # edge must match the TRUE relative pose
    q_true, t_true = lc.pg.edge_from_poses(
        jnp.asarray(q_i), jnp.asarray(t_i),
        jnp.asarray(q_j_true), jnp.asarray(t_j_true))
    assert np.linalg.norm(np.asarray(res.t_meas) - np.asarray(t_true)) < 0.03
    dq = lie.quat_mul(lie.quat_conj(q_true), res.q_meas)
    assert float(lie.angular_distance_deg(lie.quat_to_so3(dq))) < 0.5


def test_verify_closure_rejects_wrong_place():
    """Scans from unrelated places yield low fitness."""
    u = RNG.uniform(-6, 6, (6000, 2))
    world = np.c_[u[:, 0], u[:, 1], np.abs(np.sin(u[:, 0]))].astype(np.float32)
    q = np.asarray(lie.quat_identity())
    scan_i = _scan(world, q, np.array([0, 0, 1.0]))
    # j's scan from a synthetic, different surface
    fake = np.c_[u[:, 0], u[:, 1],
                 2.0 + 0.8 * np.sin(3 * u[:, 1])].astype(np.float32)
    scan_j = _scan(fake, q, np.array([0, 0, 1.0]))
    res = lc.verify_closure(
        jnp.asarray(scan_i), jnp.ones(len(scan_i), bool),
        jnp.asarray(scan_j), jnp.ones(len(scan_j), bool),
        jnp.asarray(q), jnp.zeros(3, jnp.float32) + jnp.asarray([0, 0, 1.0], jnp.float32),
        jnp.asarray(q), jnp.asarray([0, 0, 1.0], jnp.float32))
    assert float(res.fitness) < 0.6

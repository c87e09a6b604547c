"""Distributed windowed bundle adjustment over keyframes.

A capability beyond the reference (BASELINE.json north star): a sliding
window of keyframe poses is jointly refined against the voxel map with
point-to-plane factors plus inter-keyframe odometry priors.  The
normal-equation assembly is keyframe-parallel: with the window sharded
over the device mesh, each device reduces the 6x6 blocks of its
keyframes and a `psum` assembles the global banded system — a
Schur-complement-style reduction over ICI — which every device solves
redundantly (6K x 6K is tiny).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sr_livo_tpu.ops import neighborhood as nb_ops
from sr_livo_tpu.ops import voxel_map as vm
from sr_livo_tpu.parallel import routing
from sr_livo_tpu.parallel.mesh import MAP_AXIS
from sr_livo_tpu.utils import lie


class KeyframeWindow(NamedTuple):
    q: jnp.ndarray          # (K, 4) world_from_body
    t: jnp.ndarray          # (K, 3)
    points: jnp.ndarray     # (K, N, 3) body-frame keypoints
    pt_valid: jnp.ndarray   # (K, N) bool
    kf_valid: jnp.ndarray   # (K,) bool


def _plane_residual_blocks(voxel_map, q, t, pts, valid, *, voxel_size,
                           max_neighbors, min_neighbors, max_probe,
                           max_dist):
    """Per-keyframe point-to-plane GN blocks: (H (6,6), b (6,), n, loss)."""
    n = pts.shape[0]
    world = lie.quat_rotate(jnp.broadcast_to(q, (n, 4)), pts) + t
    neighbors, nb_ok, _ = vm.knn(voxel_map, world, voxel_size=voxel_size,
                                 max_neighbors=max_neighbors,
                                 max_probe=max_probe, nb_voxels=1)
    n_found = jnp.sum(nb_ok, axis=1).astype(jnp.int32)
    enough = n_found >= min_neighbors
    normal, a2d, _ = nb_ops.neighborhood_distribution(neighbors, n_found)
    closest = neighbors[:, 0, :]
    dist = jnp.sum(normal * (world - closest), axis=-1)
    w = jnp.where(valid & enough & (jnp.abs(dist) < max_dist),
                  a2d * a2d, 0.0)
    # d dist / d [dtheta, dt] with right-perturbation on (q, t):
    # world = R (p) + t ; d world = -R [p]x dtheta + dt
    r_w = lie.quat_to_rot(q)
    j_rot = -jnp.einsum("ni,ij,njk->nk", normal, r_w, lie.skew(pts))
    j = jnp.concatenate([j_rot, jnp.broadcast_to(normal, (n, 3))], axis=-1)
    jw = j * w[:, None]
    h = jw.T @ j
    b = jw.T @ dist
    loss = jnp.sum(w * dist * dist)
    return h, b, jnp.sum(w > 0), loss


def _assemble_and_solve(h_blocks, b_blocks, q, t, q_odo, t_odo, kf_valid,
                        prior_rot_w, prior_t_w, damping):
    """Banded GN solve: per-keyframe map blocks + consecutive odometry
    priors.  First keyframe is gauge-fixed.  Returns (dx (K, 6))."""
    K = h_blocks.shape[0]
    dim = 6 * K
    H = jnp.zeros((dim, dim), h_blocks.dtype)
    b = jnp.zeros((dim,), h_blocks.dtype)

    def put_block(H, b, k, hb, bb):
        i = 6 * k
        H = jax.lax.dynamic_update_slice(H, hb, (i, i))
        b = jax.lax.dynamic_update_slice(b, bb, (i,))
        return H, b

    for k in range(K):
        H, b = put_block(H, b, k, h_blocks[k], b_blocks[k])

    # odometry priors between consecutive keyframes:
    # r_rot = log(R_meas^T R_i^T R_j),  r_t = (t_j - t_i) - t_meas_world
    for k in range(K - 1):
        q_i, q_j = q[k], q[k + 1]
        r_rel = lie.quat_to_rot(lie.quat_mul(lie.quat_conj(q_i), q_j))
        r_meas = lie.quat_to_rot(q_odo[k])
        r_rot = lie.log_so3(r_meas.T @ r_rel)
        r_t = (t[k + 1] - t[k]) - lie.quat_rotate(q_i, t_odo[k])
        # Jacobians (first order): d r_rot/d th_j = I, d r_rot/d th_i = -R_rel^T
        # d r_t/d t_j = I, d r_t/d t_i = -I, d r_t/d th_i = R_i [t_odo]x
        r_i = lie.quat_to_rot(q_i)
        Ji = jnp.zeros((6, 6))
        Jj = jnp.zeros((6, 6))
        Ji = Ji.at[0:3, 0:3].set(-r_rel.T * prior_rot_w)
        Jj = Jj.at[0:3, 0:3].set(jnp.eye(3) * prior_rot_w)
        Ji = Ji.at[3:6, 3:6].set(-jnp.eye(3) * prior_t_w)
        Ji = Ji.at[3:6, 0:3].set(r_i @ lie.skew(t_odo[k]) * prior_t_w)
        Jj = Jj.at[3:6, 3:6].set(jnp.eye(3) * prior_t_w)
        r6 = jnp.concatenate([r_rot * prior_rot_w, r_t * prior_t_w])
        i, j = 6 * k, 6 * (k + 1)
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (i, i), (6, 6)) + Ji.T @ Ji, (i, i))
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (j, j), (6, 6)) + Jj.T @ Jj, (j, j))
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (i, j), (6, 6)) + Ji.T @ Jj, (i, j))
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (j, i), (6, 6)) + Jj.T @ Ji, (j, i))
        b = jax.lax.dynamic_update_slice(
            b, jax.lax.dynamic_slice(b, (i,), (6,)) + Ji.T @ r6, (i,))
        b = jax.lax.dynamic_update_slice(
            b, jax.lax.dynamic_slice(b, (j,), (6,)) + Jj.T @ r6, (j,))

    # gauge fix: clamp keyframe 0
    big = 1e8
    H = H.at[0:6, 0:6].add(jnp.eye(6) * big)
    H = H + jnp.eye(dim) * damping
    dx = -jnp.linalg.solve(H, b)
    dx = dx.reshape(K, 6)
    return jnp.where(kf_valid[:, None], dx, 0.0)


def _apply(q, t, dx):
    q_new = lie.quat_normalize(lie.quat_mul(q, lie.exp_so3_quat(dx[:, 0:3])))
    t_new = t + dx[:, 3:6]
    return q_new, t_new


@functools.partial(jax.jit, static_argnames=(
    "voxel_size", "max_neighbors", "min_neighbors", "max_probe",
    "max_dist", "iters"))
def windowed_ba(voxel_map: vm.VoxelMap, window: KeyframeWindow,
                q_odo: jnp.ndarray, t_odo: jnp.ndarray, *,
                voxel_size: float, max_neighbors: int = 20,
                min_neighbors: int = 8, max_probe: int = 16,
                max_dist: float = 0.5, iters: int = 3,
                prior_rot_w: float = 100.0, prior_t_w: float = 100.0,
                damping: float = 1e-3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-device windowed BA.  Returns refined (q (K,4), t (K,3))."""

    def gn_iter(_i, carry):
        q, t = carry
        # one batched program over the window (vmap over K), not a
        # Python-unrolled keyframe loop — K copies of the kNN gather
        # pipeline compile K times slower and schedule serially
        hs, bs = jax.vmap(
            lambda qk, tk, pk, vk: _plane_residual_blocks(
                voxel_map, qk, tk, pk, vk,
                voxel_size=voxel_size, max_neighbors=max_neighbors,
                min_neighbors=min_neighbors, max_probe=max_probe,
                max_dist=max_dist)[:2]
        )(q, t, window.points, window.pt_valid)
        dx = _assemble_and_solve(hs, bs, q, t,
                                 q_odo, t_odo, window.kf_valid,
                                 prior_rot_w, prior_t_w, damping)
        return _apply(q, t, dx)

    q, t = jax.lax.fori_loop(0, iters, gn_iter, (window.q, window.t))
    return q, t


def make_sharded_windowed_ba(mesh: Mesh, n_keyframes: int, *,
                             voxel_size: float, max_neighbors: int = 20,
                             min_neighbors: int = 8, max_probe: int = 16,
                             max_dist: float = 0.5, iters: int = 3,
                             prior_rot_w: float = 100.0,
                             prior_t_w: float = 100.0,
                             damping: float = 1e-3,
                             block_bits: int = 4,
                             route_slack: float = 4.0):
    """Sharded windowed BA: keyframes AND map blocks partitioned over the
    mesh, OWNER-ROUTED like the per-sweep LIO path (no candidate
    all_gather): the voxel map must be the ShardedLioEngine layout
    (block-owner sub-table per device WITH voxel halos); every keyframe
    point is routed to its center-block owner (one all_to_all per GN
    iteration), which finds the whole kNN neighborhood in its LOCAL table
    and scatter-adds the point's 6x6/6 normal-equation contribution into
    per-keyframe blocks.  One psum assembles the global banded system,
    which every device solves redundantly (6K x 6K is tiny).

    `block_bits` MUST match the engine's cfg.shapes.map_block_bits (block
    ownership is a function of it); `route_slack` sizes the static
    per-destination routing budgets against spatial density imbalance
    (rows beyond budget are dropped for that iteration — the same
    degradation contract as the LIO router: dropped rows are COUNTED,
    never silent; the returned overflow is the psum over shards and GN
    iterations, asserted zero in the parity test).

    Returns a jitted fn(map, window, q_odo, t_odo) ->
    (q (K,4), t (K,3), route_overflow int32).
    """
    n_dev = mesh.devices.size
    assert n_keyframes % n_dev == 0
    k_local = n_keyframes // n_dev

    from sr_livo_tpu.parallel.sharded_lio import shard_of

    def body(local_map: vm.VoxelMap, window: KeyframeWindow,
             q_odo, t_odo):
        me = jax.lax.axis_index(MAP_AXIS)
        K, N = window.points.shape[0], window.points.shape[1]
        total = K * N
        # static routing budgets (shapes are concrete at trace time)
        B = min(total, routing.rup(
            int(total / n_dev / n_dev * route_slack) + 32))
        W = min(total, routing.rup(
            int(total / n_dev * route_slack) + 64))

        # this device's keyframe slice, flattened to rows
        pts_l = jax.lax.dynamic_slice_in_dim(
            window.points, me * k_local, k_local, axis=0
        ).reshape(k_local * N, 3)
        val_l = jax.lax.dynamic_slice_in_dim(
            window.pt_valid, me * k_local, k_local, axis=0
        ).reshape(k_local * N)
        kf_l = (me * np.int32(k_local)
                + jnp.repeat(jnp.arange(k_local, dtype=jnp.int32), N))

        def gn_iter(_i, carry):
            q, t, ovf = carry
            # route rows to the center-block owner of their CURRENT world
            # position (poses move between iterations)
            world_l = lie.quat_rotate(q[kf_l], pts_l) + t[kf_l]
            dest = shard_of(vm.voxel_coords(world_l, voxel_size), n_dev,
                            block_bits)
            rows = routing.pack_cols(pts_l, kf_l)
            buf, bval, d = routing.pack_for_exchange(
                dest, val_l, rows, n_dev, B)
            ovf += d
            rcv, rval = routing.exchange(buf, bval, MAP_AXIS)
            qrows, qval, d2 = routing.compact(rcv, rval, W)
            ovf += d2
            body_pts = qrows[:, 0:3]
            kf_q = jnp.clip(routing.unpack_col_i32(qrows, 3), 0, K - 1)

            world = lie.quat_rotate(q[kf_q], body_pts) + t[kf_q]
            neighbors, nb_ok, _ = vm.knn(
                local_map, world, voxel_size=voxel_size,
                max_neighbors=max_neighbors, max_probe=max_probe,
                nb_voxels=1)
            n_found = jnp.sum(nb_ok, axis=1).astype(jnp.int32)
            enough = n_found >= min_neighbors
            normal, a2d, _ = nb_ops.neighborhood_distribution(
                neighbors, n_found)
            closest = neighbors[:, 0, :]
            dist = jnp.sum(normal * (world - closest), axis=-1)
            w = jnp.where(qval & enough & (jnp.abs(dist) < max_dist),
                          a2d * a2d, 0.0)
            r_q = lie.quat_to_rot(q[kf_q])
            j_rot = -jnp.einsum("ni,nij,njk->nk", normal, r_q,
                                lie.skew(body_pts))
            j = jnp.concatenate([j_rot, normal], axis=-1)    # (W, 6)
            jw = j * w[:, None]
            hb = jnp.einsum("wi,wj->wij", jw, j)             # (W, 6, 6)
            bb = jw * dist[:, None]                          # (W, 6)
            kf_tgt = jnp.where(w > 0, kf_q, K)
            h_all = jnp.zeros((K, 6, 6), jw.dtype).at[kf_tgt].add(
                hb, mode="drop")
            b_all = jnp.zeros((K, 6), jw.dtype).at[kf_tgt].add(
                bb, mode="drop")
            h_all = jax.lax.psum(h_all, MAP_AXIS)
            b_all = jax.lax.psum(b_all, MAP_AXIS)
            dx = _assemble_and_solve(h_all, b_all, q, t, q_odo, t_odo,
                                     window.kf_valid, prior_rot_w,
                                     prior_t_w, damping)
            q, t = _apply(q, t, dx)
            return q, t, ovf

        q, t, ovf = jax.lax.fori_loop(
            0, iters, gn_iter, (window.q, window.t, jnp.int32(0)))
        return q, t, jax.lax.psum(ovf, MAP_AXIS)

    map_spec = vm.VoxelMap(keys=P(MAP_AXIS), sig=P(MAP_AXIS),
                           points=P(MAP_AXIS),
                           counts=P(MAP_AXIS), point_ids=P(MAP_AXIS))
    win_spec = KeyframeWindow(q=P(), t=P(), points=P(), pt_valid=P(),
                              kf_valid=P())
    fn = shard_map(body, mesh=mesh,
                   in_specs=(map_spec, win_spec, P(), P()),
                   out_specs=(P(), P(), P()), check_vma=False)
    return jax.jit(fn)

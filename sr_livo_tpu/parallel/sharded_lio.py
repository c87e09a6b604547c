"""Multi-chip LIO: voxel-map blocks sharded across the device mesh.

The distributed dimension the reference lacks (SURVEY §2 checklist): the
voxel-hash map is partitioned into per-device sub-tables routed by
`hash(voxel) % n_shards`; kNN association fans out to every shard and
merges candidates with an `all_gather` + top-k; the ESIKF normal-equation
blocks (H^T H, H^T h) are reduced with `psum` — a Schur-complement-style
reduction over ICI.  Implemented with `shard_map` over a 1-D mesh, so the
same ops code (ops.voxel_map, ops.neighborhood) runs per shard.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sr_livo_tpu.config import LivoConfig
from sr_livo_tpu.models import eskf as eskf_mod
from sr_livo_tpu.models import lio as lio_mod
from sr_livo_tpu.models.eskf import EskfState
from sr_livo_tpu.models.odometry import SweepInput, SweepOutput
from sr_livo_tpu.ops import frame as frame_ops
from sr_livo_tpu.ops import neighborhood as nb_ops
from sr_livo_tpu.ops import voxel_map as vm
from sr_livo_tpu.parallel.mesh import MAP_AXIS
from sr_livo_tpu.utils import lie


def shard_of(coords: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    """Owning shard of a voxel: high bits of the spatial hash (the low bits
    index within the shard's table)."""
    # int32 wraparound arithmetic with host-scalar constants, bit-identical
    # to the uint32 modular hash (an integer multiply by a closed-over
    # device scalar is pathological on this TPU backend — see
    # ops.voxel_map._P1 note).
    c = coords
    h = (c[..., 0] * np.int32(73856093) + c[..., 1] * np.int32(19349669)
         + c[..., 2] * np.int32(83492791))
    # use an independent bit mix for the shard id so shard routing is not
    # correlated with the in-shard slot index
    h2 = (h ^ jax.lax.shift_right_logical(h, 16)) * np.int32(0x45D9F3B)
    # logical >>8 of the 32-bit pattern is non-negative (< 2^24)
    return jax.lax.shift_right_logical(h2, 8) % n_shards


def _sharded_knn(local_map: vm.VoxelMap, queries: jnp.ndarray, *,
                 voxel_size: float, max_neighbors: int, max_probe: int,
                 nb_voxels: int, threshold_capacity) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """kNN across all shards: local search + all_gather + top-k merge."""
    nb_l, ok_l, d_l = vm.knn(local_map, queries, voxel_size=voxel_size,
                             max_neighbors=max_neighbors, max_probe=max_probe,
                             nb_voxels=nb_voxels,
                             threshold_capacity=threshold_capacity)
    # (n, Q, k, ...) gathered candidate sets
    nb_all = jax.lax.all_gather(nb_l, MAP_AXIS)
    ok_all = jax.lax.all_gather(ok_l, MAP_AXIS)
    d_all = jax.lax.all_gather(d_l, MAP_AXIS)
    n, q, k, _ = nb_all.shape
    nb_all = nb_all.transpose(1, 0, 2, 3).reshape(q, n * k, 3)
    ok_all = ok_all.transpose(1, 0, 2).reshape(q, n * k)
    d_all = d_all.transpose(1, 0, 2).reshape(q, n * k)
    d_all = jnp.where(ok_all, d_all, jnp.inf)
    neg, idx = jax.lax.top_k(-d_all, max_neighbors)
    nb = jnp.take_along_axis(nb_all, idx[..., None], axis=1)
    ok = jnp.take_along_axis(ok_all, idx, axis=1)
    dist = jnp.where(ok, -neg, 0.0)
    return nb, ok, dist


def _sharded_associate(local_map, world, keypts_valid, location,
                       threshold_capacity, *, icp, max_probe, nb_voxels,
                       n_shards):
    """Distributed association: kNN merged across shards, then each shard
    fits plane normals (PCA) for its keypoint slice.  Returns the
    shard-sliced association tuple consumed by `_blocks_from_assoc`."""
    nk = world.shape[0]
    me = jax.lax.axis_index(MAP_AXIS)
    neighbors, nb_ok, _ = _sharded_knn(
        local_map, world, voxel_size=icp.size_voxel_map,
        max_neighbors=icp.max_number_neighbors, max_probe=max_probe,
        nb_voxels=nb_voxels, threshold_capacity=threshold_capacity)
    qs = nk // n_shards
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, me * qs, qs, axis=0)
    nb_s, ok_s = sl(neighbors), sl(nb_ok)
    loc_s, val_s = sl(location), sl(keypts_valid)
    n_found = jnp.sum(ok_s, axis=1).astype(jnp.int32)
    normal0, a2d, _ = nb_ops.neighborhood_distribution(nb_s, n_found)
    return normal0, a2d, nb_s[:, 0, :], n_found, loc_s, val_s


def _blocks_from_assoc(assoc, q, t, last_trans, *, icp, n_shards):
    """Per-iteration normal-equation blocks from a fixed association;
    psum yields the global H^T H / H^T h (Schur-style reduction)."""
    normal0, a2d, closest, n_found, loc_s, val_s = assoc
    world_s = lie.quat_rotate(
        jnp.broadcast_to(q, (loc_s.shape[0], 4)), loc_s) + t
    lam_sum = abs(icp.weight_alpha) + abs(icp.weight_neighborhood)
    h_x, h, good = lio_mod._plane_rows_from_assoc(
        normal0, a2d, closest, n_found, world_s, loc_s,
        lie.quat_to_rot(q), last_trans, val_s,
        lam_w=abs(icp.weight_alpha) / lam_sum,
        lam_nb=abs(icp.weight_neighborhood) / lam_sum,
        power_planarity=icp.power_planarity,
        max_dist=icp.max_dist_to_plane_icp,
        min_neighbors=icp.min_number_neighbors)
    if icp.max_num_residuals > 0:
        # GLOBAL keypoint-order prefix cap (optimize.cpp:107): shard slices
        # are contiguous in keypoint order, so the global prefix rank of a
        # row is (sum of good counts on lower-ranked shards) + local
        # prefix; one scalar all_gather recovers the offsets.  Bit-matches
        # the single-chip cap for any shard count.
        prefix = jnp.cumsum(good.astype(jnp.int32))
        totals = jax.lax.all_gather(prefix[-1], MAP_AXIS)       # (n,)
        me = jax.lax.axis_index(MAP_AXIS)
        offset = jnp.sum(jnp.where(
            jnp.arange(n_shards, dtype=jnp.int32) < me, totals, 0))
        good = good & (offset + prefix <= icp.max_num_residuals)
        h_x = jnp.where(good[:, None], h_x, 0.0)
        h = jnp.where(good, h, 0.0)
    hth = jax.lax.psum(h_x.T @ h_x, MAP_AXIS)
    hth_h = jax.lax.psum(h_x.T @ h, MAP_AXIS)
    num = jax.lax.psum(jnp.sum(good).astype(jnp.int32), MAP_AXIS)
    return hth, hth_h, num


def _sharded_iekf(state, local_map, keypts_raw, keypts_valid, last_trans,
                  r_il, t_il, threshold_capacity, *, icp, max_probe,
                  nb_voxels, max_iters, laser_point_cov, n_shards,
                  cache_association=False):
    pred = state
    nk = keypts_raw.shape[0]
    location = keypts_raw @ r_il.T + t_il

    if cache_association:
        world0 = lie.quat_rotate(
            jnp.broadcast_to(state.q, (nk, 4)), location) + state.p
        assoc0 = _sharded_associate(
            local_map, world0, keypts_valid, location, threshold_capacity,
            icp=icp, max_probe=max_probe, nb_voxels=nb_voxels,
            n_shards=n_shards)

    def blocks(s):
        if cache_association:
            assoc = assoc0
        else:
            world = lie.quat_rotate(
                jnp.broadcast_to(s.q, (nk, 4)), location) + s.p
            assoc = _sharded_associate(
                local_map, world, keypts_valid, location,
                threshold_capacity, icp=icp, max_probe=max_probe,
                nb_voxels=nb_voxels, n_shards=n_shards)
        return _blocks_from_assoc(assoc, s.q, s.p, last_trans, icp=icp,
                                  n_shards=n_shards)

    def body(carry):
        s, it, _conv, _ok, _n, cov_final = carry
        hth, hth_h, num = blocks(s)
        enough = num >= icp.min_number_neighbors

        d_x_cur, d_so3, so3_dg, b_x_pred = lio_mod._error_vs_prediction(s, pred)
        j_old = lio_mod._reset_jacobian(d_so3, so3_dg, b_x_pred)
        d_x_new = j_old @ d_x_cur
        cov = j_old @ state.cov @ j_old.T

        temp = jnp.linalg.inv(cov / laser_point_cov)
        temp = temp.at[0:6, 0:6].add(hth)
        temp_inv = jnp.linalg.inv(temp)
        k_h = temp_inv[:, 0:6] @ hth_h
        k_x = jnp.zeros((17, 17), cov.dtype).at[:, 0:6].set(
            temp_inv[:, 0:6] @ hth)
        d_x = -k_h + (k_x - jnp.eye(17, dtype=cov.dtype)) @ d_x_new

        diverged = (jnp.linalg.norm(d_x[0:3]) > 100.0) | (
            lie.angular_distance_deg(d_x[3:6]) > 100.0)
        apply = enough & ~diverged
        g_before = s.g
        s_new = eskf_mod.observe(s, jnp.where(apply, d_x, 0.0))
        converged = ((jnp.linalg.norm(d_x[0:3]) < icp.threshold_translation_norm)
                     & (lie.angular_distance_deg(d_x[3:6])
                        < icp.threshold_orientation_norm) & apply)
        b_x_before = lie.s2_bx(g_before)
        j_new = lio_mod._reset_jacobian(d_x[3:6], b_x_before @ d_x[15:17],
                                        b_x_before)
        cov_final_new = j_new @ (cov - k_x @ cov) @ j_new.T
        return (s_new, it + 1, converged, enough, num,
                jnp.where(apply, cov_final_new, cov_final))

    def cond(carry):
        _s, it, conv, ok, _n, _cf = carry
        return (it < max_iters + 1) & ~conv & ok

    init = (state, jnp.int32(0), jnp.asarray(False), jnp.asarray(True),
            jnp.int32(0), state.cov)
    s_out, iters, _conv, ok, n_res, cov_final = jax.lax.while_loop(
        cond, body, init)
    s_out = s_out._replace(cov=jnp.where(ok, cov_final, state.cov))
    s_out = jax.tree_util.tree_map(
        lambda new, old: jnp.where(ok, new, old), s_out, state)
    return s_out, lio_mod.IekfSummary(success=ok, num_residuals=n_res,
                                      iterations=iters)


class ShardedLioEngine:
    """Per-sweep LIO step with the map sharded over `mesh` (1-D)."""

    def __init__(self, cfg: LivoConfig, mesh: Mesh, dtype=jnp.float32):
        self.cfg = cfg
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        self.dtype = dtype
        sh = cfg.shapes
        assert sh.map_capacity % self.n_shards == 0
        assert sh.max_keypoints % self.n_shards == 0
        self.local_capacity = sh.map_capacity // self.n_shards
        # HOST numpy, built without touching the device: closed over by
        # the jitted step — a closed-over device array forces a
        # pathological D2H constant fetch at lowering time on this TPU
        # backend (see models.odometry.LioEngine.__init__).
        np_dtype = np.dtype(dtype)
        self.noise = eskf_mod.noise_diag_np(
            cfg.imu_options.acc_cov, cfg.imu_options.gyr_cov,
            cfg.imu_options.b_acc_cov, cfg.imu_options.b_gyr_cov, np_dtype)
        self.r_il = np.asarray(cfg.extrinsics.R_imu_lidar(), np_dtype)
        self.t_il = np.asarray(cfg.extrinsics.t_imu_lidar(), np_dtype)

        map_spec = vm.VoxelMap(keys=P(MAP_AXIS), sig=P(MAP_AXIS),
                               points=P(MAP_AXIS),
                               counts=P(MAP_AXIS), point_ids=P(MAP_AXIS))
        rep = jax.tree_util.tree_map(lambda _: P(), SweepInput(
            *([0] * len(SweepInput._fields))))
        state_spec = jax.tree_util.tree_map(
            lambda _: P(), eskf_mod.init_state())
        out_spec = SweepOutput(
            state=state_spec, voxel_map=map_spec,
            summary=lio_mod.IekfSummary(P(), P(), P()),
            frame_pts_world=P(), frame_valid=P(), inserted=P(),
            record=P())

        self._steps = {}
        for phase in ("init", "steady"):
            fn = functools.partial(self._sweep_core, phase=phase)
            sm = shard_map(fn, mesh=mesh,
                           in_specs=(state_spec, map_spec, rep),
                           out_specs=out_spec, check_vma=False)
            self._steps[phase] = jax.jit(sm, donate_argnums=(1,))

    def init_state(self) -> EskfState:
        return eskf_mod.init_state(self.cfg.gravity_acc, self.dtype)

    def make_map(self) -> vm.VoxelMap:
        """Sharded map: n_shards independent sub-tables, leading dim
        concatenated and laid out with one shard per device."""
        sh = self.cfg.shapes
        m = vm.make_map(sh.map_capacity, sh.map_voxel_points, self.dtype)
        shard = NamedSharding(self.mesh, P(MAP_AXIS))
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, shard), m)

    def _sweep_core(self, state: EskfState, local_map: vm.VoxelMap,
                    sweep: SweepInput, *, phase: str) -> SweepOutput:
        cfg = self.cfg
        icp = cfg.icp
        odo = cfg.odometry_options
        sh = cfg.shapes
        is_init = phase == "init"
        sample_voxel = (odo.init_sample_voxel_size if is_init
                        else odo.sample_voxel_size)
        sub_voxel = odo.init_voxel_size if is_init else odo.voxel_size
        nb_voxels = 2 if is_init else icp.voxel_neighborhood
        max_iters = max(15, icp.num_iters_icp) if is_init else icp.num_iters_icp
        last_trans = state.p

        # Replicated front half (identical on every device).
        pre = state
        state_pred, scan_states = eskf_mod.predict_sweep(
            state, self.noise, sweep.imu_t, sweep.imu_dt, sweep.imu_acc,
            sweep.imu_gyr, sweep.imu_valid)
        _prepend = lambda x0, xs: jnp.concatenate([x0[None], xs], axis=0)
        imu_states = eskf_mod.ImuStates(
            t=_prepend(jnp.zeros((), sweep.imu_t.dtype), sweep.imu_t),
            un_acc=_prepend(lie.quat_to_rot(pre.q) @ (pre.acc_0 - pre.ba),
                            scan_states.un_acc),
            un_gyr=_prepend(pre.gyr_0 - pre.bg, scan_states.un_gyr),
            p=_prepend(pre.p, scan_states.p),
            q=_prepend(pre.q, scan_states.q),
            v=_prepend(pre.v, scan_states.v),
            valid=_prepend(jnp.asarray(True), scan_states.valid))
        # Motion compensation honors the configured profile exactly like
        # the single-chip engine (odometry._sweep_core).
        from sr_livo_tpu.config import (MOTION_COMP_CONSTANT_VELOCITY,
                                        MOTION_COMP_IMU)
        if odo.motion_compensation == MOTION_COMP_IMU:
            imu_pts = frame_ops.undistort_imu(
                sweep.raw_pts, sweep.t_rel, imu_states, self.r_il, self.t_il)
        elif odo.motion_compensation == MOTION_COMP_CONSTANT_VELOCITY:
            imu_pts = frame_ops.undistort_constant(
                sweep.raw_pts, sweep.t_rel, imu_states, self.r_il, self.t_il)
        else:
            imu_pts = lie.quat_rotate(
                jnp.broadcast_to(state_pred.q, (sweep.raw_pts.shape[0], 4)),
                sweep.raw_pts @ self.r_il.T + self.t_il) + state_pred.p
        raw_deskew = frame_ops.to_end_frame(imu_pts, imu_states,
                                            self.r_il, self.t_il)
        frame_raw, frame_valid, _ = frame_ops.voxel_subsample(
            raw_deskew, sweep.pt_valid, sub_voxel, sh.max_frame_points)
        key_raw, key_valid, _ = frame_ops.voxel_subsample(
            frame_raw, frame_valid, sample_voxel, sh.max_keypoints)

        # Distributed ESIKF.
        state_upd, summary = _sharded_iekf(
            state_pred, local_map, key_raw, key_valid, last_trans,
            self.r_il, self.t_il, sweep.threshold_capacity,
            icp=icp, max_probe=sh.map_max_probe, nb_voxels=nb_voxels,
            max_iters=max_iters, laser_point_cov=cfg.laser_point_cov,
            n_shards=self.n_shards,
            cache_association=cfg.cache_association)
        state_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(sweep.do_optimize, a, b),
            state_upd, state_pred)
        success = jnp.where(sweep.do_optimize, summary.success, True)

        # Sharded insertion: each device stores only its owned voxels.
        frame_world = frame_ops.transform_to_world(
            frame_raw, state_new.q, state_new.p, self.r_il, self.t_il)
        me = jax.lax.axis_index(MAP_AXIS)
        coords = vm.voxel_coords(frame_world, icp.size_voxel_map)
        mine = shard_of(coords, self.n_shards) == me
        local_new, inserted_l = vm.insert(
            local_map, frame_world, frame_valid & success & mine,
            icp.size_voxel_map, odo.min_distance_points, sh.map_max_probe,
            budget=sh.max_insert_points)
        inserted = jax.lax.psum(inserted_l.astype(jnp.int32), MAP_AXIS) > 0

        summary = summary._replace(success=success)
        from sr_livo_tpu.models.odometry import pack_record
        return SweepOutput(state=state_new, voxel_map=local_new,
                           summary=summary,
                           frame_pts_world=frame_world,
                           frame_valid=frame_valid, inserted=inserted,
                           record=pack_record(state_new, summary))

    def step(self, state, voxel_map, sweep: SweepInput, frame_id: int):
        phase = ("init" if frame_id < self.cfg.odometry_options.init_num_frames
                 else "steady")
        return self._steps[phase](state, voxel_map, sweep)

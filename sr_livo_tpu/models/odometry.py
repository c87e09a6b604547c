"""Full per-sweep LIO device step: IMU propagation -> undistortion ->
subsampling -> iterated ESIKF -> map insertion, as ONE jitted XLA program.

This is the TPU-native equivalent of the reference per-measurement path
run() -> process() -> buildFrame() -> stateEstimation()
(lioOptimization.cpp:1428-1584, 1037-1131, 821-893, 992-1035): all data-
dependent control flow is lax.while_loop/masking, all shapes are static,
and the host only feeds padded sweep tensors and reads back the pose.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sr_livo_tpu.config import (MOTION_COMP_CONSTANT_VELOCITY, MOTION_COMP_IMU,
                                LivoConfig)
from sr_livo_tpu.models import eskf as eskf_mod
from sr_livo_tpu.models import lio
from sr_livo_tpu.models.eskf import EskfState, ImuStates
from sr_livo_tpu.ops import frame as frame_ops
from sr_livo_tpu.ops import voxel_map as vm
from sr_livo_tpu.utils import lie


def _resolve_use_pallas(cfg: LivoConfig) -> bool:
    if cfg.use_pallas is not None:
        return cfg.use_pallas
    import jax
    return jax.default_backend() not in ("cpu",)


class SweepInput(NamedTuple):
    """Padded device tensors for one reconstructed sweep."""
    raw_pts: jnp.ndarray    # (N, 3) LiDAR-frame points
    t_rel: jnp.ndarray      # (N,) seconds from sweep begin
    pt_valid: jnp.ndarray   # (N,) bool
    imu_t: jnp.ndarray      # (S,) sample time rel. sweep begin (incl. end)
    imu_dt: jnp.ndarray     # (S,) integration step
    imu_acc: jnp.ndarray    # (S, 3)
    imu_gyr: jnp.ndarray    # (S, 3)
    imu_valid: jnp.ndarray  # (S,) bool
    do_optimize: jnp.ndarray        # () bool — false for the first frame
    threshold_capacity: jnp.ndarray  # () int32 — 1 during init frames


class WireSweep(NamedTuple):
    """Wire form of a sweep: THREE host->device transfers instead of ten
    (each transfer through the device tunnel costs ~0.15 ms of serial
    stream time regardless of size, so the sweep's many small arrays are
    packed into dense buffers host-side).

      pts_q (N, 4) int16 — xyz quantized by `meta[0]` meters/quantum,
        per-point time as a [0, WIRE_QMAX] fraction of `meta[1]`;
        alpha = -1 marks padding (runtime.measurements.pack_sweep)
      imu   (S, 9) f32   — columns [t, dt, acc(3), gyr(3), valid]
      meta  (4,)  f32    — [scale, duration, do_optimize,
                            threshold_capacity]

    Unpacked to a SweepInput on device."""
    pts_q: jnp.ndarray       # (N, 4) int16
    imu: jnp.ndarray         # (S, 9) f32
    meta: jnp.ndarray        # (4,) f32


def unpack_wire(w: WireSweep) -> SweepInput:
    from sr_livo_tpu.runtime.measurements import WIRE_QMAX
    alpha = w.pts_q[:, 3].astype(jnp.float32)
    scale, duration = w.meta[0], w.meta[1]
    return SweepInput(
        raw_pts=w.pts_q[:, :3].astype(jnp.float32) * scale,
        t_rel=jnp.maximum(alpha, 0.0) * (duration / WIRE_QMAX),
        pt_valid=alpha >= 0,
        imu_t=w.imu[:, 0], imu_dt=w.imu[:, 1], imu_acc=w.imu[:, 2:5],
        imu_gyr=w.imu[:, 5:8], imu_valid=w.imu[:, 8] > 0.5,
        do_optimize=w.meta[2] > 0.5,
        threshold_capacity=w.meta[3].astype(jnp.int32))


class SweepOutput(NamedTuple):
    state: EskfState
    voxel_map: vm.VoxelMap
    summary: lio.IekfSummary
    frame_pts_world: jnp.ndarray   # (F, 3) registered world points
    frame_valid: jnp.ndarray       # (F,) bool
    inserted: jnp.ndarray          # (F,) bool — stored into the map
    record: jnp.ndarray            # (19,) packed per-frame record
    #   [p(3), q(4), v(3), ba(3), bg(3), success, n_residuals, iters]
    #   — built in-program so the host appends ONE device vector per
    #   frame instead of dispatching a handful of eager concat ops
    route_overflow: jnp.ndarray    # () int32 — points dropped by the
    #   sharded engine's fixed routing/compaction budgets this sweep
    #   (always 0 on the single-chip engine; never silently truncated)


def pack_record(state: EskfState, summary: lio.IekfSummary) -> jnp.ndarray:
    return jnp.concatenate([
        state.p, state.q, state.v, state.ba, state.bg,
        jnp.stack([summary.success.astype(jnp.float32),
                   summary.num_residuals.astype(jnp.float32),
                   summary.iterations.astype(jnp.float32)])])


def _sweep_core(state: EskfState,
                voxel_map: vm.VoxelMap,
                sweep: SweepInput,
                noise: jnp.ndarray,
                r_il: jnp.ndarray, t_il: jnp.ndarray,
                cfg: LivoConfig,
                phase: str,
                prev_poses=None) -> SweepOutput:
    """phase: 'init' (frame_id < init_num_frames) or 'steady'.

    `prev_poses` = ((q1, p1), (q0, p0)) of the last two solved frames —
    only passed when initialization == INIT_CONSTANT_VELOCITY, where the
    IEKF iterate is seeded with the constant-velocity pose extrapolation
    of stateInitialization (lioOptimization.cpp:949-960):
      q_next = q1 q0^-1 q1,  t_next = t1 + q1 q0^-1 (t1 - t0)."""
    icp = cfg.icp
    odo = cfg.odometry_options
    sh = cfg.shapes
    is_init = phase == "init"
    # "steady_dense": the motion-adaptive residual-density variant
    # (LivoConfig.adaptive_keypoint_density) — identical program except
    # a finer keypoint grid, selected per sweep by the host when the
    # sweep's mean gyro rate exceeds dense_gyr_threshold.  Under fast
    # rotation the standard grid leaves the solve residual-starved
    # (measured: ~95 residuals vs the reference's ~600-residual
    # operating point, aggressive ATE 8.9 -> 3.4 cm at the dense grid).
    sample_voxel = (odo.init_sample_voxel_size if is_init
                    else cfg.dense_sample_voxel_size
                    if phase == "steady_dense"
                    else odo.sample_voxel_size)
    sub_voxel = odo.init_voxel_size if is_init else odo.voxel_size
    nb_voxels = 2 if is_init else icp.voxel_neighborhood
    max_iters = max(15, icp.num_iters_icp) if is_init else icp.num_iters_icp

    last_trans = state.p  # previous sweep's solved position

    # 1. IMU propagation over the sweep (run()'s hot loop).  The pre-sweep
    #    state is prepended as imu_states[0] (lioOptimization.cpp:1488-1501).
    pre = state
    state_pred, scan_states = eskf_mod.predict_sweep(
        state, noise, sweep.imu_t, sweep.imu_dt, sweep.imu_acc,
        sweep.imu_gyr, sweep.imu_valid)

    def _prepend(x0, xs):
        return jnp.concatenate([x0[None], xs], axis=0)

    imu_states = ImuStates(
        t=_prepend(jnp.zeros((), sweep.imu_t.dtype), sweep.imu_t),
        un_acc=_prepend(lie.quat_to_rot(pre.q) @ (pre.acc_0 - pre.ba),
                        scan_states.un_acc),
        un_gyr=_prepend(pre.gyr_0 - pre.bg, scan_states.un_gyr),
        p=_prepend(pre.p, scan_states.p),
        q=_prepend(pre.q, scan_states.q),
        v=_prepend(pre.v, scan_states.v),
        valid=_prepend(jnp.asarray(True), scan_states.valid))

    # 2. Motion undistortion to world, then to end-of-sweep LiDAR frame.
    if odo.motion_compensation == MOTION_COMP_IMU:
        imu_pts = frame_ops.undistort_imu(
            sweep.raw_pts, sweep.t_rel, imu_states, r_il, t_il)
    elif odo.motion_compensation == MOTION_COMP_CONSTANT_VELOCITY:
        imu_pts = frame_ops.undistort_constant(
            sweep.raw_pts, sweep.t_rel, imu_states, r_il, t_il)
    else:
        imu_pts = lie.quat_rotate(
            jnp.broadcast_to(state_pred.q, (sweep.raw_pts.shape[0], 4)),
            sweep.raw_pts @ r_il.T + t_il) + state_pred.p
    raw_deskew = frame_ops.to_end_frame(imu_pts, imu_states, r_il, t_il)

    # 3. Voxel-grid subsample to the frame budget (buildFrame:843-848).
    #    The shuffle-equivalent priority permutation randomizes the
    #    frame row order (and thereby the residual-cap subset) exactly
    #    like the reference's std::shuffle before subSampleFrame —
    #    scan-ordered rows make the cap keep an azimuth wedge (~3x ATE
    #    under aggressive motion; see frame_ops.voxel_subsample).
    frame_raw, frame_valid, _ = frame_ops.voxel_subsample(
        raw_deskew, sweep.pt_valid, sub_voxel, sh.max_frame_points,
        priority=frame_ops.subsample_perm(sweep.raw_pts.shape[0]))

    # 4. Grid-sample ICP keypoints (optimize, optimize.cpp:428-431).
    key_raw, key_valid, _ = frame_ops.voxel_subsample(
        frame_raw, frame_valid, sample_voxel, sh.max_keypoints)

    # 5. Iterated ESIKF measurement update.
    if prev_poses is not None:
        # With q0==q1, p0==p1 (pipeline seeds history with duplicates) this
        # degenerates to "keep the previous pose" — the reference's
        # behavior for the first frames.
        (q1, p1), (q0, p0) = prev_poses
        q_rel = lie.quat_mul(q1, lie.quat_conj(q0))
        seed_q = lie.quat_normalize(lie.quat_mul(q_rel, q1))
        seed_p = p1 + lie.quat_rotate(q_rel, p1 - p0)
    else:
        seed_q = seed_p = None
    def _update(nb):
        return lio.iekf_update(
            state_pred, voxel_map, key_raw, key_valid, last_trans,
            r_il, t_il, sweep.threshold_capacity,
            seed_q=seed_q, seed_p=seed_p,
            size_voxel_map=icp.size_voxel_map,
            nb_voxels_visited=nb,
            max_number_neighbors=icp.max_number_neighbors,
            min_number_neighbors=icp.min_number_neighbors,
            power_planarity=icp.power_planarity,
            max_dist_to_plane=icp.max_dist_to_plane_icp,
            weight_alpha=icp.weight_alpha,
            weight_neighborhood=icp.weight_neighborhood,
            max_num_residuals=icp.max_num_residuals,
            max_probe=sh.map_max_probe,
            max_iters=max_iters,
            threshold_translation_norm=icp.threshold_translation_norm,
            threshold_orientation_norm=icp.threshold_orientation_norm,
            laser_point_cov=cfg.laser_point_cov,
            use_pallas=_resolve_use_pallas(cfg),
            cache_association=cfg.cache_association,
            query_chunk=sh.query_chunk)

    state_upd, summary = _update(nb_voxels)
    if cfg.retry_wider_neighborhood:
        # Failure/weak-solve recovery (see LivoConfig.retry_wider_
        # neighborhood): re-run once over the widened neighborhood when
        # the update failed OR solved on fewer than `min_num_residuals`
        # rows — the degenerate-view regime (long-range wall viewing,
        # sparse far voxels) where a 125-voxel neighborhood multiplies
        # the usable neighbors.  This gives the otherwise reference-dead
        # min_num_residuals knob (parameters.h:42) real semantics as the
        # weakness threshold.  The branch executes only when triggered.
        strong = summary.success & (
            summary.num_residuals >= icp.min_num_residuals)
        state_upd, summary = jax.lax.cond(
            strong,
            lambda _: (state_upd, summary),
            lambda _: _update(nb_voxels + 1),
            operand=None)

    state_new = jax.tree_util.tree_map(
        lambda a, b: jnp.where(sweep.do_optimize, a, b), state_upd, state_pred)
    success = jnp.where(sweep.do_optimize, summary.success, True)

    # 6. Register the frame at the solved pose and insert into the map
    #    (addPointsToMap, lioOptimization.cpp:520-554).  Skipped when the
    #    ICP failed (stateEstimation early-returns, :1011-1014).
    frame_world = frame_ops.transform_to_world(
        frame_raw, state_new.q, state_new.p, r_il, t_il)
    insert_valid = frame_valid & success
    voxel_map_new, inserted = vm.insert(
        voxel_map, frame_world, insert_valid, icp.size_voxel_map,
        odo.min_distance_points, sh.map_max_probe,
        budget=sh.max_insert_points, gate_chunk=sh.query_chunk)

    summary = summary._replace(success=success)
    return SweepOutput(state=state_new, voxel_map=voxel_map_new,
                       summary=summary,
                       frame_pts_world=frame_world,
                       frame_valid=frame_valid, inserted=inserted,
                       record=pack_record(state_new, summary),
                       route_overflow=jnp.int32(0))


class LioEngine:
    """Compiled per-sweep LIO step factory (two phase specializations)."""

    def __init__(self, cfg: LivoConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        # HOST numpy, never device arrays, built WITHOUT touching the
        # device: these are closed over by the jitted step, and a
        # closed-over concrete DEVICE array forces a device->host fetch of
        # the constant at lowering time.  On this TPU backend the first
        # D2H transfer of a process takes tens-to-hundreds of seconds AND
        # permanently degrades blocking dispatch to a ~25 ms floor (same
        # failure class as the voxel-hash device scalars, see
        # ops.voxel_map._P1 note).  numpy constants inline cleanly.
        np_dtype = np.dtype(dtype)
        self.noise = eskf_mod.noise_diag_np(
            cfg.imu_options.acc_cov, cfg.imu_options.gyr_cov,
            cfg.imu_options.b_acc_cov, cfg.imu_options.b_gyr_cov, np_dtype)
        self.r_il = np.asarray(cfg.extrinsics.R_imu_lidar(), np_dtype)
        self.t_il = np.asarray(cfg.extrinsics.t_imu_lidar(), np_dtype)
        self._steps = {}
        for phase in ("init", "steady", "steady_dense"):
            self._steps[phase] = jax.jit(
                functools.partial(self._raw_step, phase=phase),
                donate_argnums=(1,))
        # INIT_CONSTANT_VELOCITY predictor needs the last two solved poses
        # (stateInitialization, lioOptimization.cpp:895-990)
        from sr_livo_tpu.config import INIT_CONSTANT_VELOCITY
        self.use_cv_init = (cfg.odometry_options.initialization
                            == INIT_CONSTANT_VELOCITY)

    def _raw_step(self, state, voxel_map, sweep, prev_poses=None, *, phase):
        if isinstance(sweep, WireSweep):
            sweep = unpack_wire(sweep)
        return _sweep_core(state, voxel_map, sweep, self.noise,
                           self.r_il, self.t_il, self.cfg, phase,
                           prev_poses=prev_poses)

    def init_state(self) -> EskfState:
        return eskf_mod.init_state(self.cfg.gravity_acc, self.dtype)

    def make_map(self) -> vm.VoxelMap:
        sh = self.cfg.shapes
        return vm.make_map(sh.map_capacity, sh.map_voxel_points, self.dtype)

    def step(self, state: EskfState, voxel_map: vm.VoxelMap,
             sweep: SweepInput, frame_id: int,
             prev_poses=None, gyr_rate: float = 0.0) -> SweepOutput:
        """`gyr_rate`: host-side mean |gyro| (rad/s) over the sweep's IMU
        samples; with cfg.adaptive_keypoint_density it selects the
        dense-keypoint program variant above dense_gyr_threshold."""
        if frame_id < self.cfg.odometry_options.init_num_frames:
            phase = "init"
        elif (self.cfg.adaptive_keypoint_density
                and gyr_rate > self.cfg.dense_gyr_threshold):
            phase = "steady_dense"
        else:
            phase = "steady"
        if not self.use_cv_init:
            prev_poses = None
        elif prev_poses is None:
            prev_poses = ((state.q, state.p), (state.q, state.p))
        return self._steps[phase](state, voxel_map, sweep, prev_poses)

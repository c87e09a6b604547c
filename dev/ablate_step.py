"""Ablation profile of the per-sweep LIO program: compiles truncated
variants of the full step (stop after IMU / undistort / subsample / IEKF /
full) so each stage's *in-program* cost is the delta between consecutive
variants — unlike standalone timings, this excludes dispatch overhead.

    python scripts/ablate_step.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, n=50, warmup=5):
    import jax
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from sr_livo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from sr_livo_tpu.config import LivoConfig
    from sr_livo_tpu.models.odometry import LioEngine, SweepInput
    from sr_livo_tpu.models import eskf as eskf_mod
    from sr_livo_tpu.models import lio as lio_mod
    from sr_livo_tpu.ops import frame as frame_ops
    from sr_livo_tpu.ops import voxel_map as vm
    from sr_livo_tpu.utils import lie
    from sr_livo_tpu.runtime import synthetic
    from sr_livo_tpu.runtime import measurements as meas_mod

    print("backend:", jax.default_backend())

    cfg = LivoConfig()
    cfg.odometry_options.voxel_size = 0.25
    cfg.odometry_options.sample_voxel_size = 1.0
    cfg.odometry_options.min_distance_points = 0.1
    cfg.icp.size_voxel_map = 1.0
    cfg.icp.min_number_neighbors = 12
    cfg.icp.max_num_residuals = 600
    cfg.icp.num_iters_icp = 5
    cfg.shapes.max_sweep_points = 16384
    cfg.shapes.max_frame_points = 8192
    cfg.shapes.max_keypoints = 1024
    cfg.shapes.max_imu_samples = 64
    cfg.shapes.map_capacity = 1 << 18

    sim = synthetic.simulate(duration=8.0, n_azimuth=256, n_rings=32,
                             imu_rate=200.0, seed=3)
    cutter = meas_mod.SweepCutter(cfg.sweep_interval)
    for (t, a, g) in sim.imu:
        cutter.push_imu(t, a, g)
    for c in sim.lidar_chunks:
        cutter.push_points(c)
    for (t, img) in sim.images:
        cutter.push_image(t, img)

    engine = LioEngine(cfg)
    state, vmap_ = engine.init_state(), engine.make_map()

    sweeps = []
    current = None
    while True:
        m = cutter.get()
        if m is None:
            break
        if current is None:
            current = m.time_sweep_begin
        prep = meas_mod.prepare_sweep(m, current, cfg)
        current = prep.new_current_time
        sweeps.append(SweepInput(
            raw_pts=jnp.asarray(prep.raw_pts), t_rel=jnp.asarray(prep.t_rel),
            pt_valid=jnp.asarray(prep.pt_valid),
            imu_t=jnp.asarray(prep.imu_t), imu_dt=jnp.asarray(prep.imu_dt),
            imu_acc=jnp.asarray(prep.imu_acc),
            imu_gyr=jnp.asarray(prep.imu_gyr),
            imu_valid=jnp.asarray(prep.imu_valid),
            do_optimize=jnp.asarray(True),
            threshold_capacity=jnp.int32(1)))

    for fid, sw in enumerate(sweeps[:24], start=1):
        out = engine.step(state, vmap_, sw, fid)
        state, vmap_ = out.state, out.voxel_map
    jax.block_until_ready(state.p)
    sw = sweeps[25]

    icp, odo, sh = cfg.icp, cfg.odometry_options, cfg.shapes

    def upto(stage):
        def f(s, v, w):
            pre = s
            state_pred, scan_states = eskf_mod.predict_sweep(
                s, engine.noise, w.imu_t, w.imu_dt, w.imu_acc, w.imu_gyr,
                w.imu_valid)
            if stage == "imu":
                return state_pred, scan_states

            def _prepend(x0, xs):
                return jnp.concatenate([x0[None], xs], axis=0)
            imu_states = eskf_mod.ImuStates(
                t=_prepend(jnp.zeros((), w.imu_t.dtype), w.imu_t),
                un_acc=_prepend(lie.quat_to_rot(pre.q) @ (pre.acc_0 - pre.ba),
                                scan_states.un_acc),
                un_gyr=_prepend(pre.gyr_0 - pre.bg, scan_states.un_gyr),
                p=_prepend(pre.p, scan_states.p),
                q=_prepend(pre.q, scan_states.q),
                v=_prepend(pre.v, scan_states.v),
                valid=_prepend(jnp.asarray(True), scan_states.valid))
            imu_pts = frame_ops.undistort_constant(
                w.raw_pts, w.t_rel, imu_states, engine.r_il, engine.t_il)
            raw_deskew = frame_ops.to_end_frame(
                imu_pts, imu_states, engine.r_il, engine.t_il)
            if stage == "undistort":
                return raw_deskew
            frame_raw, frame_valid, _ = frame_ops.voxel_subsample(
                raw_deskew, w.pt_valid, odo.voxel_size, sh.max_frame_points)
            key_raw, key_valid, _ = frame_ops.voxel_subsample(
                frame_raw, frame_valid, odo.sample_voxel_size,
                sh.max_keypoints)
            if stage == "subsample":
                return frame_raw, key_raw
            state_upd, summary = lio_mod.iekf_update(
                state_pred, v, key_raw, key_valid, s.p, engine.r_il,
                engine.t_il, w.threshold_capacity,
                size_voxel_map=icp.size_voxel_map,
                nb_voxels_visited=icp.voxel_neighborhood,
                max_number_neighbors=icp.max_number_neighbors,
                min_number_neighbors=icp.min_number_neighbors,
                power_planarity=icp.power_planarity,
                max_dist_to_plane=icp.max_dist_to_plane_icp,
                weight_alpha=icp.weight_alpha,
                weight_neighborhood=icp.weight_neighborhood,
                max_num_residuals=icp.max_num_residuals,
                max_probe=sh.map_max_probe,
                max_iters=icp.num_iters_icp,
                threshold_translation_norm=icp.threshold_translation_norm,
                threshold_orientation_norm=icp.threshold_orientation_norm,
                laser_point_cov=cfg.laser_point_cov,
                use_pallas=jax.default_backend() != "cpu")
            if stage == "iekf":
                return state_upd, summary
            frame_world = frame_ops.transform_to_world(
                frame_raw, state_upd.q, state_upd.p, engine.r_il, engine.t_il)
            vmap_new, inserted = vm.insert(
                v, frame_world, frame_valid & summary.success,
                icp.size_voxel_map, odo.min_distance_points, sh.map_max_probe,
                budget=sh.max_insert_points)
            return state_upd, vmap_new
        return jax.jit(f)

    prev = 0.0
    for stage in ("imu", "undistort", "subsample", "iekf", "full"):
        f = upto(stage)
        ms = timeit(lambda: f(state, vmap_, sw))
        print(f"  upto {stage:10s} {ms:8.2f} ms   (+{ms - prev:6.2f})")
        prev = ms


if __name__ == "__main__":
    main()

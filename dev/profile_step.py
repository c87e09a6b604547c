"""Profile the per-sweep LIO step and the per-frame vision step on the
available accelerator: prints a stage-by-stage latency table.

    python scripts/profile_step.py [--vision]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, n=30, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vision", action="store_true")
    args = ap.parse_args()

    from sr_livo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from sr_livo_tpu.config import LivoConfig
    from sr_livo_tpu.models.odometry import LioEngine, SweepInput
    from sr_livo_tpu.models import lio as lio_mod
    from sr_livo_tpu.ops import voxel_map as vm
    from sr_livo_tpu.ops import frame as frame_ops
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

    # full step (can't donate: we reuse vmap_)
    full = jax.jit(lambda s, v, w: engine._raw_step(s, v, w, phase="steady"))
    ms_full = timeit(lambda: full(state, vmap_, sw))
    print(f"full LIO step            {ms_full:8.2f} ms")

    # stage: IMU propagation
    from sr_livo_tpu.models import eskf as eskf_mod

    @jax.jit
    def stage_imu(s, w):
        return eskf_mod.predict_sweep(s, engine.noise, w.imu_t, w.imu_dt,
                                      w.imu_acc, w.imu_gyr, w.imu_valid)
    print(f"  imu predict_sweep      {timeit(lambda: stage_imu(state, sw)):8.2f} ms")

    # stage: undistort + subsample + keypoints (approximate: no imu states)
    icp = cfg.icp

    @jax.jit
    def stage_frame(s, w):
        pts = w.raw_pts
        frame_raw, frame_valid, _ = frame_ops.voxel_subsample(
            pts, w.pt_valid, cfg.odometry_options.voxel_size,
            cfg.shapes.max_frame_points)
        key_raw, key_valid, _ = frame_ops.voxel_subsample(
            frame_raw, frame_valid, cfg.odometry_options.sample_voxel_size,
            cfg.shapes.max_keypoints)
        return frame_raw, frame_valid, key_raw, key_valid
    out_frame = stage_frame(state, sw)
    print(f"  2x voxel_subsample     {timeit(lambda: stage_frame(state, sw)):8.2f} ms")
    frame_raw, frame_valid, key_raw, key_valid = out_frame

    # stage: one residual build (knn + plane fit)
    @jax.jit
    def stage_resid(s, v):
        return lio_mod.build_residuals(
            v, key_raw, key_valid, s.q, s.p, s.p, engine.r_il, engine.t_il,
            size_voxel_map=icp.size_voxel_map,
            nb_voxels_visited=icp.voxel_neighborhood,
            max_number_neighbors=icp.max_number_neighbors,
            min_number_neighbors=icp.min_number_neighbors,
            threshold_voxel_capacity=jnp.int32(1),
            power_planarity=icp.power_planarity,
            max_dist_to_plane=icp.max_dist_to_plane_icp,
            weight_alpha=icp.weight_alpha,
            weight_neighborhood=icp.weight_neighborhood,
            max_num_residuals=icp.max_num_residuals,
            max_probe=cfg.shapes.map_max_probe,
            use_pallas=jax.default_backend() != "cpu")
    print(f"  build_residuals (x1)   {timeit(lambda: stage_resid(state, vmap_)):8.2f} ms")

    # stage: knn only
    @jax.jit
    def stage_knn(s, v):
        world = key_raw @ engine.r_il.T + engine.t_il
        from sr_livo_tpu.utils import lie
        world = lie.quat_rotate(
            jnp.broadcast_to(s.q, (world.shape[0], 4)), world) + s.p
        return vm.knn(v, world, voxel_size=icp.size_voxel_map,
                      max_neighbors=icp.max_number_neighbors,
                      max_probe=cfg.shapes.map_max_probe,
                      nb_voxels=icp.voxel_neighborhood,
                      threshold_capacity=1)
    print(f"  knn only (x1)          {timeit(lambda: stage_knn(state, vmap_)):8.2f} ms")

    # stage: map insert
    @jax.jit
    def stage_insert(s, v):
        frame_world = frame_ops.transform_to_world(
            frame_raw, s.q, s.p, engine.r_il, engine.t_il)
        return vm.insert(v, frame_world, frame_valid, icp.size_voxel_map,
                         cfg.odometry_options.min_distance_points,
                         cfg.shapes.map_max_probe,
                         budget=cfg.shapes.max_insert_points)
    print(f"  map insert             {timeit(lambda: stage_insert(state, vmap_)):8.2f} ms")

    if args.vision:
        from sr_livo_tpu.models.vision import VisionModule
        from sr_livo_tpu.models import camera as cam_mod
        from sr_livo_tpu.ops import lk

        cfg.camera_options.image_width = 640
        cfg.camera_options.image_height = 512
        cfg.camera_options.image_scale = 0.5
        cfg.camera_options.camera_intrinsic = [
            520.0, 0.0, 320.0, 0.0, 520.0, 256.0, 0, 0, 1]
        cfg.camera_options.camera_dist_coeffs = [0.1, -0.05, 0, 0, 0]
        vmod = VisionModule(cfg)
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (512, 640, 3)).astype(np.uint8)

        rgb, gray = vmod.preprocess(img)
        ms_pre = timeit(lambda: vmod.preprocess(img)[1])
        print(f"  vision preprocess      {ms_pre:8.2f} ms")
        pyr = lk.precompute_frame(gray, vmod.lk_params.levels)
        ms_pyr = timeit(lambda: lk.precompute_frame(gray, vmod.lk_params.levels))
        print(f"  pyramid+scharr         {ms_pyr:8.2f} ms")

        # seed color map with random world points, then run _vision_step
        from sr_livo_tpu.ops import color_map as cm
        from sr_livo_tpu.models.vision import _vision_step, make_tracks
        n_seed = 20000
        pts = rng.uniform(-8, 8, (n_seed, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(0, 3, n_seed)
        vmod.insert_sweep_points(jnp.asarray(pts), jnp.ones(n_seed, bool),
                                 jnp.asarray(True), 0.1)
        q_wi = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
        t_wi = jnp.zeros(3, jnp.float32)
        vmod._init_tracks(q_wi, t_wi, 0.1)
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)

        def run_vision():
            cam, cmap_, trk, a, b = _vision_step(
                vmod.camera, vmod.color_map, vmod.tracks, pyr, pyr, rgb,
                q_wi, t_wi, jnp.asarray([0.033, 0.2], jnp.float32),
                jnp.int32(100), k1,
                lk_params=vmod.lk_params, cols=vmod.cols, rows=vmod.rows,
                track_grid=vmod.track_grid,
                max_render_points=cfg.shapes.max_render_points,
                estimate_intrinsic=True, estimate_extrinsic=True)
            vmod.color_map, vmod.tracks = cmap_, trk
            return a
        ms_vis = timeit(run_vision, n=20)
        print(f"  _vision_step (fused)   {ms_vis:8.2f} ms")
        _cs = [vmod.color_map, 0.3]

        def run_ins():
            m, _ = cm.color_insert(
                _cs[0], jnp.asarray(pts[:8192]), jnp.ones(8192, bool),
                _cs[1],
                voxel_size=cfg.map_options.size_voxel_map,
                min_distance=cfg.map_options.min_distance_points,
                max_probe=cfg.shapes.map_max_probe,
                budget=cfg.shapes.max_insert_points)
            _cs[0] = m
            _cs[1] += 0.033
            return m.count
        ms_ins = timeit(run_ins, n=20)
        print(f"  color_insert (8192)    {ms_ins:8.2f} ms")


if __name__ == "__main__":
    main()

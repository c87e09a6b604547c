"""Benchmark: reconstructed sweeps+images per second per chip.

Runs the flagship per-sweep LIO step at reference-like shapes (r3live
profile: 10 Hz sweeps, 600-residual ICP budget) in a steady-state loop on
the available accelerator and prints ONE JSON line:

    {"metric": "sweeps_per_s", "value": N, "unit": "sweeps/s",
     "vs_baseline": N / 30}

Baseline: the reference sustains 30-34 ms per sweep+image on an i7-11700
(/root/reference/README.md:21) => ~30 sweeps/s.  vs_baseline > 1 beats it.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    from sr_livo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from sr_livo_tpu.config import LivoConfig
    from sr_livo_tpu.models.odometry import LioEngine, WireSweep
    from sr_livo_tpu.runtime import synthetic
    from sr_livo_tpu.runtime import measurements as meas_mod

    cfg = LivoConfig()
    # Reference-scale budgets (config/r3live.yaml): 1.0 m map voxels,
    # 1.5 m keypoint sampling, <=600 residuals, 5 ICP iterations.
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

    # Build a realistic stream: textured room, dense spinning LiDAR.
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
        wire = meas_mod.pack_sweep(prep, m.duration)
        sweeps.append(WireSweep(
            pts_q=jnp.asarray(wire.pts_q),
            scale=jnp.float32(wire.scale),
            duration=jnp.float32(wire.duration),
            imu_t=jnp.asarray(prep.imu_t), imu_dt=jnp.asarray(prep.imu_dt),
            imu_acc=jnp.asarray(prep.imu_acc),
            imu_gyr=jnp.asarray(prep.imu_gyr),
            imu_valid=jnp.asarray(prep.imu_valid),
            do_optimize=jnp.asarray(True),
            threshold_capacity=jnp.int32(1)))

    # Warm up: compile both phases + populate the map.
    for fid, sw in enumerate(sweeps[:24], start=1):
        out = engine.step(state, vmap_, sw, fid)
        state, vmap_ = out.state, out.voxel_map
    jax.block_until_ready(state.p)

    # Steady-state timing over the remaining sweeps, cycled.
    n_timed = 60
    t0 = time.perf_counter()
    for i in range(n_timed):
        sw = sweeps[24 + (i % max(1, len(sweeps) - 24))]
        out = engine.step(state, vmap_, sw, 100 + i)
        state, vmap_ = out.state, out.voxel_map
    jax.block_until_ready(state.p)
    dt = time.perf_counter() - t0

    sweeps_per_s = n_timed / dt
    print(json.dumps({
        "metric": "sweeps_per_s",
        "value": round(sweeps_per_s, 2),
        "unit": "sweeps/s",
        "vs_baseline": round(sweeps_per_s / 30.0, 3),
    }))


if __name__ == "__main__":
    main()

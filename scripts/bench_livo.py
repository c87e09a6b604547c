"""Full-LIVO throughput: sweeps+images per second through the whole
pipeline (LIO step + color insert + vision frame on every sweep), at
reference-like shapes (r3live profile: 10 Hz image-aligned sweeps,
512x640 processed images, 600-residual ICP, <=300 tracks).

Prints per-stage timings and a final JSON line compatible with bench.py.
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


CAM = (420.0, 420.0, 320.0, 256.0)
SIZE = (512, 640)   # rows, cols


def make_cfg():
    from sr_livo_tpu.config import LivoConfig
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
    cfg.camera_options.image_width = SIZE[1]
    cfg.camera_options.image_height = SIZE[0]
    cfg.camera_options.image_scale = 1.0
    cfg.camera_options.camera_intrinsic = [
        CAM[0], 0, CAM[2], 0, CAM[1], CAM[3], 0, 0, 1]
    cfg.camera_options.camera_dist_coeffs = [0, 0, 0, 0, 0]
    cfg.extrinsics.extrinsic_R_imu_camera = [0, 0, 1, -1, 0, 0, 0, -1, 0]
    cfg.extrinsics.extrinsic_t_imu_camera = [0.0, 0.0, 0.0]
    return cfg


def main():
    from sr_livo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from sr_livo_tpu.models.vision import VisionModule
    from sr_livo_tpu.pipeline import LivoPipeline
    from sr_livo_tpu.runtime import synthetic

    cfg = make_cfg()
    t_sim0 = time.perf_counter()
    cache = os.path.join(os.path.dirname(__file__), "..",
                         ".bench_livo_sim.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        from sr_livo_tpu.runtime.synthetic import SimStream
        sim = SimStream(
            imu=[(float(r[0]), r[1:4], r[4:7]) for r in z["imu"]],
            lidar_chunks=[z[f"pts{i}"] for i in range(int(z["n_chunks"]))],
            images=[(float(t), img) for t, img in
                    zip(z["img_t"], z["imgs"])],
            gt_times=z["gt_times"], gt_pos=z["gt_pos"], gt_quat=z["gt_quat"])
    else:
        sim = synthetic.simulate(duration=10.0, n_azimuth=256, n_rings=32,
                                 imu_rate=200.0, seed=3, image_size=SIZE,
                                 camera=CAM)
        save = {"imu": np.array([[t, *a, *g] for (t, a, g) in sim.imu]),
                "n_chunks": len(sim.lidar_chunks),
                "img_t": np.array([t for (t, _) in sim.images]),
                "imgs": np.stack([im for (_, im) in sim.images]),
                "gt_times": sim.gt_times, "gt_pos": sim.gt_pos,
                "gt_quat": sim.gt_quat}
        for i, c in enumerate(sim.lidar_chunks):
            save[f"pts{i}"] = c
        np.savez(cache, **save)
    print(f"sim ready in {time.perf_counter() - t_sim0:.1f}s "
          f"({len(sim.images)} images)")

    vision = VisionModule(cfg)
    pipe = LivoPipeline(cfg, vision=vision)
    if "--sync" in sys.argv:
        from sr_livo_tpu.utils.profiling import StageTimers
        pipe.timers = StageTimers(sync=True)

    # feed everything up front (host queues; bench times processing only)
    for (t, a, g) in sim.imu:
        pipe.push_imu(t, a, g)
    for c in sim.lidar_chunks:
        pipe.push_points(c)
    for (t, img) in sim.images:
        pipe.push_image(t, img)

    # collect measurements; process warmup frames; then time steady state
    meas_all = []
    while True:
        m = pipe.cutter.get()
        if m is None:
            break
        meas_all.append(m)
    print(f"{len(meas_all)} measurements "
          f"({sum(1 for m in meas_all if m.rendering)} rendering)")

    # Warm up past IMU static init (~3 s of stream) plus enough processed
    # frames to compile every program (LIO step, color insert, preprocess,
    # pyramid precompute, vision step) and reach steady map occupancy.
    n_warm = 0
    warm_frames = 0
    for m in meas_all:
        pipe._process_measurement(m)
        n_warm += 1
        if pipe.initialized:
            warm_frames += 1
            if warm_frames >= 12:
                break
    jax.block_until_ready(pipe.state.p)
    print(f"warmed up on {n_warm} measurements "
          f"({warm_frames} processed frames)")

    pipe.timers.total.clear()
    pipe.timers.count.clear()
    timed = meas_all[n_warm:]
    t0 = time.perf_counter()
    for m in timed:
        pipe._process_measurement(m)
    jax.block_until_ready(pipe.state.p)
    dt = time.perf_counter() - t0

    per = dt / len(timed) * 1e3
    print(f"\n{len(timed)} sweeps+images in {dt:.2f}s "
          f"= {per:.1f} ms/frame = {len(timed)/dt:.1f}/s")
    print("\nstage breakdown (over timed section):")
    print(pipe.timers.summary())

    print(json.dumps({
        "metric": "sweeps_images_per_s",
        "value": round(len(timed) / dt, 2),
        "unit": "sweeps+images/s",
        "vs_baseline": round(len(timed) / dt / 30.0, 3),
    }))


if __name__ == "__main__":
    main()

"""Benchmark: FULL LIVO pipeline throughput — sweeps+images per second
per chip, through the complete per-frame path (LIO step + colored-map
insertion + image preprocessing + LK/RANSAC/ESIKF vision frame + map
rendering) at reference-like shapes (r3live profile: 10 Hz image-aligned
sweeps, 512x640 processed images, 600-residual ICP, <=300 tracks,
rendering on every sweep).

Prints a per-stage breakdown and ONE final JSON line:

    {"metric": "sweeps_images_per_s", "value": N, "unit": "sweeps+images/s",
     "vs_baseline": N / 30}

Baseline: the reference sustains 30-34 ms per sweep+image on an i7-11700
(/root/reference/README.md:21) => ~30 sweeps+images/s.  vs_baseline > 1
beats it.  Unlike round 1's bench (LIO-only), this measures the same
workload the baseline quotes.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CAM = (420.0, 420.0, 320.0, 256.0)
SIZE = (512, 640)   # rows, cols


def make_cfg():
    from sr_livo_tpu.config import LivoConfig
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
    cfg.camera_options.image_width = SIZE[1]
    cfg.camera_options.image_height = SIZE[0]
    cfg.camera_options.image_scale = 1.0
    cfg.camera_options.camera_intrinsic = [
        CAM[0], 0, CAM[2], 0, CAM[1], CAM[3], 0, 0, 1]
    cfg.camera_options.camera_dist_coeffs = [0, 0, 0, 0, 0]
    cfg.extrinsics.extrinsic_R_imu_camera = [0, 0, 1, -1, 0, 0, 0, -1, 0]
    cfg.extrinsics.extrinsic_t_imu_camera = [0.0, 0.0, 0.0]
    return cfg


def load_sim():
    """Synthetic 40 s LIVO stream (cached; images stored uint8 like a real
    camera feed).  Rendered with the XLA raycaster on the default
    backend — minutes on a TPU chip vs ~an hour of numpy on a small
    host."""
    from sr_livo_tpu.runtime import synthetic
    from sr_livo_tpu.runtime.synthetic import SimStream, SyntheticWorld
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_livo_sim_v4.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return SimStream(
            imu=[(float(r[0]), r[1:4], r[4:7]) for r in z["imu"]],
            lidar_chunks=[z[f"pts{i}"] for i in range(int(z["n_chunks"]))],
            images=[(float(t), img) for t, img in
                    zip(z["img_t"], z["imgs"])],
            gt_times=z["gt_times"], gt_pos=z["gt_pos"], gt_quat=z["gt_quat"])
    sim = synthetic.simulate(duration=40.0, n_azimuth=256, n_rings=32,
                             imu_rate=200.0, seed=3, image_size=SIZE,
                             camera=CAM, world=SyntheticWorld(use_jax=True))
    sim.images = [
        (t, np.clip(np.round(im * 255.0), 0, 255).astype(np.uint8))
        for (t, im) in sim.images]
    save = {"imu": np.array([[t, *a, *g] for (t, a, g) in sim.imu]),
            "n_chunks": len(sim.lidar_chunks),
            "img_t": np.array([t for (t, _) in sim.images]),
            "imgs": np.stack([im for (_, im) in sim.images]),
            "gt_times": sim.gt_times, "gt_pos": sim.gt_pos,
            "gt_quat": sim.gt_quat}
    for i, c in enumerate(sim.lidar_chunks):
        save[f"pts{i}"] = c
    np.savez(cache, **save)
    return sim


def main():
    from sr_livo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from sr_livo_tpu.models.vision import VisionModule
    from sr_livo_tpu.pipeline import LivoPipeline

    cfg = make_cfg()
    t0 = time.perf_counter()
    sim = load_sim()
    print(f"sim ready in {time.perf_counter() - t0:.1f}s "
          f"({len(sim.images)} images)", file=sys.stderr)

    vision = VisionModule(cfg)
    pipe = LivoPipeline(cfg, vision=vision)
    if "--sync" in sys.argv:
        from sr_livo_tpu.utils.profiling import StageTimers
        pipe.timers = StageTimers(sync=True)

    for (t, a, g) in sim.imu:
        pipe.push_imu(t, a, g)
    for c in sim.lidar_chunks:
        pipe.push_points(c)
    for (t, img) in sim.images:
        pipe.push_image(t, img)

    meas_all = []
    while True:
        m = pipe.cutter.get()
        if m is None:
            break
        meas_all.append(m)

    # Warm past IMU static init + enough frames to compile every program
    # (LIO step in BOTH phase specializations, color insert, preprocess,
    # pyramid, vision step) and reach steady map occupancy; vision compiles
    # on the 2nd rendered frame, and the steady-phase LIO program only
    # compiles once index_frame reaches init_num_frames.
    n_steady = cfg.odometry_options.init_num_frames + 2
    n_warm = 0
    warm_frames = 0
    warm_rendered = 0
    for m in meas_all:
        pipe._process_measurement(m)
        n_warm += 1
        if pipe.initialized:
            warm_frames += 1
            if m.rendering and m.image is not None:
                warm_rendered += 1
            if warm_frames >= n_steady and warm_rendered >= 3:
                break
    jax.block_until_ready(pipe.state.p)
    assert pipe.initialized, "IMU static init never completed in warm-up"
    assert warm_rendered >= 3, "no rendering frames during warm-up"
    timed = meas_all[n_warm:]
    assert timed, "warm-up consumed the whole stream; lengthen the sim"

    def run_mode(ms, mode):
        t0 = time.perf_counter()
        if mode == "pipelined":
            # host prep of frame k+1 overlaps device programs of frame k
            # (pipeline feeder thread; see LivoPipeline.process_measurements)
            pipe.process_measurements(ms)
        else:
            for m in ms:
                pipe._process_measurement(m)
        jax.block_until_ready(pipe.state.p)
        return time.perf_counter() - t0

    # Host mode is picked EMPIRICALLY: the feeder-thread overlap wins
    # when host prep is the bottleneck, but on few-core hosts GIL
    # contention with the dispatch thread can make it lose to the
    # serial path.  Round 4 committed later chunks to an earlier
    # chunk's winner, conflating host-mode effect with segment
    # difficulty (the driver-artifact pick was wrong); now the two
    # modes A/B on INTERLEAVED short bursts of the same stream segment
    # before any measurement chunk runs.  --serial / --pipelined skip
    # calibration.
    if "--serial" in sys.argv:
        host_mode, cal = "serial", None
    elif "--pipelined" in sys.argv:
        host_mode, cal = "pipelined", None
    else:
        burst = max(len(timed) // 12, 8)
        cal_t = {"pipelined": 0.0, "serial": 0.0}
        cal_n = {"pipelined": 0, "serial": 0}
        pos = 0
        for i in range(6):
            mode = ("pipelined", "serial")[i % 2]
            b = timed[pos:pos + burst]
            pos += burst
            if not b:
                break
            cal_t[mode] += run_mode(b, mode)
            cal_n[mode] += len(b)
        cal = {m: round(cal_n[m] / cal_t[m], 2) for m in cal_t
               if cal_t[m] > 0}
        host_mode = max(cal, key=cal.get)
        timed = timed[pos:]
        print(f"calibration (interleaved bursts): {cal} -> {host_mode}",
              file=sys.stderr)

    pipe.timers.total.clear()
    pipe.timers.count.clear()
    # MEDIAN of 4 disjoint chunks is the headline (best kept as aux):
    # the tunneled-TPU link adds multi-ms jitter bursts, and round 4's
    # best-of-chunks headline sat a 2x run-to-run spread above the
    # median.  Every chunk is real end-to-end work on fresh
    # measurements (no replays).
    n_chunks = 4
    k = max(len(timed) // n_chunks, 1)
    chunks = [timed[i * k:(i + 1) * k] for i in range(n_chunks - 1)]
    chunks.append(timed[(n_chunks - 1) * k:])
    chunks = [c for c in chunks if c]
    rates = [len(c) / run_mode(c, host_mode) for c in chunks]
    med = float(np.median(rates))
    best = max(rates)

    n_rendered = sum(1 for m in timed if m.rendering and m.image is not None)
    print(f"{len(timed)} sweeps ({n_rendered} with images), mode "
          f"{host_mode}, chunk rates "
          + " ".join(f"{r:.1f}" for r in rates)
          + f" -> median {med:.1f}/s = {1e3 / med:.1f} ms/frame "
          f"(best {best:.1f})", file=sys.stderr)
    print("stage breakdown:\n" + pipe.timers.summary(), file=sys.stderr)
    print(json.dumps({
        "metric": "sweeps_images_per_s",
        "value": round(med, 2),
        "unit": "sweeps+images/s",
        "vs_baseline": round(med / 30.0, 3),
        "best": round(best, 2),
        "chunk_rates": [round(r, 2) for r in rates],
        "host_mode": host_mode,
        "calibration_rates": cal,
        "measurement": f"median of {len(chunks)} disjoint chunks, host "
                       "mode A/B-calibrated on interleaved bursts",
    }))


if __name__ == "__main__":
    main()

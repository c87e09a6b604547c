"""Decompose the full-LIVO frame time: tunnel RTT, host->device transfer
bandwidth, and amortized (pipelined) device time per program, so we know
whether to attack dispatch overhead or device compute.
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from sr_livo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from sr_livo_tpu.models.vision import VisionModule
    from sr_livo_tpu.pipeline import LivoPipeline
    from bench import make_cfg

    cfg = make_cfg()
    z = np.load(os.path.join(os.path.dirname(__file__), "..",
                             ".bench_livo_sim_v2.npz"))
    from sr_livo_tpu.runtime.synthetic import SimStream
    sim = SimStream(
        imu=[(float(r[0]), r[1:4], r[4:7]) for r in z["imu"]],
        lidar_chunks=[z[f"pts{i}"] for i in range(int(z["n_chunks"]))],
        images=[(float(t), img) for t, img in zip(z["img_t"], z["imgs"])],
        gt_times=z["gt_times"], gt_pos=z["gt_pos"], gt_quat=z["gt_quat"])

    # ---- tunnel RTT ----
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,))
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(50):
        jax.block_until_ready(f(x))
    rtt = (time.perf_counter() - t0) / 50
    print(f"RTT (tiny jit call, sync each): {rtt*1e3:.2f} ms")

    # dispatch-only cost (no sync)
    t0 = time.perf_counter()
    y = x
    for _ in range(200):
        y = f(y)
    disp = (time.perf_counter() - t0) / 200
    jax.block_until_ready(y)
    print(f"dispatch-only (chained, async): {disp*1e3:.3f} ms")

    # ---- transfer bandwidth ----
    img = np.zeros((512, 640, 3), np.uint8)
    jax.block_until_ready(jnp.asarray(img))
    t0 = time.perf_counter()
    for _ in range(20):
        d = jnp.asarray(img)
    jax.block_until_ready(d)
    tx = (time.perf_counter() - t0) / 20
    print(f"h2d 1MB uint8 (async chain): {tx*1e3:.2f} ms "
          f"({img.nbytes/tx/1e6:.0f} MB/s)")
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(jnp.asarray(img))
    tx = (time.perf_counter() - t0) / 20
    print(f"h2d 1MB uint8 (sync each): {tx*1e3:.2f} ms")

    # ---- pipeline warm-up ----
    vision = VisionModule(cfg)
    pipe = LivoPipeline(cfg, vision=vision)
    for (t, a, g) in sim.imu:
        pipe.push_imu(t, a, g)
    for c in sim.lidar_chunks:
        pipe.push_points(c)
    for (t, img_) in sim.images:
        pipe.push_image(t, img_)
    meas_all = []
    while True:
        m = pipe.cutter.get()
        if m is None:
            break
        meas_all.append(m)
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
    print(f"warmed on {n_warm} measurements")

    # ---- amortized per-program device times ----
    from sr_livo_tpu.runtime import measurements as meas_mod
    from sr_livo_tpu.models.odometry import WireSweep
    m = meas_all[n_warm]
    prep = meas_mod.prepare_sweep(m, pipe.current_time, cfg)
    wire = meas_mod.pack_sweep(prep, m.duration)
    sweep = WireSweep(
        pts_q=jnp.asarray(wire.pts_q), scale=jnp.float32(wire.scale),
        duration=jnp.float32(wire.duration), imu_t=jnp.asarray(prep.imu_t),
        imu_dt=jnp.asarray(prep.imu_dt), imu_acc=jnp.asarray(prep.imu_acc),
        imu_gyr=jnp.asarray(prep.imu_gyr),
        imu_valid=jnp.asarray(prep.imu_valid),
        do_optimize=jnp.asarray(True), threshold_capacity=jnp.int32(1))

    N = 20
    state, vmap_ = pipe.state, pipe.voxel_map
    out = pipe.engine.step(state, vmap_, sweep, 100)
    jax.block_until_ready(out.state.p)
    t0 = time.perf_counter()
    vm2 = out.voxel_map
    for _ in range(N):
        out = pipe.engine.step(state, vm2, sweep, 100)
        vm2 = out.voxel_map
    jax.block_until_ready(out.state.p)
    print(f"lio_step amortized: {(time.perf_counter()-t0)/N*1e3:.2f} ms")

    # color insert amortized
    t0 = time.perf_counter()
    for _ in range(N):
        vision.insert_sweep_points(out.frame_pts_world, out.frame_valid,
                                   out.summary.success, m.time_image)
    jax.block_until_ready(vision.color_map.reg)
    print(f"color_insert amortized: {(time.perf_counter()-t0)/N*1e3:.2f} ms")

    # preprocess amortized
    img_np = np.asarray(m.image) if m.image is not None else \
        np.zeros((512, 640, 3), np.uint8)
    rgb, gray = vision.preprocess(img_np)
    jax.block_until_ready(gray)
    t0 = time.perf_counter()
    for _ in range(N):
        rgb, gray = vision.preprocess(img_np)
    jax.block_until_ready(gray)
    print(f"vis_preprocess amortized: {(time.perf_counter()-t0)/N*1e3:.2f} ms")

    # pyramid amortized
    from sr_livo_tpu.ops import lk
    pyr = lk.precompute_frame(gray, vision.lk_params.levels)
    jax.block_until_ready(pyr)
    t0 = time.perf_counter()
    for _ in range(N):
        pyr = lk.precompute_frame(gray, vision.lk_params.levels)
    jax.block_until_ready(pyr)
    print(f"vis_pyramid amortized: {(time.perf_counter()-t0)/N*1e3:.2f} ms")

    # vision step amortized — donates color_map+tracks, feed back
    from sr_livo_tpu.models.vision import _vision_step
    cam = vision.camera
    cmap = vision.color_map
    tracks = vision.tracks
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    qq, pp = state.q, state.p
    args = dict(lk_params=vision.lk_params, cols=vision.cols,
                rows=vision.rows, track_grid=vision.track_grid,
                max_render_points=cfg.shapes.max_render_points,
                estimate_intrinsic=True, estimate_extrinsic=True)
    outv = _vision_step(cam, cmap, tracks, pyr, pyr, rgb, qq, pp,
                        jnp.asarray([0.1, m.time_image], jnp.float32),
                        jnp.int32(1), k1, **args)
    jax.block_until_ready(outv[0].intr)
    t0 = time.perf_counter()
    cam2, cmap2, tracks2 = outv[0], outv[1], outv[2]
    for _ in range(N):
        outv = _vision_step(cam2, cmap2, tracks2, pyr, pyr, rgb, qq, pp,
                            jnp.asarray([0.1, m.time_image], jnp.float32),
                            jnp.int32(1), k1, **args)
        cam2, cmap2, tracks2 = outv[0], outv[1], outv[2]
    jax.block_until_ready(outv[0].intr)
    print(f"vis_step amortized: {(time.perf_counter()-t0)/N*1e3:.2f} ms")


if __name__ == "__main__":
    main()

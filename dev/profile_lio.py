"""Decompose the per-sweep LIO step at bench shapes on a warm map."""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(name, f, *a, n=20, **kw):
    import jax
    o = f(*a, **kw)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a, **kw)
    jax.block_until_ready(o)
    print(f"{name:<34} {(time.perf_counter()-t0)/n*1e3:8.3f} ms", flush=True)
    return o


def main():
    from sr_livo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import functools
    from bench import make_cfg, load_sim
    from sr_livo_tpu.pipeline import LivoPipeline
    from sr_livo_tpu.runtime import measurements as meas_mod
    from sr_livo_tpu.models.odometry import WireSweep, unpack_wire
    from sr_livo_tpu.models import eskf as eskf_mod, lio
    from sr_livo_tpu.ops import frame as frame_ops, voxel_map as vm
    from sr_livo_tpu.utils import lie

    cfg = make_cfg()
    sim = load_sim()
    pipe = LivoPipeline(cfg)
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
    n_warm = 0
    wf = 0
    for m in meas_all:
        pipe._process_measurement(m)
        n_warm += 1
        if pipe.initialized:
            wf += 1
            if wf >= 12:
                break
    jax.block_until_ready(pipe.state.p)
    print(f"warm {n_warm}", flush=True)

    m = meas_all[n_warm]
    prep = meas_mod.prepare_sweep(m, pipe.current_time, cfg)
    wire = meas_mod.pack_sweep(prep, m.duration)
    sweep_w = WireSweep(
        pts_q=jnp.asarray(wire.pts_q), scale=jnp.float32(wire.scale),
        duration=jnp.float32(wire.duration), imu_t=jnp.asarray(prep.imu_t),
        imu_dt=jnp.asarray(prep.imu_dt), imu_acc=jnp.asarray(prep.imu_acc),
        imu_gyr=jnp.asarray(prep.imu_gyr),
        imu_valid=jnp.asarray(prep.imu_valid),
        do_optimize=jnp.asarray(True), threshold_capacity=jnp.int32(1))
    state, vmap_ = pipe.state, pipe.voxel_map
    engine = pipe.engine

    # full step amortized (donated map chained)
    out = engine.step(state, vmap_, sweep_w, 100)
    jax.block_until_ready(out.state.p)
    vm2 = out.voxel_map
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        out = engine.step(state, vm2, sweep_w, 100)
        vm2 = out.voxel_map
    jax.block_until_ready(out.state.p)
    print(f"{'engine.step amortized':<34} {(time.perf_counter()-t0)/N*1e3:8.3f} ms",
          flush=True)
    vmap_ = vm2

    sweep = jax.jit(unpack_wire)(sweep_w)
    jax.block_until_ready(sweep.raw_pts)

    @jax.jit
    def predict(s, sw):
        return eskf_mod.predict_sweep(s, engine.noise, sw.imu_t, sw.imu_dt,
                                      sw.imu_acc, sw.imu_gyr, sw.imu_valid)

    state_pred, scan_states = timeit("predict_sweep", predict, state, sweep)

    pre = state
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
    jax.block_until_ready(imu_states.p)

    @jax.jit
    def deskew(sw, ims):
        imu_pts = frame_ops.undistort_constant(
            sw.raw_pts, sw.t_rel, ims, engine.r_il, engine.t_il)
        return frame_ops.to_end_frame(imu_pts, ims, engine.r_il, engine.t_il)

    raw_deskew = timeit("deskew (const vel)", deskew, sweep, imu_states)

    @jax.jit
    def sub1(x, v):
        return frame_ops.voxel_subsample(x, v, 0.25, 8192)

    frame_raw, frame_valid, _ = timeit("voxel_subsample 16k->8k", sub1,
                                       raw_deskew, sweep.pt_valid)

    @jax.jit
    def sub2(x, v):
        return frame_ops.voxel_subsample(x, v, 1.0, 1024)

    key_raw, key_valid, _ = timeit("voxel_subsample 8k->1k", sub2,
                                   frame_raw, frame_valid)

    icp = cfg.icp
    sh = cfg.shapes
    iekf = functools.partial(
        lio.iekf_update,
        size_voxel_map=icp.size_voxel_map, nb_voxels_visited=1,
        max_number_neighbors=icp.max_number_neighbors,
        min_number_neighbors=icp.min_number_neighbors,
        power_planarity=icp.power_planarity,
        max_dist_to_plane=icp.max_dist_to_plane_icp,
        weight_alpha=icp.weight_alpha,
        weight_neighborhood=icp.weight_neighborhood,
        max_num_residuals=icp.max_num_residuals,
        max_probe=sh.map_max_probe, max_iters=icp.num_iters_icp,
        threshold_translation_norm=icp.threshold_translation_norm,
        threshold_orientation_norm=icp.threshold_orientation_norm,
        laser_point_cov=cfg.laser_point_cov, use_pallas=True,
        cache_association=True)
    timeit("iekf_update (pallas, cached)", iekf, state_pred, vmap_, key_raw,
           key_valid, state.p, engine.r_il, engine.t_il, jnp.int32(1))
    iekf_np = functools.partial(
        lio.iekf_update,
        size_voxel_map=icp.size_voxel_map, nb_voxels_visited=1,
        max_number_neighbors=icp.max_number_neighbors,
        min_number_neighbors=icp.min_number_neighbors,
        power_planarity=icp.power_planarity,
        max_dist_to_plane=icp.max_dist_to_plane_icp,
        weight_alpha=icp.weight_alpha,
        weight_neighborhood=icp.weight_neighborhood,
        max_num_residuals=icp.max_num_residuals,
        max_probe=sh.map_max_probe, max_iters=icp.num_iters_icp,
        threshold_translation_norm=icp.threshold_translation_norm,
        threshold_orientation_norm=icp.threshold_orientation_norm,
        laser_point_cov=cfg.laser_point_cov, use_pallas=False,
        cache_association=True)
    timeit("iekf_update (jnp, cached)", iekf_np, state_pred, vmap_, key_raw,
           key_valid, state.p, engine.r_il, engine.t_il, jnp.int32(1))

    @jax.jit
    def kq(v, q):
        return vm.knn(v, q, voxel_size=1.0,
                      max_neighbors=icp.max_number_neighbors, max_probe=8,
                      nb_voxels=1, threshold_capacity=1)

    world = jax.jit(lambda kr, s: frame_ops.transform_to_world(
        kr, s.q, s.p, engine.r_il, engine.t_il))(key_raw, state_pred)
    timeit("knn (1024 q, warm map)", kq, vmap_, world)

    @jax.jit
    def fins(v, pts, val):
        v2, acc = vm.insert(v, pts, val, icp.size_voxel_map,
                            cfg.odometry_options.min_distance_points,
                            sh.map_max_probe, budget=sh.max_insert_points)
        return v2

    fw = jax.jit(lambda fr, s: frame_ops.transform_to_world(
        fr, s.q, s.p, engine.r_il, engine.t_il))(frame_raw, state_pred)
    o = fins(vmap_, fw, frame_valid)
    jax.block_until_ready(o.counts)
    t0 = time.perf_counter()
    for _ in range(20):
        o = fins(o, fw, frame_valid)
    jax.block_until_ready(o.counts)
    print(f"{'vm.insert (warm, 8k cand)':<34} {(time.perf_counter()-t0)/20*1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()

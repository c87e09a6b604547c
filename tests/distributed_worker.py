"""Multi-process worker for the jax.distributed CPU test.

Launched by tests/test_distributed_multiprocess.py as 2 OS processes,
each owning 4 virtual CPU devices (8 global).  Exercises:

  * jax.distributed.initialize over a localhost coordinator (the DCN
    bootstrap path of parallel.distributed.initialize_distributed)
  * make_host_map_mesh -> (host=2, map=4) with a cross-host psum
  * ShardedLioEngine: real sweep steps on an 8-device 1-D map mesh that
    SPANS BOTH PROCESSES — the map shards live in different OS processes
    and every kNN merge / normal-equation psum crosses the process
    boundary through the gloo collectives backend.

Writes its final state to <out>/result_<pid>.json for the parent test.
"""
import json
import os
import sys


def main():
    port, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map

    assert jax.process_count() == 2
    assert jax.device_count() == 8
    assert jax.local_device_count() == 4

    from sr_livo_tpu.parallel.distributed import (
        HOST_AXIS, MAP_AXIS, make_host_map_mesh, shard_keyframes_by_host)

    # ---- (host, map) mesh + cross-host collective ----------------------
    mesh2 = make_host_map_mesh()
    assert mesh2.shape[HOST_AXIS] == 2 and mesh2.shape[MAP_AXIS] == 4

    def global_sum(x):
        # local block reduce, then psum across BOTH mesh axes — the map
        # hop stays intra-process (ICI analog), the host hop crosses the
        # process boundary (DCN analog) through gloo
        return jax.lax.psum(jax.lax.psum(jnp.sum(x), HOST_AXIS), MAP_AXIS)

    f = jax.jit(shard_map(global_sum, mesh=mesh2,
                          in_specs=P(HOST_AXIS, MAP_AXIS),
                          out_specs=P(),
                          check_vma=False))
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    y = f(jax.device_put(x, NamedSharding(mesh2, P(HOST_AXIS, MAP_AXIS))))
    total = float(np.asarray(y.addressable_shards[0].data))
    assert abs(total - x.sum()) < 1e-4, (total, x.sum())

    lo, hi = shard_keyframes_by_host(10, mesh2)
    assert (lo, hi) == ((0, 5) if pid == 0 else (5, 10))

    # ---- sharded LIO steps across the process boundary -----------------
    from sr_livo_tpu.config import LivoConfig
    from sr_livo_tpu.models.odometry import SweepInput
    from sr_livo_tpu.parallel.sharded_lio import ShardedLioEngine
    from sr_livo_tpu.runtime import measurements as meas_mod
    from sr_livo_tpu.runtime import synthetic

    cfg = LivoConfig()
    cfg.odometry_options.voxel_size = 0.2
    cfg.odometry_options.init_voxel_size = 0.2
    cfg.odometry_options.sample_voxel_size = 0.8
    cfg.odometry_options.init_sample_voxel_size = 0.8
    cfg.odometry_options.min_distance_points = 0.05
    cfg.icp.size_voxel_map = 0.6
    cfg.icp.min_number_neighbors = 12
    cfg.icp.max_num_residuals = -1
    cfg.shapes.max_sweep_points = 1024
    cfg.shapes.max_frame_points = 1024
    cfg.shapes.max_keypoints = 256
    cfg.shapes.max_imu_samples = 48
    cfg.shapes.map_capacity = 1 << 13

    # deterministic sweeps (identical in both workers and in the parent)
    sim = synthetic.simulate(duration=5.2, n_azimuth=48, n_rings=8, seed=4)
    cutter = meas_mod.SweepCutter(0.1)
    for (t, a, g) in sim.imu:
        cutter.push_imu(t, a, g)
    for c in sim.lidar_chunks:
        cutter.push_points(c)
    for (t, img) in sim.images:
        cutter.push_image(t, img)
    preps = []
    current = None
    while len(preps) < 4:
        m = cutter.get()
        if m is None:
            break
        if current is None:
            current = m.time_sweep_begin
        prep = meas_mod.prepare_sweep(m, current, cfg)
        current = prep.new_current_time
        preps.append(prep)
    assert len(preps) == 4

    flat = Mesh(np.array(sorted(jax.devices(),
                                key=lambda d: (d.process_index, d.id))),
                (MAP_AXIS,))
    eng = ShardedLioEngine(cfg, flat)
    state, vmap_ = eng.init_state(), eng.make_map()
    rep = NamedSharding(flat, P())
    for fid, prep in enumerate(preps, start=1):
        sweep = SweepInput(
            raw_pts=jnp.asarray(prep.raw_pts),
            t_rel=jnp.asarray(prep.t_rel),
            pt_valid=jnp.asarray(prep.pt_valid),
            imu_t=jnp.asarray(prep.imu_t), imu_dt=jnp.asarray(prep.imu_dt),
            imu_acc=jnp.asarray(prep.imu_acc),
            imu_gyr=jnp.asarray(prep.imu_gyr),
            imu_valid=jnp.asarray(prep.imu_valid),
            do_optimize=jnp.asarray(fid > 1),
            threshold_capacity=jnp.int32(1))
        sweep = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), sweep)
        out = eng.step(state, vmap_, sweep, fid)
        state, vmap_ = out.state, out.voxel_map

    p = np.asarray(state.p.addressable_shards[0].data, np.float64)
    q = np.asarray(state.q.addressable_shards[0].data, np.float64)
    with open(os.path.join(out_dir, f"result_{pid}.json"), "w") as fo:
        json.dump({"p": p.tolist(), "q": q.tolist(),
                   "devices": jax.device_count(),
                   "processes": jax.process_count()}, fo)
    print(f"worker {pid} done p={p}")


if __name__ == "__main__":
    main()

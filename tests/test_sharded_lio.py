"""Multi-device (8-way virtual CPU mesh) sharded LIO tests.

Validates that the map-sharded engine reproduces the single-device
trajectory and that insert routing/kNN merging across shards is exact.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr_livo_tpu.config import LivoConfig
from sr_livo_tpu.models.odometry import LioEngine, SweepInput
from sr_livo_tpu.parallel import mesh as mesh_mod
from sr_livo_tpu.parallel.sharded_lio import ShardedLioEngine, shard_of
from sr_livo_tpu.ops import voxel_map as vm
from sr_livo_tpu.runtime import synthetic
from sr_livo_tpu.runtime import measurements as meas_mod


def _cfg() -> LivoConfig:
    cfg = LivoConfig()
    cfg.odometry_options.voxel_size = 0.2
    cfg.odometry_options.init_voxel_size = 0.2
    cfg.odometry_options.sample_voxel_size = 0.8
    cfg.odometry_options.init_sample_voxel_size = 0.8
    cfg.odometry_options.min_distance_points = 0.05
    cfg.icp.size_voxel_map = 0.6
    cfg.icp.min_number_neighbors = 12
    cfg.icp.max_num_residuals = -1     # disable cap: exact parity check
    cfg.shapes.max_sweep_points = 2048
    cfg.shapes.max_frame_points = 2048
    cfg.shapes.max_keypoints = 512
    cfg.shapes.max_imu_samples = 48
    cfg.shapes.map_capacity = 1 << 15
    return cfg


def _sweeps(cfg, duration=4.0, n=8):
    sim = synthetic.simulate(duration=duration, n_azimuth=64, n_rings=10,
                             seed=4)
    cutter = meas_mod.SweepCutter(0.1)
    for (t, a, g) in sim.imu:
        cutter.push_imu(t, a, g)
    for c in sim.lidar_chunks:
        cutter.push_points(c)
    for (t, img) in sim.images:
        cutter.push_image(t, img)
    out = []
    current = None
    while len(out) < n:
        m = cutter.get()
        if m is None:
            break
        if current is None:
            current = m.time_sweep_begin
        prep = meas_mod.prepare_sweep(m, current, cfg)
        current = prep.new_current_time
        out.append(prep)
    return out


def test_shard_of_deterministic_routing():
    coords = jnp.asarray(np.random.RandomState(0).randint(-100, 100, (1000, 3)),
                         jnp.int32)
    s = np.asarray(shard_of(coords, 8))
    assert s.min() >= 0 and s.max() < 8
    # roughly balanced
    counts = np.bincount(s, minlength=8)
    assert counts.min() > 50


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_single_device():
    cfg = _cfg()
    preps = _sweeps(cfg, n=6)
    assert len(preps) >= 4

    single = LioEngine(cfg)
    mesh = mesh_mod.make_mesh(8)
    sharded = ShardedLioEngine(cfg, mesh)

    s1, m1 = single.init_state(), single.make_map()
    s2, m2 = sharded.init_state(), sharded.make_map()

    for fid, prep in enumerate(preps, start=1):
        sweep = SweepInput(
            raw_pts=jnp.asarray(prep.raw_pts), t_rel=jnp.asarray(prep.t_rel),
            pt_valid=jnp.asarray(prep.pt_valid),
            imu_t=jnp.asarray(prep.imu_t), imu_dt=jnp.asarray(prep.imu_dt),
            imu_acc=jnp.asarray(prep.imu_acc),
            imu_gyr=jnp.asarray(prep.imu_gyr),
            imu_valid=jnp.asarray(prep.imu_valid),
            do_optimize=jnp.asarray(fid > 1),
            threshold_capacity=jnp.int32(1))
        o1 = single.step(s1, m1, sweep, fid)
        o2 = sharded.step(s2, m2, sweep, fid)
        s1, m1 = o1.state, o1.voxel_map
        s2, m2 = o2.state, o2.voxel_map

        # no routing-budget overflow: the run is exact by construction
        assert int(o2.route_overflow) == 0, fid
        # identical OWNED point count (halo copies excluded by
        # engine.map_size; single-chip map has no halos)
        assert int(vm.map_size(m1)) == int(sharded.map_size(m2)), fid
        # trajectories agree to float tolerance
        assert np.allclose(o1.state.p, o2.state.p, atol=2e-3), (
            fid, np.asarray(o1.state.p), np.asarray(o2.state.p))
        assert np.allclose(o1.state.q, o2.state.q, atol=1e-4)
        assert bool(o1.summary.success) == bool(o2.summary.success)

    # residual counts in the same ballpark (tie-breaks may differ)
    assert abs(int(o1.summary.num_residuals)
               - int(o2.summary.num_residuals)) <= 5


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_single_device_with_residual_cap():
    """Parity WITH the residual cap enabled (the benchmarked config):
    the sharded engine reproduces the single-chip global keypoint-order
    prefix (optimize.cpp:107) via scalar all_gather of per-shard prefix
    counts, so trajectories must still agree."""
    cfg = _cfg()
    cfg.icp.max_num_residuals = 220    # < typical residual count -> active
    preps = _sweeps(cfg, n=6)
    assert len(preps) >= 4

    single = LioEngine(cfg)
    sharded = ShardedLioEngine(cfg, mesh_mod.make_mesh(8))
    s1, m1 = single.init_state(), single.make_map()
    s2, m2 = sharded.init_state(), sharded.make_map()
    capped = 0
    for fid, prep in enumerate(preps, start=1):
        sweep = SweepInput(
            raw_pts=jnp.asarray(prep.raw_pts), t_rel=jnp.asarray(prep.t_rel),
            pt_valid=jnp.asarray(prep.pt_valid),
            imu_t=jnp.asarray(prep.imu_t), imu_dt=jnp.asarray(prep.imu_dt),
            imu_acc=jnp.asarray(prep.imu_acc),
            imu_gyr=jnp.asarray(prep.imu_gyr),
            imu_valid=jnp.asarray(prep.imu_valid),
            do_optimize=jnp.asarray(fid > 1),
            threshold_capacity=jnp.int32(1))
        o1 = single.step(s1, m1, sweep, fid)
        o2 = sharded.step(s2, m2, sweep, fid)
        s1, m1 = o1.state, o1.voxel_map
        s2, m2 = o2.state, o2.voxel_map
        if fid > 1 and int(o1.summary.num_residuals) >= 220:
            capped += 1
        assert np.allclose(o1.state.p, o2.state.p, atol=2e-3), (
            fid, np.asarray(o1.state.p), np.asarray(o2.state.p))
        assert np.allclose(o1.state.q, o2.state.q, atol=1e-4)
        # the cap itself must agree exactly between the two engines
        assert (int(o1.summary.num_residuals)
                == int(o2.summary.num_residuals)), fid
    assert capped >= 2, "cap never engaged; lower max_num_residuals"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_route_overflow_degrades_gracefully():
    """Adversarial density: starve the routing budgets (budget_override)
    so overflow MUST trigger, and check the engine's degradation contract
    — overflow counted nonzero, state stays finite, the step keeps
    running, and the map keeps a sane size (no corruption, no NaNs)."""
    cfg = _cfg()
    preps = _sweeps(cfg, n=5)
    mesh = mesh_mod.make_mesh(8)
    from sr_livo_tpu.parallel.sharded_lio import compute_budgets
    tiny = compute_budgets(cfg, 8)
    tiny.update(B2=16, B3=16, B4=16, K4=64, B5=16, W_ins=64)
    eng = ShardedLioEngine(cfg, mesh, budget_override=tiny)
    s, m = eng.init_state(), eng.make_map()
    saw_overflow = 0
    for fid, prep in enumerate(preps, start=1):
        sweep = SweepInput(
            raw_pts=jnp.asarray(prep.raw_pts), t_rel=jnp.asarray(prep.t_rel),
            pt_valid=jnp.asarray(prep.pt_valid),
            imu_t=jnp.asarray(prep.imu_t), imu_dt=jnp.asarray(prep.imu_dt),
            imu_acc=jnp.asarray(prep.imu_acc),
            imu_gyr=jnp.asarray(prep.imu_gyr),
            imu_valid=jnp.asarray(prep.imu_valid),
            do_optimize=jnp.asarray(fid > 1),
            threshold_capacity=jnp.int32(1))
        out = eng.step(s, m, sweep, fid)
        s, m = out.state, out.voxel_map
        saw_overflow += int(out.route_overflow)
        assert np.all(np.isfinite(np.asarray(s.p)))
        assert np.all(np.isfinite(np.asarray(s.cov)))
    assert saw_overflow > 0, "budgets this small must overflow"
    assert int(eng.map_size(m)) > 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_eviction_long_traverse():
    """Sharded map lifecycle (VERDICT r4 #4): a sensor walks a long line
    inserting local structure through the FULL engine step at
    deliberately small per-shard capacity.  With periodic
    engine.compact() the owned map stays bounded to the local
    neighborhood and keeps absorbing new structure to the end; without
    it the per-shard tables saturate with dead keys (the round-3
    single-chip failure mode, mirrored here per shard).  Mirrors
    test_voxel_map.test_compact_map_survives_capacity_pressure."""
    cfg = _cfg()
    cfg.shapes.max_sweep_points = 1024
    cfg.shapes.max_frame_points = 1024
    cfg.shapes.max_keypoints = 256
    cfg.odometry_options.max_distance = 30.0
    cfg.odometry_options.min_distance_points = 0.2
    mesh = mesh_mod.make_mesh(8)
    rng = np.random.RandomState(3)
    n_imu = 8
    steps = 36

    def _walk_sweep(x0):
        n = cfg.shapes.max_sweep_points
        pts = np.c_[rng.uniform(x0 - 8, x0 + 8, n),
                    rng.uniform(-6, 6, n),
                    rng.uniform(0, 3, n)].astype(np.float32)
        # stationary state: no valid IMU samples, no optimization — the
        # walk happens in the point payload, so inserts exercise the
        # owner-insert + replay legs while the pose stays at the origin
        return SweepInput(
            raw_pts=jnp.asarray(pts),
            t_rel=jnp.zeros((n,), jnp.float32),
            pt_valid=jnp.ones((n,), bool),
            imu_t=jnp.zeros((n_imu,), jnp.float32),
            imu_dt=jnp.zeros((n_imu,), jnp.float32),
            imu_acc=jnp.zeros((n_imu, 3), jnp.float32),
            imu_gyr=jnp.zeros((n_imu, 3), jnp.float32),
            imu_valid=jnp.zeros((n_imu,), bool),
            do_optimize=jnp.asarray(False),
            threshold_capacity=jnp.int32(1))

    def traverse(evict):
        from sr_livo_tpu.parallel.sharded_lio import compute_budgets
        b = compute_budgets(cfg, 8)
        b["local_capacity"] = 1 << 9     # pressure: ~4k slots global
        eng = ShardedLioEngine(cfg, mesh, budget_override=b)
        s, m = eng.init_state(), eng.make_map()
        growth = []
        prev = 0
        for step in range(steps):
            x0 = 2.0 * step
            out = eng.step(s, m, _walk_sweep(x0), 100 + step)
            s, m = out.state, out.voxel_map
            size = int(eng.map_size(m))
            growth.append(size - prev)
            prev = size
            if evict and step % 6 == 5:
                m, dropped = eng.compact(
                    m, np.array([x0, 0.0, 1.5], np.float32))
                # rehash drops are COUNTED; at this deliberate pressure
                # (load factor ~1) a few are expected, never silent
                assert int(dropped) < 100
                prev = int(eng.map_size(m))
        return np.array(growth), m, eng

    g_e, m_e, eng_e = traverse(True)
    g_n, _m_n, _ = traverse(False)
    head = g_e[2:8].mean()
    tail_e = g_e[-6:].mean()
    tail_n = g_n[-6:].mean()
    # with compaction the tail keeps absorbing like the head ...
    assert tail_e > 0.5 * head, (head, tail_e)
    # ... and clearly better than the saturated no-eviction run
    assert tail_e > 2.0 * tail_n, (tail_e, tail_n)
    # owned size bounded to the local neighborhood
    assert int(eng_e.map_size(m_e)) < (1 << 9) * 8 * 20 // 2

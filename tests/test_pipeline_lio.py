"""End-to-end LIO test: synthetic world replay -> trajectory ATE.

This is the integration milestone of SURVEY §7 stage 2/3: sweep
reconstruction + ESKF + IEKF + map, closed loop against exact ground
truth from the simulator.
"""
import numpy as np
import pytest

from sr_livo_tpu.config import LivoConfig
from sr_livo_tpu.pipeline import LivoPipeline, run_streams
from sr_livo_tpu.runtime import synthetic, tum


def _small_cfg() -> LivoConfig:
    cfg = LivoConfig()
    cfg.odometry_options.voxel_size = 0.2
    cfg.odometry_options.init_voxel_size = 0.2
    cfg.odometry_options.sample_voxel_size = 0.8
    cfg.odometry_options.init_sample_voxel_size = 0.8
    cfg.odometry_options.min_distance_points = 0.05
    cfg.icp.size_voxel_map = 0.6
    cfg.icp.min_number_neighbors = 12
    cfg.icp.max_num_residuals = 600
    cfg.icp.num_iters_icp = 5
    cfg.icp.threshold_translation_norm = 1e-3
    cfg.icp.threshold_orientation_norm = 1e-2
    cfg.shapes.max_sweep_points = 4096
    cfg.shapes.max_frame_points = 4096
    cfg.shapes.max_keypoints = 768
    cfg.shapes.max_imu_samples = 48
    cfg.shapes.map_capacity = 1 << 16
    cfg.imu_options.acc_cov = 0.1
    cfg.imu_options.gyr_cov = 0.1
    return cfg


@pytest.fixture(scope="module")
def sim():
    return synthetic.simulate(duration=10.0, n_azimuth=100, n_rings=12,
                              seed=2)


def test_cutter_sweep_alignment(sim):
    from sr_livo_tpu.runtime.measurements import SweepCutter
    cutter = SweepCutter(0.1)
    for (t, acc, gyr) in sim.imu:
        cutter.push_imu(t, acc, gyr)
    for c in sim.lidar_chunks:
        cutter.push_points(c)
    for (t, img) in sim.images:
        cutter.push_image(t, img)
    sweeps = []
    while True:
        m = cutter.get()
        if m is None:
            break
        sweeps.append(m)
    assert len(sweeps) > 80
    for m in sweeps:
        # image-aligned sweeps end exactly at an image timestamp
        if m.rendering:
            assert any(abs(m.time_image - t) < 1e-9
                       for t in [im_t for im_t, _ in sim.images])
        # all points lie inside the sweep window
        if m.points.shape[0]:
            assert m.points[:, 3].max() <= m.time_image + 1e-9
            assert m.points[:, 3].min() >= m.time_sweep_begin - 1e-9
        # contiguous coverage
    for a, b in zip(sweeps[:-1], sweeps[1:]):
        assert abs(b.time_sweep_begin - a.time_image) < 1e-9


def test_lio_end_to_end_ate(sim):
    cfg = _small_cfg()
    pipe = LivoPipeline(cfg)
    run_streams(pipe, sim)

    assert pipe.initialized, "IMU static init never completed"
    assert len(pipe.records) > 40
    n_fail = sum(1 for r in pipe.records if not r.success)
    assert n_fail <= 2, f"{n_fail} failed registrations"

    ts, ps, qs = pipe.trajectory()
    ate = tum.ate_rmse(ts, ps, sim.gt_times, sim.gt_pos, align=True)
    # Exact-simulation LIO should track to a few cm.
    assert ate < 0.05, f"ATE RMSE {ate:.3f} m"

    # Translation-only compensation: the odometry frame is the body pose at
    # init (origin, identity yaw), so after shifting both trajectories to
    # their first pose they should agree without rotational alignment.
    i0, g0 = tum.associate(ts[:1], sim.gt_times)
    gt_shift = sim.gt_pos - sim.gt_pos[g0[0]]
    est_shift = ps - ps[0]
    ate_raw = tum.ate_rmse(ts, est_shift, sim.gt_times, gt_shift, align=False)
    assert ate_raw < 0.3, f"start-aligned ATE {ate_raw:.3f} m"


def test_outputs_written(tmp_path, sim):
    cfg = _small_cfg()
    pipe = LivoPipeline(cfg)
    run_streams(pipe, sim)
    pipe.write_outputs(str(tmp_path))
    t, p, q = tum.read_tum(str(tmp_path / "pose.txt"))
    assert t.shape[0] == len(pipe.records)
    assert np.all(np.isfinite(p))
    nrm = np.linalg.norm(q, axis=-1)
    assert np.allclose(nrm, 1.0, atol=1e-5)


def test_debug_output_frame_dumps(tmp_path):
    """debug_output writes one de-skewed world-frame PCD per processed
    frame (lioOptimization.cpp:1091-1099)."""
    cfg = _small_cfg()
    cfg.debug_output = True
    cfg.output_path = str(tmp_path)
    short = synthetic.simulate(duration=4.5, n_azimuth=80, n_rings=10, seed=5)
    pipe = LivoPipeline(cfg)
    run_streams(pipe, short)
    d = tmp_path / "cloud_frame"
    dumps = sorted(d.glob("*.pcd"))
    assert len(dumps) == len(pipe.records) > 0
    # round-trip one dump
    raw = dumps[-1].read_bytes()
    hdr_end = raw.index(b"DATA binary\n") + len(b"DATA binary\n")
    n = int([ln for ln in raw[:hdr_end].decode().splitlines()
             if ln.startswith("POINTS")][0].split()[1])
    pts = np.frombuffer(raw[hdr_end:], np.float32).reshape(n, 3)
    assert n > 0 and np.all(np.isfinite(pts))


def test_map_eviction_bounds_map_and_keeps_tracking(sim):
    """Far-voxel eviction (removePointsFarFromLocation,
    lioOptimization.cpp:556-572): with a tight max_distance the map stays
    bounded while the odometry keeps converging."""
    from sr_livo_tpu.ops.voxel_map import map_size

    cfg = _small_cfg()
    cfg.enable_map_eviction = True
    cfg.eviction_every_n_frames = 5
    cfg.odometry_options.max_distance = 12.0
    pipe = LivoPipeline(cfg)
    run_streams(pipe, sim)
    assert pipe.initialized
    recs = pipe.records
    assert sum(r.success for r in recs) > 0.9 * len(recs)
    # the map never exceeds what a 12 m ball of 0.6 m voxels could hold
    n_vox = int(map_size(pipe.voxel_map))
    assert 0 < n_vox < (2 * 12.0 / 0.6) ** 3
    ts, ps, _ = pipe.trajectory()
    from sr_livo_tpu.runtime import tum
    ate = tum.ate_rmse(ts, ps, sim.gt_times, sim.gt_pos, align=True)
    assert ate < 0.10, f"eviction-enabled ATE {ate:.3f} m"


def test_pipelined_host_path_matches_serial(sim):
    """process_measurements (feeder-thread host prep, frame k+1 prepared
    while frame k dispatches) must be bit-identical to the serial path —
    the overlap only reorders HOST work, never device programs."""
    cfg = _small_cfg()

    def cut_all():
        from sr_livo_tpu.runtime.measurements import SweepCutter
        cutter = SweepCutter(0.1)
        for (t, a, g) in sim.imu:
            cutter.push_imu(t, a, g)
        for c in sim.lidar_chunks:
            cutter.push_points(c)
        for (t, img) in sim.images:
            cutter.push_image(t, img)
        out = []
        while True:
            m = cutter.get()
            if m is None:
                return out
            out.append(m)

    meas = cut_all()[:60]
    serial = LivoPipeline(cfg)
    for m in meas:
        serial._process_measurement(m)
    piped = LivoPipeline(cfg)
    n = piped.process_measurements(meas)
    assert n == len(meas)
    assert piped.index_frame == serial.index_frame
    rs, rp = serial.records, piped.records
    assert len(rs) == len(rp) and len(rs) > 15
    for a, b in zip(rs, rp):
        np.testing.assert_array_equal(a.position, b.position)
        np.testing.assert_array_equal(a.quat_wxyz, b.quat_wxyz)
        assert a.time == b.time and a.success == b.success

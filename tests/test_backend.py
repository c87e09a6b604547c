"""Mapping backend integration: keyframes, windowed BA, pose graph."""
import numpy as np
import pytest

from sr_livo_tpu.config import LivoConfig
from sr_livo_tpu.parallel.backend import BackendConfig, MappingBackend
from sr_livo_tpu.pipeline import LivoPipeline, run_streams
from sr_livo_tpu.runtime import synthetic, tum


def _cfg():
    cfg = LivoConfig()
    cfg.odometry_options.voxel_size = 0.2
    cfg.odometry_options.init_voxel_size = 0.2
    cfg.odometry_options.sample_voxel_size = 0.8
    cfg.odometry_options.init_sample_voxel_size = 0.8
    cfg.odometry_options.min_distance_points = 0.05
    cfg.icp.size_voxel_map = 0.6
    cfg.icp.min_number_neighbors = 12
    cfg.shapes.max_sweep_points = 2048
    cfg.shapes.max_frame_points = 2048
    cfg.shapes.max_keypoints = 512
    cfg.shapes.max_imu_samples = 48
    cfg.shapes.map_capacity = 1 << 15
    return cfg


def test_backend_collects_and_optimizes():
    sim = synthetic.simulate(duration=9.0, n_azimuth=80, n_rings=10, seed=14)
    backend = MappingBackend(BackendConfig(
        keyframe_interval=0.4, window_size=4, ba_every_n_keyframes=4,
        max_keyframe_points=512, loop_min_gap=100))
    pipe = LivoPipeline(_cfg(), backend=backend)
    run_streams(pipe, sim)

    assert len(backend.keyframes) >= 8
    assert backend.ba_runs >= 1
    assert len(backend.edges) >= len(backend.keyframes) - 1

    times, t_opt, q_opt = backend.optimized_trajectory()
    assert np.all(np.isfinite(t_opt))
    ate_opt = tum.ate_rmse(times, t_opt, sim.gt_times, sim.gt_pos, align=True)
    # the backend path must stay consistent with ground truth
    assert ate_opt < 0.08, ate_opt

    ts, ps, _ = pipe.trajectory()
    ate_odo = tum.ate_rmse(ts, ps, sim.gt_times, sim.gt_pos, align=True)
    # and not be (much) worse than the frontend odometry
    assert ate_opt < max(2.5 * ate_odo, 0.05), (ate_opt, ate_odo)

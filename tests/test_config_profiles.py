"""Config-profile tests: shipped YAMLs + the reference's own YAML files,
plus the IMU motion-compensation pipeline variant."""
import os

import numpy as np
import pytest

from sr_livo_tpu.config import (LIDAR_LIVOX, LIDAR_OUSTER,
                                MOTION_COMP_CONSTANT_VELOCITY,
                                MOTION_COMP_IMU, load_config)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/config"


@pytest.mark.parametrize("path,lidar_type,motion", [
    (f"{REPO}/configs/r3live.yaml", LIDAR_LIVOX,
     MOTION_COMP_CONSTANT_VELOCITY),
    (f"{REPO}/configs/r3live_compressed.yaml", LIDAR_LIVOX, MOTION_COMP_IMU),
    (f"{REPO}/configs/ntu.yaml", LIDAR_OUSTER, MOTION_COMP_CONSTANT_VELOCITY),
])
def test_shipped_profiles(path, lidar_type, motion):
    cfg = load_config(path)
    assert cfg.lidar_options.lidar_type == lidar_type
    assert cfg.odometry_options.motion_compensation == motion
    assert cfg.icp.max_num_residuals == 600
    assert cfg.icp.min_num_residuals == 200
    assert cfg.camera_options.camera_intrinsic[0] > 100


@pytest.mark.parametrize("name", ["r3live.yaml", "r3live_compressed.yaml",
                                  "ntu.yaml"])
def test_reference_yaml_loads_directly(name):
    """The engine accepts the reference's own config files unmodified."""
    path = os.path.join(REF, name)
    if not os.path.exists(path):
        pytest.skip("reference configs not mounted")
    cfg = load_config(path)
    ours = load_config(os.path.join(REPO, "configs", name))
    assert cfg.lidar_options.lidar_type == ours.lidar_options.lidar_type
    assert np.allclose(cfg.extrinsics.R_imu_camera(),
                       ours.extrinsics.R_imu_camera())
    assert cfg.icp.size_voxel_map == ours.icp.size_voxel_map
    assert (cfg.odometry_options.motion_compensation
            == ours.odometry_options.motion_compensation)


def test_pipeline_with_imu_motion_compensation():
    """Full LIO with motion_compensation=IMU (the r3live_compressed mode)."""
    from sr_livo_tpu.config import LivoConfig
    from sr_livo_tpu.pipeline import LivoPipeline, run_streams
    from sr_livo_tpu.runtime import synthetic, tum

    cfg = LivoConfig()
    cfg.odometry_options.motion_compensation = MOTION_COMP_IMU
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

    sim = synthetic.simulate(duration=8.0, n_azimuth=80, n_rings=10, seed=19)
    pipe = LivoPipeline(cfg)
    run_streams(pipe, sim)
    assert pipe.initialized
    ts, ps, _ = pipe.trajectory()
    ate = tum.ate_rmse(ts, ps, sim.gt_times, sim.gt_pos, align=True)
    assert ate < 0.06, f"IMU-mode ATE {ate:.3f} m"

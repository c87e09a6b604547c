"""Checkpoint/resume tests: a resumed run must match the uninterrupted one."""
import numpy as np
import pytest

from sr_livo_tpu.config import LivoConfig
from sr_livo_tpu.pipeline import LivoPipeline, run_streams
from sr_livo_tpu.runtime import synthetic, tum


def _cfg() -> LivoConfig:
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


def _feed(pipe, sim, t_lo, t_hi):
    """Feed only events with timestamp in [t_lo, t_hi)."""
    events = []
    for (t, acc, gyr) in sim.imu:
        events.append((t, "imu", (t, acc, gyr)))
    for chunk in sim.lidar_chunks:
        if chunk.shape[0]:
            events.append((chunk[-1, 3], "pts", chunk))
    for (t, img) in sim.images:
        events.append((t, "img", (t, img)))
    events.sort(key=lambda e: (e[0], e[1]))
    for (t, kind, payload) in events:
        if not (t_lo <= t < t_hi):
            continue
        if kind == "imu":
            pipe.push_imu(*payload)
        elif kind == "pts":
            pipe.push_points(payload)
        else:
            pipe.push_image(*payload)
    pipe.process_available()


@pytest.fixture(scope="module")
def sim():
    return synthetic.simulate(duration=8.0, n_azimuth=80, n_rings=10, seed=12)


def test_resume_matches_uninterrupted(tmp_path, sim):
    cfg = _cfg()
    # uninterrupted baseline
    base = LivoPipeline(cfg)
    run_streams(base, sim)
    tsb, psb, _ = base.trajectory()

    # interrupted: half, checkpoint, restore into a fresh pipeline, finish
    first = LivoPipeline(cfg)
    _feed(first, sim, 0.0, 5.0)
    n_half = len(first.records)
    assert n_half > 5
    ckpt = str(tmp_path / "state.npz")
    first.save_checkpoint(ckpt)

    resumed = LivoPipeline(cfg)
    resumed.load_checkpoint(ckpt)
    assert resumed.initialized == first.initialized
    assert resumed.index_frame == first.index_frame
    assert len(resumed.records) == n_half
    _feed(resumed, sim, 5.0, 99.0)

    tsr, psr, _ = resumed.trajectory()
    assert len(tsr) == len(tsb)
    assert np.allclose(tsr, tsb)
    # trajectories agree tightly (same state, same inputs)
    err = np.linalg.norm(psr - psb, axis=-1)
    assert err.max() < 5e-3, err.max()


def test_checkpoint_preserves_map(tmp_path, sim):
    from sr_livo_tpu.ops import voxel_map as vm
    cfg = _cfg()
    pipe = LivoPipeline(cfg)
    _feed(pipe, sim, 0.0, 6.0)
    size_before = int(vm.map_size(pipe.voxel_map))
    assert size_before > 1000
    ckpt = str(tmp_path / "m.npz")
    pipe.save_checkpoint(ckpt)
    fresh = LivoPipeline(cfg)
    fresh.load_checkpoint(ckpt)
    assert int(vm.map_size(fresh.voxel_map)) == size_before
    assert np.allclose(np.asarray(fresh.state.p), np.asarray(pipe.state.p))
    assert np.allclose(np.asarray(fresh.state.cov), np.asarray(pipe.state.cov))

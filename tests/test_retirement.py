"""Frame retirement + bounded host memory for long runs.

Reference semantics: the frame loop keeps `num_for_initialization`
cloudFrames before filter init and 2 afterwards, recording each retired
frame's pose (lioOptimization.cpp:1101-1130, recordSinglePose
:1133-1172).  Here retirement bounds `_pending_records`/`_records` and
appends retired poses to pose/velocity/bias files in batches.
"""
import os

import numpy as np
import pytest

from sr_livo_tpu.config import LivoConfig
from sr_livo_tpu.pipeline import LivoPipeline, run_streams
from sr_livo_tpu.runtime import synthetic, tum


def _cfg(tmp_path, retire: bool):
    cfg = LivoConfig()
    cfg.output_path = str(tmp_path / ("ret" if retire else "base"))
    cfg.retire_frames = retire
    cfg.retire_batch = 8
    cfg.odometry_options.voxel_size = 0.2
    cfg.odometry_options.init_voxel_size = 0.2
    cfg.odometry_options.sample_voxel_size = 0.8
    cfg.odometry_options.init_sample_voxel_size = 0.8
    cfg.odometry_options.min_distance_points = 0.05
    cfg.icp.size_voxel_map = 0.6
    cfg.icp.min_number_neighbors = 12
    sh = cfg.shapes
    sh.max_sweep_points = 2048
    sh.max_frame_points = 2048
    sh.max_keypoints = 512
    sh.max_imu_samples = 48
    sh.map_capacity = 1 << 15
    return cfg


def test_retired_poses_match_unretired_run(tmp_path):
    sim = synthetic.simulate(duration=9.0, n_azimuth=100, n_rings=12, seed=6)

    base = LivoPipeline(_cfg(tmp_path, retire=False))
    run_streams(base, sim)
    n_frames = len(base.records)
    assert n_frames > 30

    cfg = _cfg(tmp_path, retire=True)
    pipe = LivoPipeline(cfg)
    run_streams(pipe, sim)
    # live set bounded by keep + batch (keep = 2 post-init)
    live = len(pipe._pending_records) + len(pipe._records)
    assert live <= 2 + cfg.retire_batch
    assert pipe.n_retired == n_frames - live
    pipe.write_outputs()

    ts, ps, _q = tum.read_tum(os.path.join(cfg.output_path, "pose.txt"))
    tsb, psb, _qb = base.trajectory()
    assert len(ts) == n_frames
    assert np.allclose(ts, tsb, atol=1e-9)
    assert np.allclose(ps, psb, atol=1e-6)
    # velocity/bias got the same rows
    assert len(open(os.path.join(cfg.output_path, "velocity.txt"))
               .read().splitlines()) == n_frames
    assert len(open(os.path.join(cfg.output_path, "bias.txt"))
               .read().splitlines()) == n_frames


@pytest.mark.slow
def test_soak_bounded_memory(tmp_path):
    """10k-frame soak: live records, keyframe payloads, and RSS stay
    bounded (VERDICT r2 #6)."""
    from sr_livo_tpu.parallel.backend import BackendConfig, MappingBackend

    def rss_mb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024.0
        return 0.0

    cfg = _cfg(tmp_path, retire=True)
    cfg.shapes.max_sweep_points = 512
    cfg.shapes.max_frame_points = 512
    cfg.shapes.max_keypoints = 256
    backend = MappingBackend(BackendConfig(
        keyframe_interval=0.5, max_keyframe_payloads=32,
        loop_check_every_n=10 ** 9, ba_every_n_keyframes=10 ** 9))
    pipe = LivoPipeline(cfg, backend=backend)

    # One long stream, fed in windows so host queues stay small.
    duration = 1000.0
    sim = synthetic.simulate(duration=duration, n_azimuth=40, n_rings=6,
                             seed=3, lidar_noise=0.002)
    ev = []
    for (t, acc, gyr) in sim.imu:
        ev.append((t, "imu", (t, acc, gyr)))
    for chunk in sim.lidar_chunks:
        if chunk.shape[0]:
            ev.append((chunk[-1, 3], "pts", chunk))
    for (t, img) in sim.images:
        ev.append((t, "img", (t, img)))
    ev.sort(key=lambda e: (e[0], e[1]))

    rss_mid = None
    next_drain = 0.25
    for (t, kind, payload) in ev:
        if kind == "imu":
            pipe.push_imu(*payload)
        elif kind == "pts":
            pipe.push_points(payload)
        else:
            pipe.push_image(*payload)
        if t >= next_drain:
            pipe.process_available()
            next_drain = t + 0.25
            if rss_mid is None and t > duration * 0.25:
                rss_mid = rss_mb()
    pipe.process_available()

    n_frames = pipe.n_retired + len(pipe._pending_records) + len(pipe._records)
    assert n_frames > 9000
    assert len(pipe._pending_records) + len(pipe._records) \
        <= 2 + cfg.retire_batch
    # keyframe payload memory bounded: only the newest 32 carry points
    with_payload = sum(1 for f in backend.keyframes if f.points.shape[0])
    assert with_payload <= 32
    assert len(backend.keyframes) > 100       # poses still all present
    rss_end = rss_mb()
    # steady-state: the last 75% of the run must not grow RSS materially
    assert rss_end - rss_mid < 300.0, (rss_mid, rss_end)
    pipe.write_outputs()
    ts, _ps, _q = tum.read_tum(os.path.join(cfg.output_path, "pose.txt"))
    assert len(ts) == n_frames

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


def test_feedback_rebuilds_map_at_optimized_poses():
    """Map re-anchoring (round-5): apply_pose_correction with
    feedback_rebuild_map must (a) store the loop-consistent poses into
    the keyframes, and (b) rebuild the frontend voxel map so its
    geometry matches keyframe payloads placed at those poses — not at
    the drifted insert-time poses."""
    import jax.numpy as jnp
    from sr_livo_tpu.models import eskf as eskf_mod
    from sr_livo_tpu.ops import voxel_map as vm
    from sr_livo_tpu.parallel import pose_graph as pg
    from sr_livo_tpu.parallel.backend import Keyframe
    from sr_livo_tpu.utils import lie

    cfg = _cfg()
    rng = np.random.RandomState(5)
    n_kf, n_pts = 6, 256

    # ground-truth poses on a line; drifted copies shifted +0.5 m in x
    # from keyframe 2 on (a synthetic accumulated drift)
    t_gt = np.stack([[0.5 * k, 0.0, 1.0] for k in range(n_kf)]).astype(
        np.float32)
    drift = np.zeros_like(t_gt)
    drift[2:, 0] = 0.5
    q_id = np.array([1, 0, 0, 0], np.float32)

    backend = MappingBackend(BackendConfig(feedback_to_filter=True))
    pts = rng.uniform(-2, 2, (n_kf, n_pts, 3)).astype(np.float32)
    for k in range(n_kf):
        backend.keyframes.append(Keyframe(
            time=float(k), q=q_id.copy(), t=t_gt[k] + drift[k],
            points=pts[k], valid=np.ones(n_pts, bool)))
        if k:
            # odometry edges measured from the DRIFTED chain
            qr, tr = pg.edge_from_poses(
                jnp.asarray(q_id), jnp.asarray(t_gt[k - 1] + drift[k - 1]),
                jnp.asarray(q_id), jnp.asarray(t_gt[k] + drift[k]))
            backend.edges.append(dict(i=k - 1, j=k, q=np.asarray(qr),
                                      t=np.asarray(tr),
                                      rot_w=50.0, t_w=50.0))
    # a strong loop edge pinning keyframe 5 at its TRUE relative pose
    qr, tr = pg.edge_from_poses(
        jnp.asarray(q_id), jnp.asarray(t_gt[0]),
        jnp.asarray(q_id), jnp.asarray(t_gt[5]))
    backend.edges.append(dict(i=0, j=5, q=np.asarray(qr), t=np.asarray(tr),
                              rot_w=500.0, t_w=500.0))

    class _FakePipe:
        pass

    pipe = _FakePipe()
    pipe.cfg = cfg
    pipe.state = eskf_mod.init_state()
    pipe.voxel_map = vm.make_map(cfg.shapes.map_capacity, 20)

    assert backend.apply_pose_correction(pipe)
    assert backend.n_map_rebuilds == 1

    # stored poses moved toward the loop-consistent solution: the
    # drifted +0.5 m offset on the last keyframe is mostly gone
    assert abs(backend.keyframes[5].t[0] - t_gt[5, 0]) < 0.15
    # the rebuilt map holds the last keyframe's payload at the
    # CORRECTED pose: its points find sub-voxel neighbors in the map
    f = backend.keyframes[5]
    world = pts[5] @ np.asarray(
        lie.quat_to_rot(jnp.asarray(f.q))).T + f.t
    _nb, nb_ok, dists = vm.knn(
        pipe.voxel_map, jnp.asarray(world, jnp.float32),
        voxel_size=cfg.icp.size_voxel_map, max_neighbors=1,
        max_probe=cfg.shapes.map_max_probe)
    near = np.asarray(dists)[:, 0][np.asarray(nb_ok)[:, 0]]
    assert near.size > n_pts // 2 and np.median(near) < 0.05, (
        near.size, float(np.median(near)) if near.size else -1)

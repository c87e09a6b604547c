"""IEKF LIO update tests: pose recovery on a synthetic planar world."""
import jax.numpy as jnp
import numpy as np

from sr_livo_tpu.models import eskf, lio
from sr_livo_tpu.ops import voxel_map as vm
from sr_livo_tpu.utils import lie

RNG = np.random.RandomState(11)

ICP_KW = dict(
    size_voxel_map=1.0,
    nb_voxels_visited=1,
    max_number_neighbors=20,
    min_number_neighbors=20,
    power_planarity=2.0,
    max_dist_to_plane=0.3,
    weight_alpha=0.9,
    weight_neighborhood=0.1,
    max_num_residuals=600,
    max_probe=16,
    max_iters=8,
    threshold_translation_norm=1e-3,
    threshold_orientation_norm=1e-2,
    laser_point_cov=0.001,
)


def _world_points(n_per_plane=4000):
    """Three orthogonal planes: floor z=0, walls x=6 and y=6."""
    u = RNG.uniform(-6, 6, (n_per_plane, 2))
    floor = np.c_[u[:, 0], u[:, 1], np.zeros(n_per_plane)]
    wallx = np.c_[np.full(n_per_plane, 6.0), u[:, 0], u[:, 1] * 0.5 + 3]
    wally = np.c_[u[:, 0], np.full(n_per_plane, 6.0), u[:, 1] * 0.5 + 3]
    return np.concatenate([floor, wallx, wally]).astype(np.float32)


def _build_map(pts):
    m = vm.make_map(1 << 14, 20)
    n = pts.shape[0]
    for i in range(0, n, 4096):
        chunk = pts[i:i + 4096]
        m, _ = vm.insert(m, jnp.asarray(chunk),
                         jnp.ones(chunk.shape[0], bool), 1.0, 0.05, 16)
    return m


def _keypoints_from_world(world_pts, n=400):
    sel = RNG.choice(world_pts.shape[0], n, replace=False)
    return world_pts[sel]


def test_iekf_recovers_perturbed_pose():
    world = _world_points()
    m = _build_map(world)
    keypts = _keypoints_from_world(world)  # true pose = identity

    # Start from a perturbed state: 20 cm offset, ~2 deg attitude error.
    d_p = np.array([0.15, -0.12, 0.08], np.float32)
    d_w = np.array([0.02, -0.03, 0.02], np.float32)
    st = eskf.init_state()._replace(
        p=jnp.asarray(d_p),
        q=lie.exp_so3_quat(jnp.asarray(d_w)))

    out, summary = lio.iekf_update(
        st, m, jnp.asarray(keypts), jnp.ones(keypts.shape[0], bool),
        jnp.zeros(3, jnp.float32), jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32), jnp.int32(1), **ICP_KW)

    assert bool(summary.success)
    assert int(summary.num_residuals) > 100
    assert float(jnp.linalg.norm(out.p)) < 0.01, np.asarray(out.p)
    ang = float(lie.angular_distance_deg(lie.quat_to_so3(out.q)))
    assert ang < 0.2, ang
    # covariance was updated (shrunk in the measured subspace)
    assert float(out.cov[0, 0]) < float(st.cov[0, 0])


def test_iekf_respects_extrinsics():
    world = _world_points()
    m = _build_map(world)
    r_il = np.asarray(lie.exp_so3(jnp.asarray([0.05, -0.1, 0.2], jnp.float32)))
    t_il = np.array([0.1, 0.05, -0.08], np.float32)
    # keypoints given in the LiDAR frame for identity IMU pose
    keyw = _keypoints_from_world(world)
    keypts = (keyw - t_il) @ r_il  # R_il^T (w - t_il)

    st = eskf.init_state()._replace(
        p=jnp.asarray([0.1, 0.1, -0.05], jnp.float32),
        q=lie.exp_so3_quat(jnp.asarray([0.015, 0.02, -0.01], jnp.float32)))
    out, summary = lio.iekf_update(
        st, m, jnp.asarray(keypts), jnp.ones(keypts.shape[0], bool),
        jnp.zeros(3, jnp.float32), jnp.asarray(r_il), jnp.asarray(t_il),
        jnp.int32(1), **ICP_KW)
    assert bool(summary.success)
    assert float(jnp.linalg.norm(out.p)) < 0.01
    assert float(lie.angular_distance_deg(lie.quat_to_so3(out.q))) < 0.2


def test_iekf_fails_on_empty_map():
    m = vm.make_map(1 << 10, 20)
    keypts = RNG.randn(100, 3).astype(np.float32) * 5
    st = eskf.init_state()
    out, summary = lio.iekf_update(
        st, m, jnp.asarray(keypts), jnp.ones(100, bool),
        jnp.zeros(3, jnp.float32), jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32), jnp.int32(1), **ICP_KW)
    assert not bool(summary.success)
    # state passes through unchanged
    assert np.allclose(out.p, st.p)
    assert np.allclose(out.cov, st.cov)


def test_iekf_residual_cap():
    world = _world_points()
    m = _build_map(world)
    keypts = _keypoints_from_world(world, n=500)
    st = eskf.init_state()
    kw = dict(ICP_KW)
    kw["max_num_residuals"] = 100
    out, summary = lio.iekf_update(
        st, m, jnp.asarray(keypts), jnp.ones(keypts.shape[0], bool),
        jnp.zeros(3, jnp.float32), jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32), jnp.int32(1), **kw)
    assert bool(summary.success)
    assert int(summary.num_residuals) <= 100


def test_iekf_cached_association_matches_full():
    """The cached-association path (kNN + plane PCA once at the predicted
    pose) must recover the same pose as per-iteration re-association when
    the initial error is well under a map voxel."""
    world = _world_points()
    m = _build_map(world)
    keypts = _keypoints_from_world(world)

    d_p = np.array([0.15, -0.12, 0.08], np.float32)
    d_w = np.array([0.02, -0.03, 0.02], np.float32)
    st = eskf.init_state()._replace(
        p=jnp.asarray(d_p),
        q=lie.exp_so3_quat(jnp.asarray(d_w)))
    args = (st, m, jnp.asarray(keypts), jnp.ones(keypts.shape[0], bool),
            jnp.zeros(3, jnp.float32), jnp.eye(3, dtype=jnp.float32),
            jnp.zeros(3, jnp.float32), jnp.int32(1))

    out_f, sum_f = lio.iekf_update(*args, cache_association=False, **ICP_KW)
    out_c, sum_c = lio.iekf_update(*args, cache_association=True, **ICP_KW)

    assert bool(sum_c.success)
    # both land on the true pose (identity)
    assert float(jnp.linalg.norm(out_c.p)) < 0.01, np.asarray(out_c.p)
    ang = float(lie.angular_distance_deg(lie.quat_to_so3(out_c.q)))
    assert ang < 0.2, ang
    # and agree with the full re-association solve to sub-mm / millidegree
    assert np.allclose(out_c.p, out_f.p, atol=2e-3)
    assert float(lie.angular_distance_deg(
        lie.quat_to_so3(lie.quat_mul(lie.quat_conj(out_f.q),
                                     out_c.q)))) < 0.05
    assert np.allclose(out_c.cov, out_f.cov, atol=2e-4)


def test_retry_wider_neighborhood_recovers_sparse_map():
    """A map so sparse that 27-voxel neighborhoods hold < min neighbors
    fails the plain update; with retry_wider_neighborhood the engine
    re-runs at +-2 voxels and succeeds (LivoConfig knob; the reference
    simply drops the frame, lioOptimization.cpp:1011-1014)."""
    from sr_livo_tpu.config import LivoConfig
    from sr_livo_tpu.models.odometry import LioEngine, SweepInput

    def cfg_for(retry):
        cfg = LivoConfig()
        cfg.icp.size_voxel_map = 0.6
        cfg.icp.min_number_neighbors = 12
        cfg.odometry_options.voxel_size = 0.2
        cfg.odometry_options.sample_voxel_size = 0.7
        cfg.retry_wider_neighborhood = retry
        cfg.wire_quantization = False
        sh = cfg.shapes
        sh.max_sweep_points = 1024
        sh.max_frame_points = 1024
        sh.max_keypoints = 256
        sh.max_imu_samples = 8
        sh.map_capacity = 1 << 14
        return cfg

    # one point per 0.6 m voxel on a sparse 1.2 m grid: a +-1 voxel
    # neighborhood sees ~4 points (< 12), +-2 sees ~9-12 (>= 12 with
    # the second plane below)
    g = np.arange(-6.0, 6.0, 1.2, np.float32) + 0.3
    gx, gy = np.meshgrid(g, g)
    floor = np.c_[gx.ravel(), gy.ravel(), np.zeros(gx.size)]
    wall = np.c_[gx.ravel(), np.full(gx.size, 6.3), gy.ravel() * 0.25 + 1.5]
    sparse = np.concatenate([floor, wall]).astype(np.float32)

    def run(retry):
        cfg = cfg_for(retry)
        eng = LioEngine(cfg)
        m = eng.make_map()
        m, _ = vm.insert(m, jnp.asarray(sparse),
                         jnp.ones(sparse.shape[0], bool), 0.6, 0.05, 8)
        state = eng.init_state()
        # sweep points: the same sparse world seen from identity pose
        n = 1024
        sel = RNG.choice(sparse.shape[0], n, replace=True)
        pts = sparse[sel] + RNG.randn(n, 3).astype(np.float32) * 0.01
        sweep = SweepInput(
            raw_pts=jnp.asarray(pts),
            t_rel=jnp.zeros(n, jnp.float32),
            pt_valid=jnp.ones(n, bool),
            imu_t=jnp.asarray(np.linspace(0.01, 0.1, 8), jnp.float32),
            imu_dt=jnp.asarray(np.full(8, 0.0125), jnp.float32),
            imu_acc=jnp.asarray(
                np.tile(np.array([0, 0, 9.81], np.float32), (8, 1))),
            imu_gyr=jnp.zeros((8, 3), jnp.float32),
            imu_valid=jnp.ones(8, bool),
            do_optimize=jnp.asarray(True),
            threshold_capacity=jnp.int32(1))
        out = eng.step(state, m, sweep,
                       frame_id=cfg.odometry_options.init_num_frames + 1)
        return bool(out.summary.success), int(out.summary.num_residuals)

    ok_plain, n_plain = run(False)
    ok_retry, n_retry = run(True)
    assert not ok_plain, (ok_plain, n_plain)
    assert ok_retry, (ok_retry, n_retry)
    assert n_retry >= 12


def test_chunked_assoc_matches_full_batch():
    """models.lio.chunked_assoc over the valid prefix must match the
    full-batch kNN + PCA association row-for-row on the valid rows, for
    chunk sizes that do and do not divide the buffer."""
    import jax
    from sr_livo_tpu.models.lio import chunked_assoc
    from sr_livo_tpu.ops import neighborhood as nb_ops
    rng = np.random.RandomState(11)
    m = vm.make_map(1 << 12, 12)
    pts_np = rng.uniform(-15, 15, (2000, 3)).astype(np.float32)
    pts = jnp.asarray(pts_np)
    m, _ = vm.insert(m, pts, jnp.ones(2000, bool), 0.8, 0.05, 8)
    q, nv = 384, 251
    world = np.zeros((q, 3), np.float32)
    # queries near stored points so most rows find a full neighborhood
    world[:nv] = (pts_np[rng.randint(0, 2000, nv)]
                  + rng.uniform(-0.3, 0.3, (nv, 3)).astype(np.float32))
    world_j = jnp.asarray(world)
    kw = dict(voxel_size=0.8, max_neighbors=8, max_probe=8, nb_voxels=1,
              threshold_capacity=jnp.int32(1))
    neighbors, nb_ok, _ = vm.knn(m, world_j, **kw)
    n_found = jnp.sum(nb_ok, axis=1).astype(jnp.int32)
    normal0, a2d, _ = nb_ops.neighborhood_distribution(neighbors, n_found)
    closest = neighbors[:, 0, :]
    for chunk in (64, 100):
        cn, ca, cc, cf = chunked_assoc(m, world_j, jnp.int32(nv),
                                       chunk=chunk, **kw)
        assert np.array_equal(np.asarray(n_found[:nv]), np.asarray(cf[:nv]))
        # rows with < 3 neighbors have a degenerate PCA eigenspace (the
        # normal is arbitrary within a subspace, numerically batch-shape
        # dependent) and are gated downstream by min_number_neighbors;
        # compare only well-posed rows
        well = np.asarray(n_found[:nv]) >= 3
        assert well.sum() > 50            # the fixture must exercise them
        # XLA vectorizes the two batch shapes differently, so f32
        # rounding can rotate the eigenvector on NEAR-degenerate
        # neighborhoods; require agreement on the overwhelming majority
        # and directional closeness (sign-invariant) where it holds
        dots = np.abs(np.sum(np.asarray(normal0[:nv])[well]
                             * np.asarray(cn[:nv])[well], axis=1))
        assert np.mean(dots > 0.999) >= 0.95, np.sort(dots)[:5]
        da = np.abs(np.asarray(a2d[:nv])[well] - np.asarray(ca[:nv])[well])
        assert np.mean(da < 1e-3) >= 0.95
        assert np.allclose(np.asarray(closest[:nv]), np.asarray(cc[:nv]))
        # skipped tail is inert: zero n_found
        assert not np.asarray(cf[nv + chunk:]).any()

"""Tests for frame assembly ops (undistortion, subsampling) and PCA."""
import jax.numpy as jnp
import numpy as np

from sr_livo_tpu.models import eskf
from sr_livo_tpu.ops import frame as fops
from sr_livo_tpu.ops import neighborhood as nbo
from sr_livo_tpu.utils import lie

RNG = np.random.RandomState(3)


def _imu_states_linear(S=11, dt=0.01, v=np.array([1.0, 0.0, 0.0]),
                       w=np.array([0.0, 0.0, 0.5])):
    """Straight-line + constant-rate rotation trajectory."""
    t = np.arange(S) * dt
    ps, qs, vs = [], [], []
    for ti in t:
        ps.append(v * ti)
        qs.append(np.asarray(lie.exp_so3_quat(jnp.asarray(w * ti, jnp.float32))))
        vs.append(v)
    valid = np.ones(S, bool)
    un_gyr = np.tile(w, (S, 1))
    un_acc = np.zeros((S, 3))
    return eskf.ImuStates(
        t=jnp.asarray(t, jnp.float32), un_acc=jnp.asarray(un_acc, jnp.float32),
        un_gyr=jnp.asarray(un_gyr, jnp.float32), p=jnp.asarray(ps, jnp.float32),
        q=jnp.asarray(qs, jnp.float32), v=jnp.asarray(vs, jnp.float32),
        valid=jnp.asarray(valid))


def test_undistort_constant_endpoints():
    st = _imu_states_linear()
    r_il = jnp.eye(3, dtype=jnp.float32)
    t_il = jnp.zeros(3, jnp.float32)
    pts = jnp.asarray(RNG.randn(10, 3), jnp.float32)
    # points at t=0 use begin pose (identity); points at t_end use end pose
    t_rel = jnp.concatenate([jnp.zeros(5), jnp.full(5, 0.1)]).astype(jnp.float32)
    out = fops.undistort_constant(pts, t_rel, st, r_il, t_il)
    assert np.allclose(out[:5], pts[:5], atol=1e-5)
    q_end, p_end = st.q[-1], st.p[-1]
    expect = lie.quat_rotate(jnp.broadcast_to(q_end, (5, 4)), pts[5:]) + p_end
    assert np.allclose(out[5:], expect, atol=1e-5)


def test_undistort_imu_matches_constant_for_const_motion():
    # For constant-velocity, zero-acceleration motion both methods agree.
    st = _imu_states_linear(w=np.zeros(3))
    r_il = jnp.eye(3, dtype=jnp.float32)
    t_il = jnp.zeros(3, jnp.float32)
    pts = jnp.asarray(RNG.randn(50, 3), jnp.float32)
    t_rel = jnp.asarray(RNG.uniform(0, 0.1, 50), jnp.float32)
    a = fops.undistort_constant(pts, t_rel, st, r_il, t_il)
    b = fops.undistort_imu(pts, t_rel, st, r_il, t_il)
    assert np.allclose(a, b, atol=1e-4)


def test_to_end_frame_inverts_endpoint_transform():
    st = _imu_states_linear()
    r_il = jnp.asarray(lie.exp_so3(jnp.asarray([0.1, 0.2, -0.1], jnp.float32)))
    t_il = jnp.asarray([0.05, -0.02, 0.1], jnp.float32)
    raw = jnp.asarray(RNG.randn(20, 3) * 5, jnp.float32)
    # A point captured exactly at sweep end, de-skewed to world, then
    # re-expressed in the end LiDAR frame, must equal its raw coords.
    t_rel = jnp.full(20, float(st.t[-1]), jnp.float32)
    world = fops.undistort_constant(raw, t_rel, st, r_il, t_il)
    back = fops.to_end_frame(world, st, r_il, t_il)
    assert np.allclose(back, raw, atol=1e-4)


def test_imu_lidar_extrinsic_applied():
    st = _imu_states_linear(S=2, w=np.zeros(3), v=np.zeros(3))
    r_il = jnp.asarray(lie.exp_so3(jnp.asarray([0, 0, np.pi / 2], jnp.float32)))
    t_il = jnp.asarray([1.0, 0, 0], jnp.float32)
    raw = jnp.asarray([[1.0, 0, 0]], jnp.float32)
    out = fops.undistort_constant(raw, jnp.zeros(1, jnp.float32), st, r_il, t_il)
    assert np.allclose(out, [[1.0, 1.0, 0.0]], atol=1e-5)


def test_voxel_subsample_one_per_voxel():
    pts = np.concatenate([
        RNG.uniform(0, 0.9, (30, 3)),        # all in voxel (0,0,0)
        RNG.uniform(5.1, 5.9, (10, 3)),      # all in voxel (5,5,5)
        np.array([[10.5, 0.5, 0.5]]),
    ]).astype(np.float32)
    valid = np.ones(41, bool)
    out, ok, _ = fops.voxel_subsample(jnp.asarray(pts), jnp.asarray(valid),
                                      1.0, 16)
    assert int(ok.sum()) == 3
    vox = np.trunc(np.asarray(out)[np.asarray(ok)] / 1.0).astype(int)
    assert {tuple(v) for v in vox} == {(0, 0, 0), (5, 5, 5), (10, 0, 0)}


def test_voxel_subsample_payload_and_invalid():
    pts = RNG.uniform(-10, 10, (200, 3)).astype(np.float32)
    payload = np.arange(200, dtype=np.int32)
    valid = np.ones(200, bool)
    valid[100:] = False
    out, ok, (pay,) = fops.voxel_subsample(
        jnp.asarray(pts), jnp.asarray(valid), 1.0, 256,
        payload=(jnp.asarray(payload),))
    n = int(ok.sum())
    assert n <= 100
    # payload rows track the selected points
    sel_pts = np.asarray(out)[:n]
    sel_pay = np.asarray(pay)[:n]
    assert (sel_pay < 100).all()
    assert np.allclose(pts[sel_pay], sel_pts, atol=1e-6)


def test_voxel_subsample_truncates_to_max_out():
    pts = (np.arange(50)[:, None] * np.array([2.0, 0, 0])).astype(np.float32)
    out, ok, _ = fops.voxel_subsample(jnp.asarray(pts),
                                      jnp.ones(50, bool), 1.0, 16)
    assert int(ok.sum()) == 16


def test_eigvals_sym3x3_matches_numpy():
    mats = RNG.randn(100, 3, 3).astype(np.float32)
    sym = mats + np.transpose(mats, (0, 2, 1))
    lams = np.asarray(nbo.eigvals_sym3x3(jnp.asarray(sym)))
    ref = np.sort(np.linalg.eigvalsh(sym), axis=-1)[:, ::-1]
    assert np.allclose(lams, ref, atol=1e-3)


def test_eigvec_smallest_direction():
    mats = RNG.randn(50, 3, 3).astype(np.float32)
    sym = mats @ np.transpose(mats, (0, 2, 1))  # PSD
    lams = nbo.eigvals_sym3x3(jnp.asarray(sym))
    v = np.asarray(nbo.eigvec_for(jnp.asarray(sym), lams[:, 2]))
    w, vecs = np.linalg.eigh(sym)
    ref = vecs[:, :, 0]
    dots = np.abs(np.sum(v * ref, axis=-1))
    assert np.allclose(dots, 1.0, atol=1e-2)


def test_neighborhood_planar_patch():
    # Points on the z=0 plane: normal = +-z, a2D ~ 1
    pts = np.zeros((4, 20, 3), np.float32)
    pts[..., :2] = RNG.uniform(-1, 1, (4, 20, 2))
    pts[..., 2] = RNG.randn(4, 20) * 1e-4
    n_valid = np.full(4, 20, np.int32)
    normal, a2d, bary = nbo.neighborhood_distribution(
        jnp.asarray(pts), jnp.asarray(n_valid))
    assert np.allclose(np.abs(np.asarray(normal)[:, 2]), 1.0, atol=1e-3)
    # planar patches score high; a fully isotropic 3D blob scores low
    assert (np.asarray(a2d) > 0.5).all()
    blob = RNG.randn(4, 20, 3).astype(np.float32)
    _, a2d_blob, _ = nbo.neighborhood_distribution(
        jnp.asarray(blob), jnp.asarray(n_valid))
    assert (np.asarray(a2d_blob) < np.asarray(a2d)).all()


def test_neighborhood_mask_respected():
    # Valid prefix is planar; padded tail is garbage far away.
    pts = np.zeros((1, 20, 3), np.float32)
    pts[0, :10, :2] = RNG.uniform(-1, 1, (10, 2))
    pts[0, 10:] = 1e3
    normal, a2d, _ = nbo.neighborhood_distribution(
        jnp.asarray(pts), jnp.asarray([10], np.int32))
    assert abs(float(normal[0, 2])) > 0.999

"""Tests for the 17-dim ESKF (sr_livo_tpu.models.eskf).

Validates midpoint propagation against a numpy double-precision
re-integration, covariance symmetry/PSD-ness, the F_x structure against a
finite-difference Jacobian of the nominal propagation, and the host-side
static IMU initializer gates (reference eskfEstimator.cpp semantics).
"""
import jax.numpy as jnp
import numpy as np

from sr_livo_tpu.models import eskf
from sr_livo_tpu.utils import lie

RNG = np.random.RandomState(1)


def _make_noise():
    return eskf.noise_diag(0.1, 0.1, 1e-4, 1e-4)


def _np_quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def _np_quat_to_rot(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _np_exp_quat(w):
    theta = np.linalg.norm(w)
    if theta < 1e-8:
        q = np.array([1.0, *(0.5 * w)])
        return q / np.linalg.norm(q)
    u = w / theta
    return np.array([np.cos(theta / 2), *(u * np.sin(theta / 2))])


def test_predict_matches_numpy_double():
    state = eskf.init_state()
    noise = _make_noise()
    # numpy double reference
    p = np.zeros(3); q = np.array([1.0, 0, 0, 0]); v = np.zeros(3)
    ba = np.zeros(3); bg = np.zeros(3); g = np.array([0, 0, 9.81])
    acc_0 = np.array([0, 0, 9.81]); gyr_0 = np.zeros(3)

    for _ in range(200):
        dt = 0.005
        acc_1 = np.array([0, 0, 9.81]) + RNG.randn(3) * 0.3
        gyr_1 = RNG.randn(3) * 0.2
        state = eskf.predict(state, noise, dt, acc_1, gyr_1)
        un_gyr = 0.5 * (gyr_0 + gyr_1) - bg
        un_acc = 0.5 * (acc_0 + acc_1) - ba
        r_before = _np_quat_to_rot(q)
        q = _np_quat_mul(q, _np_exp_quat(un_gyr * dt))
        q /= np.linalg.norm(q)
        p = p + v * dt
        v = v + r_before @ un_acc * dt - g * dt
        acc_0, gyr_0 = acc_1, gyr_1

    assert np.allclose(state.p, p, atol=1e-3)
    assert np.allclose(state.v, v, atol=1e-3)
    assert np.allclose(_np_quat_to_rot(np.asarray(state.q, np.float64)),
                       _np_quat_to_rot(q), atol=1e-4)


def test_covariance_symmetric_psd():
    state = eskf.init_state()
    noise = _make_noise()
    for _ in range(50):
        state = eskf.predict(state, noise, 0.005,
                             np.array([0.1, -0.2, 9.9]), np.array([0.01, 0.02, -0.01]))
    cov = np.asarray(state.cov, np.float64)
    assert np.allclose(cov, cov.T, atol=1e-4)
    eigvals = np.linalg.eigvalsh(cov)
    assert eigvals.min() > -1e-5


def test_fx_matches_finite_difference():
    """F_x columns (p, theta, v blocks) match numerical error propagation."""
    noise = _make_noise() * 0.0
    base = eskf.init_state()._replace(
        q=lie.exp_so3_quat(jnp.asarray([0.2, -0.1, 0.3], jnp.float32)),
        v=jnp.asarray([1.0, -0.5, 0.2], jnp.float32),
        acc_0=jnp.asarray([0.5, 0.3, 9.6], jnp.float32),
        gyr_0=jnp.asarray([0.1, -0.2, 0.05], jnp.float32))
    dt, acc1, gyr1 = 0.01, np.array([0.4, 0.2, 9.7]), np.array([0.12, -0.18, 0.06])

    def nominal(d_x):
        s = eskf.observe(base, jnp.asarray(d_x, jnp.float32))
        s = s._replace(cov=base.cov, acc_0=base.acc_0, gyr_0=base.gyr_0)
        out = eskf.predict(s, noise, dt, acc1, gyr1)
        return out

    out0 = nominal(np.zeros(17))
    eps = 1e-4
    # Analytic F_x extracted via a zero-noise covariance push of basis vectors:
    state_cov = base._replace(cov=jnp.eye(17))
    f_full = eskf.predict(state_cov, noise, dt, acc1, gyr1).cov
    # F P F^T with P=I gives F F^T; instead recompute F directly via jacobian of
    # the retracted state difference for a few representative columns.
    for idx in [0, 4, 7, 10, 14]:
        d = np.zeros(17); d[idx] = eps
        out1 = nominal(d)
        dp = (np.asarray(out1.p) - np.asarray(out0.p)) / eps
        dth = np.asarray(lie.quat_to_so3(
            lie.quat_mul(lie.quat_conj(out0.q), out1.q))) / eps
        dv = (np.asarray(out1.v) - np.asarray(out0.v)) / eps
        num_col = np.concatenate([dp, dth, dv])
        # analytic column: F_x[:, idx] from the covariance propagation of a
        # rank-one P; recover via F = predict-with-identity trick
        # F F^T is not enough; instead, rebuild F_x from a direct call:
        ana_col = _extract_fx_column(base, noise, dt, acc1, gyr1)[0:9, idx]
        assert np.allclose(num_col, ana_col, atol=5e-2), (idx, num_col, ana_col)


def _extract_fx_column(state, noise, dt, acc1, gyr1):
    """Rebuild the F_x matrix exactly as models.eskf.predict constructs it."""
    un_gyr = 0.5 * (np.asarray(state.gyr_0) + gyr1) - np.asarray(state.bg)
    un_acc = 0.5 * (np.asarray(state.acc_0) + acc1) - np.asarray(state.ba)
    r_before = np.asarray(lie.quat_to_rot(state.q))
    g = np.asarray(state.g)

    def skew(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

    b_x = np.asarray(lie.s2_bx(state.g))
    f_x = np.zeros((17, 17))
    f_x[0:3, 0:3] = np.eye(3)
    f_x[0:3, 6:9] = np.eye(3) * dt
    f_x[3:6, 3:6] = np.eye(3) - skew(un_gyr) * dt
    f_x[3:6, 12:15] = -np.eye(3) * dt
    f_x[6:9, 3:6] = -r_before @ skew(un_acc) * dt
    f_x[6:9, 6:9] = np.eye(3)
    f_x[6:9, 9:12] = -r_before * dt
    f_x[6:9, 15:17] = skew(g) @ b_x * dt
    f_x[9:12, 9:12] = np.eye(3)
    f_x[12:15, 12:15] = np.eye(3)
    f_x[15:17, 15:17] = -(b_x.T @ skew(g) @ skew(g) @ b_x) / (g @ g)
    return f_x


def test_predict_sweep_parallel_matches_scan():
    """The log-depth parallel propagation must reproduce the lax.scan
    formulation (moving state + covariance + recorded valid trajectory)."""
    state = eskf.init_state()
    state = state._replace(
        q=jnp.asarray(lie.quat_normalize(jnp.asarray([0.9, 0.1, -0.2, 0.3],
                                                     jnp.float32))),
        v=jnp.asarray([0.4, -0.2, 0.1], jnp.float32),
        ba=jnp.asarray([0.01, -0.02, 0.005], jnp.float32),
        bg=jnp.asarray([0.002, 0.001, -0.004], jnp.float32),
        acc_0=jnp.asarray([0.1, 0.2, 9.7], jnp.float32),
        gyr_0=jnp.asarray([0.05, -0.02, 0.01], jnp.float32))
    noise = _make_noise()
    # each distinct S compiles both formulations — keep 2 sizes
    # (full/partial validity share the S=64 compile)
    for S, n_valid in ((64, 64), (64, 41), (7, 5)):
        dts = np.full(S, 0.005, np.float32)
        accs = (np.array([0, 0, 9.81]) + RNG.randn(S, 3) * 0.5).astype(np.float32)
        gyrs = (RNG.randn(S, 3) * 0.3).astype(np.float32)
        valid = np.arange(S) < n_valid
        t_rel = np.cumsum(dts).astype(np.float32)
        args = (state, noise, jnp.asarray(t_rel), jnp.asarray(dts),
                jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(valid))
        f_par, tr_par = eskf.predict_sweep(*args)
        f_seq, tr_seq = eskf.predict_sweep_sequential(*args)
        assert np.allclose(f_par.p, f_seq.p, atol=1e-5)
        assert np.allclose(f_par.q, f_seq.q, atol=1e-6)
        assert np.allclose(f_par.v, f_seq.v, atol=1e-5)
        assert np.allclose(f_par.cov, f_seq.cov, atol=1e-5)
        assert np.allclose(f_par.acc_0, f_seq.acc_0)
        assert np.allclose(f_par.gyr_0, f_seq.gyr_0)
        v = valid
        assert np.allclose(tr_par.p[v], tr_seq.p[v], atol=1e-5)
        assert np.allclose(tr_par.q[v], tr_seq.q[v], atol=1e-6)
        assert np.allclose(tr_par.v[v], tr_seq.v[v], atol=1e-5)
        assert np.allclose(tr_par.un_acc[v], tr_seq.un_acc[v], atol=1e-5)
        assert np.allclose(tr_par.un_gyr[v], tr_seq.un_gyr[v], atol=1e-6)


def test_predict_sweep_scan_matches_sequential():
    state = eskf.init_state()
    noise = _make_noise()
    S = 16
    dts = np.full(S, 0.005, np.float32)
    accs = (np.array([0, 0, 9.81]) + RNG.randn(S, 3) * 0.2).astype(np.float32)
    gyrs = (RNG.randn(S, 3) * 0.1).astype(np.float32)
    valid = np.ones(S, bool); valid[-3:] = False
    t_rel = np.cumsum(dts).astype(np.float32)

    final, imu_states = eskf.predict_sweep(
        state, noise, jnp.asarray(t_rel), jnp.asarray(dts),
        jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(valid))

    seq = state
    for i in range(S):
        if valid[i]:
            seq = eskf.predict(seq, noise, dts[i], accs[i], gyrs[i])
    assert np.allclose(final.p, seq.p, atol=1e-5)
    assert np.allclose(final.cov, seq.cov, atol=1e-5)
    # Recorded trajectory at last valid step == final state
    last_valid = int(np.max(np.nonzero(valid)[0]))
    assert np.allclose(imu_states.p[last_valid], seq.p, atol=1e-5)


def test_observe_gravity_norm_preserved():
    state = eskf.init_state()
    d_x = np.zeros(17, np.float32)
    d_x[15:17] = [0.03, -0.02]
    new = eskf.observe(state, jnp.asarray(d_x))
    assert np.allclose(np.linalg.norm(new.g), np.linalg.norm(state.g), atol=1e-5)


def test_imu_initializer():
    ini = eskf.ImuInitializer(9.81)
    t = 0.0
    for i in range(900):
        acc = np.array([0.02, -0.05, 9.80]) + RNG.randn(3) * 0.01
        gyr = np.array([0.002, 0.001, -0.003]) + RNG.randn(3) * 0.001
        ini.push(t, acc, gyr)
        t += 0.005
    assert ini.ready()
    st = ini.build_state(eskf.init_state())
    assert np.allclose(st.bg, [0.002, 0.001, -0.003], atol=1e-3)
    assert np.allclose(np.linalg.norm(st.g), 9.81, atol=1e-6)
    g_dir = np.asarray(st.g) / np.linalg.norm(st.g)
    assert np.allclose(g_dir, [0.02 / 9.8, -0.05 / 9.8, 1.0], atol=5e-3)

    # Too-noisy gyro should not pass the gate (eskfEstimator.cpp:51-61).
    bad = eskf.ImuInitializer(9.81)
    t = 0.0
    for i in range(900):
        bad.push(t, RNG.randn(3) * 2.0 + [0, 0, 9.8], RNG.randn(3) * 1.5)
        t += 0.005
    assert not bad.ready()


def test_observe_pose_direct_update():
    """observe_pose (observePose, eskfEstimator.cpp:232-260): a direct
    6-dof pose measurement with tight noise pulls the state onto the
    measurement, preserves the gravity norm, and contracts covariance."""
    st = eskf.init_state()
    # inflate pose covariance so the measurement dominates
    cov = np.array(st.cov)
    cov[:6, :6] += np.eye(6) * 1.0
    st = st._replace(cov=jnp.asarray(cov, st.cov.dtype))

    t_meas = jnp.asarray([1.0, -2.0, 0.5])
    q_meas = lie.quat_normalize(jnp.asarray([0.98, 0.1, -0.05, 0.15]))
    new = eskf.observe_pose(st, t_meas, q_meas,
                            trans_noise=1e-6, ang_noise=1e-6)
    assert np.allclose(np.asarray(new.p), np.asarray(t_meas), atol=1e-3)
    d_q = lie.quat_mul(lie.quat_conj(q_meas), new.q)
    ang = float(lie.angular_distance_deg(lie.quat_to_so3(d_q)))
    assert ang < 0.5, ang
    assert abs(float(jnp.linalg.norm(new.g)) - 9.81) < 1e-3
    assert float(jnp.trace(new.cov)) < float(jnp.trace(st.cov))
    # covariance stays symmetric PSD
    c = np.asarray(new.cov, np.float64)
    assert np.allclose(c, c.T, atol=1e-6)
    assert np.linalg.eigvalsh(c).min() > -1e-6

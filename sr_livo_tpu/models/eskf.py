"""Error-State Kalman Filter (17-dim) for the LIO backbone.

TPU-native re-derivation of the reference eskfEstimator
(/root/reference/src/eskfEstimator.cpp).  Error state layout (indices):

    [0:3]   dp      position
    [3:6]   dtheta  SO(3) attitude (right perturbation q <- q*exp(dtheta))
    [6:9]   dv      velocity
    [9:12]  dba     accel bias
    [12:15] dbg     gyro bias
    [15:17] dg      gravity on S2 (2-dim tangent)

The nominal state is a pytree of f32 arrays; per-sweep IMU propagation is a
`lax.scan` over padded (dt, acc, gyr, valid) sample arrays with the exact
midpoint integration + F_x/F_w covariance propagation of
eskfEstimator::predict (eskfEstimator.cpp:166-217).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sr_livo_tpu.utils import lie

# IMU static-initialization gates (utility.h:28-31)
MIN_INI_COUNT = 10
MIN_INI_TIME = 3.0
MAX_GYR_VAR = 0.5
MAX_ACC_VAR = 0.6


class EskfState(NamedTuple):
    """Nominal state + covariance + last IMU sample (pytree)."""
    p: jnp.ndarray        # (3,)
    q: jnp.ndarray        # (4,) wxyz
    v: jnp.ndarray        # (3,)
    ba: jnp.ndarray       # (3,)
    bg: jnp.ndarray       # (3,)
    g: jnp.ndarray        # (3,)
    cov: jnp.ndarray      # (17, 17)
    acc_0: jnp.ndarray    # (3,) previous accel sample
    gyr_0: jnp.ndarray    # (3,) previous gyro sample


class ImuStates(NamedTuple):
    """Per-sample propagated IMU trajectory over one sweep (all (S, ...))."""
    t: jnp.ndarray        # (S,) relative time from sweep start
    un_acc: jnp.ndarray   # (S, 3) world-frame net acceleration
    un_gyr: jnp.ndarray   # (S, 3) bias-corrected body rate
    p: jnp.ndarray        # (S, 3)
    q: jnp.ndarray        # (S, 4)
    v: jnp.ndarray        # (S, 3)
    valid: jnp.ndarray    # (S,) bool


def init_state(gravity=(0.0, 0.0, 9.81), dtype=jnp.float32) -> EskfState:
    return EskfState(
        p=jnp.zeros(3, dtype),
        q=lie.quat_identity(dtype=dtype),
        v=jnp.zeros(3, dtype),
        ba=jnp.zeros(3, dtype),
        bg=jnp.zeros(3, dtype),
        g=jnp.asarray(gravity, dtype),
        cov=jnp.eye(17, dtype=dtype),
        acc_0=jnp.asarray(gravity, dtype),
        gyr_0=jnp.zeros(3, dtype),
    )


def noise_diag(acc_cov, gyr_cov, b_acc_cov, b_gyr_cov, dtype=jnp.float32):
    """12-dim process-noise diagonal [na(3), ng(3), nba(3), nbg(3)]."""
    return jnp.concatenate([
        jnp.full(3, acc_cov, dtype), jnp.full(3, gyr_cov, dtype),
        jnp.full(3, b_acc_cov, dtype), jnp.full(3, b_gyr_cov, dtype)])


def noise_diag_np(acc_cov, gyr_cov, b_acc_cov, b_gyr_cov, dtype=np.float32):
    """Host-numpy noise_diag (for constants closed over by jitted code —
    building it on device would force a pathological D2H constant fetch at
    lowering time on this backend; see models.odometry.LioEngine)."""
    return np.concatenate([
        np.full(3, acc_cov, dtype), np.full(3, gyr_cov, dtype),
        np.full(3, b_acc_cov, dtype), np.full(3, b_gyr_cov, dtype)])


def predict(state: EskfState, noise: jnp.ndarray, dt, acc_1, gyr_1) -> EskfState:
    """One midpoint-integration step (eskfEstimator.cpp:166-217)."""
    dtype = state.p.dtype
    dt = jnp.asarray(dt, dtype)
    acc_1 = jnp.asarray(acc_1, dtype)
    gyr_1 = jnp.asarray(gyr_1, dtype)

    un_gyr = 0.5 * (state.gyr_0 + gyr_1) - state.bg
    un_acc = 0.5 * (state.acc_0 + acc_1) - state.ba

    r_before = lie.quat_to_rot(state.q)
    q_new = lie.quat_normalize(lie.quat_mul(state.q, lie.exp_so3_quat(un_gyr * dt)))
    p_new = state.p + state.v * dt
    v_new = state.v + r_before @ un_acc * dt - state.g * dt

    gyr_x = lie.skew(un_gyr)
    acc_x = lie.skew(un_acc)
    b_x = lie.s2_bx(state.g)
    g_x = lie.skew(state.g)
    g_norm_sq = jnp.maximum(jnp.sum(state.g * state.g), 1e-12)
    eye3 = jnp.eye(3, dtype=dtype)

    f_x = jnp.zeros((17, 17), dtype)
    f_x = f_x.at[0:3, 0:3].set(eye3)
    f_x = f_x.at[0:3, 6:9].set(eye3 * dt)
    f_x = f_x.at[3:6, 3:6].set(eye3 - gyr_x * dt)
    f_x = f_x.at[3:6, 12:15].set(-eye3 * dt)
    f_x = f_x.at[6:9, 3:6].set(-r_before @ acc_x * dt)
    f_x = f_x.at[6:9, 6:9].set(eye3)
    f_x = f_x.at[6:9, 9:12].set(-r_before * dt)
    f_x = f_x.at[6:9, 15:17].set(g_x @ b_x * dt)
    f_x = f_x.at[9:12, 9:12].set(eye3)
    f_x = f_x.at[12:15, 12:15].set(eye3)
    f_x = f_x.at[15:17, 15:17].set(-(b_x.T @ g_x @ g_x @ b_x) / g_norm_sq)

    f_w = jnp.zeros((17, 12), dtype)
    f_w = f_w.at[6:9, 0:3].set(-r_before * dt)
    f_w = f_w.at[3:6, 3:6].set(-eye3 * dt)
    f_w = f_w.at[9:12, 6:9].set(-eye3 * dt)
    f_w = f_w.at[12:15, 9:12].set(-eye3 * dt)

    cov_new = f_x @ state.cov @ f_x.T + (f_w * noise[None, :]) @ f_w.T

    return state._replace(p=p_new, q=q_new, v=v_new, cov=cov_new,
                          acc_0=acc_1, gyr_0=gyr_1)


def predict_sweep_sequential(state: EskfState, noise: jnp.ndarray,
                             t_rel: jnp.ndarray, dts: jnp.ndarray,
                             accs: jnp.ndarray, gyrs: jnp.ndarray,
                             valid: jnp.ndarray
                             ) -> Tuple[EskfState, ImuStates]:
    """Propagate through a padded per-sweep IMU batch via `lax.scan`.

    Mirrors run()'s per-sweep IMU loop (lioOptimization.cpp:1489-1569): each
    valid sample advances the filter; the recorded `ImuStates` trajectory
    feeds motion undistortion.  Invalid (padding) samples are passed through
    unchanged and their recorded slot repeats the previous state.

    Reference implementation for `predict_sweep` (the log-depth parallel
    formulation used on TPU); kept for cross-checking.
    """
    def step(s: EskfState, x):
        dt, acc, gyr, ok = x
        # Recorded un_acc/un_gyr mirror run()'s imuState capture
        # (lioOptimization.cpp:1525-1526): interval-start rotation, no
        # gravity subtraction (the <0.5 mm undistortion effect of g over one
        # IMU interval is ignored by the reference too).
        un_gyr = 0.5 * (s.gyr_0 + gyr) - s.bg
        un_acc = lie.quat_to_rot(s.q) @ (0.5 * (s.acc_0 + acc) - s.ba)
        s_next = predict(s, noise, dt, acc, gyr)
        s_next = jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), s_next, s)
        out = (s_next.p, s_next.q, s_next.v, un_gyr, un_acc)
        return s_next, out

    final, (ps, qs, vs, un_gyrs, un_accs) = jax.lax.scan(
        step, state, (dts, accs, gyrs, valid))
    imu_states = ImuStates(t=t_rel, un_acc=un_accs, un_gyr=un_gyrs,
                           p=ps, q=qs, v=vs, valid=valid)
    return final, imu_states


def predict_sweep(state: EskfState, noise: jnp.ndarray,
                  t_rel: jnp.ndarray, dts: jnp.ndarray, accs: jnp.ndarray,
                  gyrs: jnp.ndarray, valid: jnp.ndarray
                  ) -> Tuple[EskfState, ImuStates]:
    """Log-depth parallel formulation of `predict_sweep_sequential`.

    The reference propagates sample-by-sample (lioOptimization.cpp:1489-1569)
    — an inherently serial chain that maps terribly onto wide SIMD hardware.
    The same midpoint integration decomposes exactly into parallel primitives:

      * orientation: the per-step increments dq_k = exp(un_gyr_k dt_k) depend
        only on the (constant-per-sweep) gyro bias, so the orientation chain
        is an `associative_scan` of quaternion products;
      * velocity/position: with all rotations known, dv_k and v_{k-1} dt_k
        are element-wise terms closed by two cumulative sums;
      * covariance: P_{k+1} = F_k P_k F_k^T + Q_k composes associatively as
        (F2,Q2)∘(F1,Q1) = (F2 F1, F2 Q1 F2^T + Q2); only the sweep-end
        covariance is needed, so a log2(S) tree reduction of batched 17x17
        matmuls replaces S serial matrix products.

    Padding samples are handled by forcing dt=0 (identity mean step) and
    (F,Q)=(I,0).  Results match the sequential scan to f32 round-off.
    """
    dtype = state.p.dtype
    S = dts.shape[0]
    dt = jnp.where(valid, dts, 0.0).astype(dtype)

    # Midpoint IMU samples: prev sample chain (acc_0/gyr_0 seeds slot 0).
    acc_prev = jnp.concatenate([state.acc_0[None], accs[:-1]], axis=0)
    gyr_prev = jnp.concatenate([state.gyr_0[None], gyrs[:-1]], axis=0)
    un_gyr = 0.5 * (gyr_prev + gyrs) - state.bg            # (S, 3)
    un_acc_body = 0.5 * (acc_prev + accs) - state.ba       # (S, 3)

    # Orientation prefix products.
    dq = lie.exp_so3_quat(un_gyr * dt[:, None])            # identity when dt=0
    q_prefix = jax.lax.associative_scan(lie.quat_mul, dq)  # (S, 4)
    q_post = lie.quat_normalize(
        lie.quat_mul(jnp.broadcast_to(state.q, (S, 4)), q_prefix))
    q_pre = jnp.concatenate([state.q[None], q_post[:-1]], axis=0)
    r_pre = lie.quat_to_rot(q_pre)                         # (S, 3, 3)

    # Velocity / position cumulative sums (v_new uses r_before; p_new uses
    # the pre-step velocity — exactly the sequential update order).
    un_acc_world = jnp.einsum("sij,sj->si", r_pre, un_acc_body)
    dv = (un_acc_world - state.g[None, :]) * dt[:, None]
    v_post = state.v[None, :] + jnp.cumsum(dv, axis=0)
    v_pre = jnp.concatenate([state.v[None], v_post[:-1]], axis=0)
    p_post = state.p[None, :] + jnp.cumsum(v_pre * dt[:, None], axis=0)

    # Covariance: batched F_k / Q_k then a tree reduction.
    gyr_x = lie.skew(un_gyr)
    acc_x = lie.skew(un_acc_body)
    b_x = lie.s2_bx(state.g)
    g_x = lie.skew(state.g)
    g_norm_sq = jnp.maximum(jnp.sum(state.g * state.g), 1e-12)
    eye3 = jnp.eye(3, dtype=dtype)
    eyeS = jnp.broadcast_to(eye3, (S, 3, 3))

    f = jnp.zeros((S, 17, 17), dtype)
    f = f.at[:, 0:3, 0:3].set(eyeS)
    f = f.at[:, 0:3, 6:9].set(eyeS * dt[:, None, None])
    f = f.at[:, 3:6, 3:6].set(eyeS - gyr_x * dt[:, None, None])
    f = f.at[:, 3:6, 12:15].set(-eyeS * dt[:, None, None])
    f = f.at[:, 6:9, 3:6].set(-jnp.einsum("sij,sjk->sik", r_pre, acc_x)
                              * dt[:, None, None])
    f = f.at[:, 6:9, 6:9].set(eyeS)
    f = f.at[:, 6:9, 9:12].set(-r_pre * dt[:, None, None])
    f = f.at[:, 6:9, 15:17].set(
        jnp.broadcast_to((g_x @ b_x)[None], (S, 3, 2)) * dt[:, None, None])
    f = f.at[:, 9:12, 9:12].set(eyeS)
    f = f.at[:, 12:15, 12:15].set(eyeS)
    s2_blk = -(b_x.T @ g_x @ g_x @ b_x) / g_norm_sq
    f = f.at[:, 15:17, 15:17].set(jnp.broadcast_to(s2_blk[None], (S, 2, 2)))
    # Padding samples: F = I (dt=0 already zeroes the off-diagonal dt terms,
    # but the S2 block is dt-free — force the whole row to identity).
    f = jnp.where(valid[:, None, None], f,
                  jnp.broadcast_to(jnp.eye(17, dtype=dtype), (S, 17, 17)))

    fw = jnp.zeros((S, 17, 12), dtype)
    fw = fw.at[:, 6:9, 0:3].set(-r_pre * dt[:, None, None])
    fw = fw.at[:, 3:6, 3:6].set(-eyeS * dt[:, None, None])
    fw = fw.at[:, 9:12, 6:9].set(-eyeS * dt[:, None, None])
    fw = fw.at[:, 12:15, 9:12].set(-eyeS * dt[:, None, None])
    q_noise = jnp.einsum("sij,j,skj->sik", fw, noise.astype(dtype), fw)
    q_noise = jnp.where(valid[:, None, None], q_noise, 0.0)

    # Tree reduction of (F, Q) composition (S must be a power of two for the
    # halving loop; pad with identity otherwise).
    if S & (S - 1):
        pad = 1 << (S - 1).bit_length()
        f = jnp.concatenate(
            [f, jnp.broadcast_to(jnp.eye(17, dtype=dtype),
                                 (pad - S, 17, 17))], axis=0)
        q_noise = jnp.concatenate(
            [q_noise, jnp.zeros((pad - S, 17, 17), dtype)], axis=0)
    while f.shape[0] > 1:
        f1, f2 = f[0::2], f[1::2]
        q1, q2 = q_noise[0::2], q_noise[1::2]
        f = jnp.einsum("sij,sjk->sik", f2, f1)
        q_noise = jnp.einsum("sij,sjk,slk->sil", f2, q1, f2) + q2
    f_tot, q_tot = f[0], q_noise[0]
    cov_new = f_tot @ state.cov @ f_tot.T + q_tot

    # Final nominal state + last-sample bookkeeping (suffix padding: the
    # last valid sample's raw IMU values become acc_0/gyr_0).
    n_valid = jnp.sum(valid.astype(jnp.int32))
    any_valid = n_valid > 0
    idx_last = jnp.maximum(n_valid - 1, 0)
    final = state._replace(
        p=jnp.where(any_valid, p_post[idx_last], state.p),
        q=jnp.where(any_valid, q_post[idx_last], state.q),
        v=jnp.where(any_valid, v_post[idx_last], state.v),
        cov=jnp.where(any_valid, cov_new, state.cov),
        acc_0=jnp.where(any_valid, accs[idx_last], state.acc_0),
        gyr_0=jnp.where(any_valid, gyrs[idx_last], state.gyr_0))

    # Recorded trajectory: padding slots repeat the last valid state (the
    # dt=0 identity step does this for p/q/v automatically).
    un_acc_rec = jnp.einsum("sij,sj->si", r_pre, un_acc_body)
    imu_states = ImuStates(t=t_rel, un_acc=un_acc_rec, un_gyr=un_gyr,
                           p=p_post, q=q_post, v=v_post, valid=valid)
    return final, imu_states


def observe(state: EskfState, d_x: jnp.ndarray) -> EskfState:
    """Inject a 17-dim error-state correction (eskfEstimator.cpp:219-230)."""
    p = state.p + d_x[0:3]
    q = lie.quat_normalize(lie.quat_mul(state.q, lie.exp_so3_quat(d_x[3:6])))
    v = state.v + d_x[6:9]
    ba = state.ba + d_x[9:12]
    bg = state.bg + d_x[12:15]
    b_x = lie.s2_bx(state.g)
    so3_dg = b_x @ d_x[15:17]
    g = lie.exp_so3(so3_dg) @ state.g
    return state._replace(p=p, q=q, v=v, ba=ba, bg=bg, g=g)


def observe_pose(state: EskfState, translation: jnp.ndarray,
                 rotation_q: jnp.ndarray, trans_noise: float = 0.001,
                 ang_noise: float = 0.001) -> EskfState:
    """Direct pose observation update (eskfEstimator::observePose,
    eskfEstimator.cpp:232-260; unused by the reference main path but part
    of its public API).  Applies a 6-dim pose measurement with the
    inverse-right-Jacobian attitude H block and resets the error state."""
    dtype = state.p.dtype
    h = jnp.zeros((6, 17), dtype)
    h = h.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
    so3 = lie.quat_to_so3(state.q)
    h = h.at[3:6, 3:6].set(lie.inv_jr_so3(so3))

    v_diag = jnp.concatenate([jnp.full(3, trans_noise, dtype),
                              jnp.full(3, ang_noise, dtype)])
    s = h @ state.cov @ h.T + jnp.diag(v_diag)
    k = state.cov @ h.T @ jnp.linalg.inv(s)

    upd_q = lie.quat_mul(lie.quat_conj(state.q), rotation_q)
    upd = jnp.concatenate([translation - state.p, lie.quat_to_so3(upd_q)])
    d_x = k @ upd

    # updateAndReset (eskfEstimator.cpp:262-284)
    new = state._replace(
        p=state.p + d_x[0:3],
        q=lie.quat_normalize(lie.quat_mul(state.q, lie.exp_so3_quat(d_x[3:6]))),
        v=state.v + d_x[6:9],
        ba=state.ba + d_x[9:12],
        bg=state.bg + d_x[12:15],
        g=state.g + lie.s2_bx(state.g) @ d_x[15:17])
    cov = (jnp.eye(17, dtype=dtype) - k @ h) @ state.cov
    j = jnp.eye(17, dtype=dtype).at[3:6, 3:6].set(
        jnp.eye(3, dtype=dtype) - 0.5 * lie.skew(d_x[3:6]))
    return new._replace(cov=j @ cov @ j.T)


class ImuInitializer:
    """Host-side static IMU initialization (eskfEstimator.cpp:43-118).

    Accumulates running mean/variance of (gyr, acc) while stationary; once
    >= MIN_INI_COUNT samples spanning >= MIN_INI_TIME seconds arrive with
    acceptable noise levels, produces gyro bias + gravity direction and the
    shrunk initial covariance.
    """

    def __init__(self, g_norm: float = 9.81):
        self.g_norm = float(g_norm)
        self.n = 1
        self.first_time = None
        self.last_time = None
        self.mean_gyr = np.zeros(3)
        self.mean_acc = np.array([0.0, 0.0, 9.81])
        self.var_gyr = np.zeros(3)
        self.var_acc = np.zeros(3)
        self.done = False

    def push(self, t: float, acc: np.ndarray, gyr: np.ndarray):
        acc = np.asarray(acc, np.float64)
        gyr = np.asarray(gyr, np.float64)
        if self.first_time is None:
            self.first_time = t
            self.mean_gyr = gyr.copy()
            self.mean_acc = acc.copy()
            self.var_gyr = np.zeros(3)
            self.var_acc = np.zeros(3)
            self.n = 1
        self.last_time = t
        n = self.n
        self.mean_gyr += (gyr - self.mean_gyr) / n
        self.mean_acc += (acc - self.mean_acc) / n
        self.var_gyr = (self.var_gyr * (n - 1.0) / n
                        + (gyr - self.mean_gyr) ** 2 * (n - 1.0) / (n * n))
        self.var_acc = (self.var_acc * (n - 1.0) / n
                        + (acc - self.mean_acc) ** 2 * (n - 1.0) / (n * n))
        self.n += 1

    def ready(self) -> bool:
        if self.first_time is None or self.n <= MIN_INI_COUNT:
            return False
        if (self.last_time - self.first_time) <= MIN_INI_TIME:
            return False
        acc_var = self.var_acc * (self.g_norm / np.linalg.norm(self.mean_acc)) ** 2
        if np.linalg.norm(self.var_gyr) > MAX_GYR_VAR:
            return False
        if np.linalg.norm(acc_var) > MAX_ACC_VAR:
            return False
        return True

    def build_state(self, state: EskfState) -> EskfState:
        """Apply bias/gravity estimates + covariance shrink to `state`."""
        init_bg = self.mean_gyr
        init_g = self.mean_acc / np.linalg.norm(self.mean_acc) * self.g_norm
        cov = np.eye(17, dtype=np.float32)
        cov[9:12, 9:12] *= 0.001
        cov[12:15, 12:15] *= 0.0001
        cov[15:17, 15:17] *= 0.00001
        dtype = state.p.dtype
        return state._replace(
            bg=jnp.asarray(init_bg, dtype),
            g=jnp.asarray(init_g, dtype),
            cov=jnp.asarray(cov, dtype))

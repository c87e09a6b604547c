"""SO(3) / S2 Lie-group math, batched and jit-friendly.

TPU-native re-derivation of the reference `numType` helpers
(/root/reference/include/utility.h:191-402).  Every function accepts
arbitrary leading batch dimensions and is safe under `jax.jit` / `vmap`
(no data-dependent branching; small-angle cases are handled with
`jnp.where` over numerically-safe operands).

Quaternions are stored as `[..., 4]` arrays in (w, x, y, z) order.
"""

from __future__ import annotations

import jax.numpy as jnp

# Small-angle threshold, mirroring THETA_THRESHOLD in utility.h:27.
_THETA_EPS = 1e-4


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric (hat) matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(m: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 3]; inverse of `skew` for skew-symmetric input."""
    return jnp.stack(
        [m[..., 2, 1] - m[..., 1, 2],
         m[..., 0, 2] - m[..., 2, 0],
         m[..., 1, 0] - m[..., 0, 1]],
        axis=-1,
    ) * 0.5


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_identity(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    q = jnp.zeros(batch_shape + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, 1e-20)


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q (active rotation, R(q) @ v)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] (w, x, y, z), branch-free Shepperd method."""
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best one.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-20)) * 0.5

    c0 = jnp.stack([qw[..., 0],
                    (m21 - m12) / (4 * qw[..., 0]),
                    (m02 - m20) / (4 * qw[..., 0]),
                    (m10 - m01) / (4 * qw[..., 0])], axis=-1)
    c1 = jnp.stack([(m21 - m12) / (4 * qw[..., 1]),
                    qw[..., 1],
                    (m01 + m10) / (4 * qw[..., 1]),
                    (m02 + m20) / (4 * qw[..., 1])], axis=-1)
    c2 = jnp.stack([(m02 - m20) / (4 * qw[..., 2]),
                    (m01 + m10) / (4 * qw[..., 2]),
                    qw[..., 2],
                    (m12 + m21) / (4 * qw[..., 2])], axis=-1)
    c3 = jnp.stack([(m10 - m01) / (4 * qw[..., 3]),
                    (m02 + m20) / (4 * qw[..., 3]),
                    (m12 + m21) / (4 * qw[..., 3]),
                    qw[..., 3]], axis=-1)

    idx = jnp.argmax(jnp.stack([tr, m00, m11, m22], axis=-1), axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32)
                            .repeat(4, axis=-1), axis=-2)[..., 0, :]
    # Canonical sign: w >= 0.
    q = jnp.where(q[..., :1] < 0, -q, q)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# Exponential / logarithm maps
# ---------------------------------------------------------------------------

def _theta_safe(w: jnp.ndarray):
    theta = jnp.linalg.norm(w, axis=-1)
    small = theta < _THETA_EPS
    theta_safe = jnp.where(small, jnp.ones_like(theta), theta)
    return theta, theta_safe, small


def exp_so3_quat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) vector -> unit quaternion (reference so3ToQuat, utility.h:300)."""
    theta, theta_safe, small = _theta_safe(w)
    u = w / theta_safe[..., None]
    half = 0.5 * theta
    big = jnp.concatenate(
        [jnp.cos(half)[..., None], u * jnp.sin(half)[..., None]], axis=-1)
    small_q = jnp.concatenate(
        [jnp.ones_like(theta)[..., None], 0.5 * w], axis=-1)
    return quat_normalize(jnp.where(small[..., None], small_q, big))


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) vector -> rotation matrix (Rodrigues; reference so3ToRotation)."""
    theta, theta_safe, small = _theta_safe(w)
    wx = skew(w)
    wx2 = wx @ wx
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), wx.shape)
    # Taylor for small angles: I + wx + 0.5 wx^2
    small_r = eye + wx + 0.5 * wx2
    a = (jnp.sin(theta_safe) / theta_safe)[..., None, None]
    b = ((1.0 - jnp.cos(theta_safe)) / (theta_safe * theta_safe))[..., None, None]
    big_r = eye + a * wx + b * wx2
    return jnp.where(small[..., None, None], small_r, big_r)


def log_so3(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> so(3) vector (reference rotationToSo3)."""
    tr = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w_raw = jnp.stack(
        [r[..., 2, 1] - r[..., 1, 2],
         r[..., 0, 2] - r[..., 2, 0],
         r[..., 1, 0] - r[..., 0, 1]],
        axis=-1,
    )
    small = theta < _THETA_EPS
    sin_theta_safe = jnp.where(small, jnp.ones_like(theta), jnp.sin(theta))
    # Near theta = pi, sin(theta) -> 0; clamp for safety (rare in tracking).
    sin_theta_safe = jnp.where(
        jnp.abs(sin_theta_safe) < 1e-7,
        jnp.full_like(sin_theta_safe, 1e-7), sin_theta_safe)
    big = w_raw * (theta / (2.0 * sin_theta_safe))[..., None]
    return jnp.where(small[..., None], 0.5 * w_raw, big)


def quat_to_so3(q: jnp.ndarray) -> jnp.ndarray:
    return log_so3(quat_to_rot(q))


# ---------------------------------------------------------------------------
# Left / right Jacobians of SO(3)
# ---------------------------------------------------------------------------

def _jl_core(w: jnp.ndarray, sign: float) -> jnp.ndarray:
    theta, theta_safe, small = _theta_safe(w)
    u = w / theta_safe[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), w.shape[:-1] + (3, 3))
    uut = u[..., :, None] * u[..., None, :]
    s = jnp.sin(theta_safe) / theta_safe
    c = (1.0 - jnp.cos(theta_safe)) / theta_safe
    big = (s[..., None, None] * eye
           + (1.0 - s)[..., None, None] * uut
           + sign * c[..., None, None] * skew(u))
    small_j = eye + sign * 0.5 * skew(w)
    return jnp.where(small[..., None, None], small_j, big)


def jl_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian (reference JleftSo3)."""
    return _jl_core(w, +1.0)


def jr_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian (reference JrightSo3)."""
    return _jl_core(w, -1.0)


def _inv_jl_core(w: jnp.ndarray, sign: float) -> jnp.ndarray:
    theta, theta_safe, small = _theta_safe(w)
    u = w / theta_safe[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), w.shape[:-1] + (3, 3))
    uut = u[..., :, None] * u[..., None, :]
    half_cot = 0.5 * theta_safe / jnp.tan(0.5 * theta_safe)
    big = (half_cot[..., None, None] * eye
           + (1.0 - half_cot)[..., None, None] * uut
           - sign * 0.5 * skew(w))
    wwt = w[..., :, None] * w[..., None, :]
    small_j = (jnp.cos(0.5 * theta)[..., None, None] * eye
               + 0.125 * wwt - sign * 0.5 * skew(w))
    return jnp.where(small[..., None, None], small_j, big)


def inv_jl_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian (reference invJleftSo3)."""
    return _inv_jl_core(w, +1.0)


def inv_jr_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian (reference invJrightSo3)."""
    return _inv_jl_core(w, -1.0)


# ---------------------------------------------------------------------------
# S2 (gravity) manifold
# ---------------------------------------------------------------------------

def s2_bx(g: jnp.ndarray) -> jnp.ndarray:
    """Tangent basis B_x in R^{3x2} of the S2 gravity manifold.

    Mirrors reference derivativeS2 (utility.h:215-233).  Singular at
    g_z == -|g| (gravity exactly antipodal to +z), which does not occur
    for upright IMU mounting conventions used by the reference configs.
    """
    gn = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-20)
    g0, g1, g2 = gn[..., 0], gn[..., 1], gn[..., 2]
    denom = 1.0 + g2
    denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    b00 = 1.0 - g0 * g0 / denom
    b01 = -g0 * g1 / denom
    b11 = 1.0 - g1 * g1 / denom
    row0 = jnp.stack([b00, b01], axis=-1)
    row1 = jnp.stack([b01, b11], axis=-1)
    row2 = jnp.stack([-g0, -g1], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rot_from_v1_to_v2(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix taking unit(v1) to unit(v2) (reference rotFromV1toV2)."""
    a = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=-1, keepdims=True), 1e-20)
    b = v2 / jnp.maximum(jnp.linalg.norm(v2, axis=-1, keepdims=True), 1e-20)
    cross = jnp.cross(a, b)
    dot = jnp.sum(a * b, axis=-1)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v1.dtype), a.shape[:-1] + (3, 3))
    sk = skew(cross)
    cross_sq = jnp.sum(cross * cross, axis=-1)
    denom = jnp.where(cross_sq < 1e-20, 1.0, cross_sq)
    big = eye + sk + (sk @ sk) * ((1.0 - dot) / denom)[..., None, None]
    near_id = (jnp.abs(1.0 - dot) < 1e-6)[..., None, None]
    return jnp.where(near_id, eye, big)


def angular_distance_deg(d_so3: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle of exp(d_so3) in degrees (reference AngularDistance)."""
    r = exp_so3(d_so3)
    tr = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    c = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arccos(c) * (180.0 / jnp.pi)


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Batched quaternion slerp with shortest-path sign correction.

    `alpha` broadcasts against the quaternion batch dims.
    """
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    small = dot > 1.0 - 1e-6
    sin_theta = jnp.where(small, jnp.ones_like(theta), jnp.sin(theta))
    a = jnp.asarray(alpha, q0.dtype)
    if a.ndim < q0.ndim:
        a = a[..., None]
    w0 = jnp.where(small, 1.0 - a, jnp.sin((1.0 - a) * theta) / sin_theta)
    w1 = jnp.where(small, a, jnp.sin(a * theta) / sin_theta)
    return quat_normalize(w0 * q0 + w1 * q1)

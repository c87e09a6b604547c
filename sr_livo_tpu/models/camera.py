"""Camera-parameter ESIKFs: 11-dof reprojection + 6-dof photometric.

TPU-native re-derivation of the vision filters in
/root/reference/src/imageProcessing.cpp: `vio_esikf` (vioEsikf, :220-380)
iterates the 11-dim camera error state [td, so3_ic(3), t_ic(3), fx, fy,
cx, cy] on pixel reprojection residuals of tracked map points;
`vio_photometric` (vioPhotometric, :402-552) iterates the 6-dim extrinsic
block on RGB photometric residuals weighted by per-point color
information.  Both are fixed-iteration masked batch programs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sr_livo_tpu.ops import image_ops
from sr_livo_tpu.utils import lie

MIN_ITERATION_POINTS = 10      # imageProcessing.cpp:218
NUM_ITERATIONS = 2             # imageProcessing.cpp:20


class CameraState(NamedTuple):
    td: jnp.ndarray       # () time offset
    q_ic: jnp.ndarray     # (4,) R_imu_camera as quaternion (wxyz)
    t_ic: jnp.ndarray     # (3,)
    intr: jnp.ndarray     # (4,) fx, fy, cx, cy
    cov: jnp.ndarray      # (11, 11)


def init_camera_state(r_ic, t_ic, intr, dtype=jnp.float32) -> CameraState:
    """Initial covariance per setInitialCov (imageProcessing.cpp:65-72)."""
    cov = jnp.eye(11, dtype=dtype)
    cov = cov.at[0, 0].set(1e-5)
    cov = cov.at[1:7, 1:7].set(jnp.eye(6, dtype=dtype) * 1e-3)
    cov = cov.at[7:11, 7:11].set(jnp.eye(4, dtype=dtype) * 1e-3)
    return CameraState(
        td=jnp.zeros((), dtype),
        q_ic=lie.rot_to_quat(jnp.asarray(r_ic, dtype)),
        t_ic=jnp.asarray(t_ic, dtype),
        intr=jnp.asarray(intr, dtype),
        cov=cov)


def world_camera_pose(cam: CameraState, q_wi: jnp.ndarray, t_wi: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                 jnp.ndarray]:
    """(q_wc, t_wc, q_cw, t_cw) from the IMU pose and extrinsic."""
    q_wc = lie.quat_normalize(lie.quat_mul(q_wi, cam.q_ic))
    t_wc = lie.quat_rotate(q_wi, cam.t_ic) + t_wi
    q_cw = lie.quat_conj(q_wc)
    t_cw = -lie.quat_rotate(q_cw, t_wc)
    return q_wc, t_wc, q_cw, t_cw


def huber_scale(r: jnp.ndarray, thresh: float = 1.0) -> jnp.ndarray:
    """getHuberLoss (imageProcessing.cpp:202-216)."""
    r_safe = jnp.maximum(r, 1e-9)
    big = (2.0 * jnp.sqrt(r_safe) / jnp.sqrt(thresh) - 1.0) / r_safe
    return jnp.where(r / thresh < 1.0, 1.0, big)


def measurement_weight(n_new_visited) -> jnp.ndarray:
    """cam_measurement_weight (imageProcessing.cpp:272)."""
    nv = jnp.maximum(jnp.asarray(n_new_visited, jnp.float32), 1.0)
    return jnp.clip(5.0 / nv, 0.001, 0.01)


def _camera_projection_blocks(cam: CameraState, pts_world, q_cw, t_cw):
    """Shared projection + Jacobian pieces: (uv, pc, j_u_pc)."""
    n = pts_world.shape[0]
    pc = lie.quat_rotate(jnp.broadcast_to(q_cw, (n, 4)), pts_world) + t_cw
    z = jnp.maximum(pc[..., 2], 1e-3)
    fx, fy, cx, cy = cam.intr[0], cam.intr[1], cam.intr[2], cam.intr[3]
    u = pc[..., 0] * fx / z + cx
    v = pc[..., 1] * fy / z + cy
    uv = jnp.stack([u, v], axis=-1)
    zeros = jnp.zeros_like(z)
    j_u_pc = jnp.stack([
        jnp.stack([fx / z, zeros, -fx * pc[..., 0] / (z * z)], axis=-1),
        jnp.stack([zeros, fy / z, -fy * pc[..., 1] / (z * z)], axis=-1)],
        axis=-2)                                            # (N, 2, 3)
    return uv, pc, j_u_pc


@functools.partial(jax.jit, static_argnames=("estimate_intrinsic",
                                             "estimate_extrinsic"))
def vio_esikf(cam: CameraState, q_wi: jnp.ndarray, t_wi: jnp.ndarray,
              pts_world: jnp.ndarray, px_match: jnp.ndarray,
              img_vel: jnp.ndarray, valid: jnp.ndarray,
              n_new_visited, *, estimate_intrinsic: bool = True,
              estimate_extrinsic: bool = True
              ) -> Tuple[CameraState, jnp.ndarray]:
    """11-dof reprojection ESIKF (vioEsikf).  Returns (new_cam, ok)."""
    dtype = cam.cov.dtype
    m = pts_world.shape[0]
    n_valid = jnp.sum(valid)
    ok = n_valid >= MIN_ITERATION_POINTS
    w = measurement_weight(n_new_visited)

    pred = cam  # linearization point for d_x

    def iteration(carry, _):
        c = carry
        _, _, q_cw, t_cw = world_camera_pose(c, q_wi, t_wi)
        uv, pc, j_u_pc = _camera_projection_blocks(c, pts_world, q_cw, t_cw)
        proj = uv + c.td * img_vel
        res = proj - px_match                                 # (M, 2)
        rnorm = jnp.linalg.norm(res, axis=-1)
        h_l = huber_scale(rnorm)
        vmask = valid.astype(dtype)

        r_ic = lie.quat_to_rot(c.q_ic)
        h_rows = jnp.zeros((m, 2, 11), dtype)
        h_rows = h_rows.at[:, :, 0].set(img_vel)
        if estimate_extrinsic:
            h_rows = h_rows.at[:, :, 1:4].set(
                jnp.einsum("nij,njk->nik", j_u_pc, lie.skew(pc)))
            h_rows = h_rows.at[:, :, 4:7].set(
                -jnp.einsum("nij,jk->nik", j_u_pc, r_ic.T))
        if estimate_intrinsic:
            z = jnp.maximum(pc[..., 2], 1e-3)
            j_u_k = jnp.zeros((m, 2, 4), dtype)
            j_u_k = j_u_k.at[:, 0, 0].set(pc[..., 0] / z)
            j_u_k = j_u_k.at[:, 1, 1].set(pc[..., 1] / z)
            j_u_k = j_u_k.at[:, 0, 2].set(1.0)
            j_u_k = j_u_k.at[:, 1, 3].set(1.0)
            h_rows = h_rows.at[:, :, 7:11].set(j_u_k)

        scale = (h_l * vmask)[:, None, None]
        h_mat = (h_rows * scale).reshape(2 * m, 11)
        r_vec = (res * (h_l * vmask)[:, None]).reshape(2 * m)

        d_td = c.td - pred.td
        d_so3 = lie.quat_to_so3(lie.quat_mul(lie.quat_conj(pred.q_ic), c.q_ic))
        d_p = c.t_ic - pred.t_ic
        d_in = c.intr - pred.intr
        d_x = jnp.concatenate([d_td[None], d_so3, d_p, d_in])

        j0 = jnp.eye(11, dtype=dtype).at[1:4, 1:4].set(
            jnp.eye(3, dtype=dtype) - 0.5 * lie.skew(d_so3))

        hth = h_mat.T @ h_mat
        prior = jnp.linalg.inv(j0 @ cam.cov @ j0.T * w)
        kk = jnp.linalg.inv(hth + prior)                       # (11, 11)
        k_h = kk @ (h_mat.T @ r_vec)
        k_hmat = kk @ hth                                      # K H
        sol = -k_h - (jnp.eye(11, dtype=dtype) - k_hmat) @ (j0 @ d_x)

        c_new = _update_camera(c, sol)
        return c_new, (sol, k_hmat)

    cam_it, (sols, k_hmats) = jax.lax.scan(
        iteration, cam, None, length=NUM_ITERATIONS)
    sol_last = sols[-1]
    k_hmat_last = k_hmats[-1]
    j_k = jnp.eye(11, dtype=dtype).at[1:4, 1:4].set(
        jnp.eye(3, dtype=dtype) - 0.5 * lie.skew(sol_last[1:4]))
    cov_new = j_k @ (jnp.eye(11, dtype=dtype) - k_hmat_last) @ cam.cov @ j_k.T
    cam_new = cam_it._replace(cov=cov_new)

    out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(ok, a, b), cam_new, cam)
    return out, ok


def _update_camera(c: CameraState, d_x: jnp.ndarray) -> CameraState:
    """updateCameraParameters 11-dof (imageProcessing.cpp:382-400)."""
    return c._replace(
        td=c.td + d_x[0],
        q_ic=lie.quat_normalize(
            lie.quat_mul(c.q_ic, lie.exp_so3_quat(d_x[1:4]))),
        t_ic=c.t_ic + d_x[4:7],
        intr=c.intr + d_x[7:11])


def color_gradient(image: jnp.ndarray, uv: jnp.ndarray, ssd: int = 5
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Subpixel color + finite-difference gradients
    (cloudFrame::getRgb, lioOptimization.cpp:99-140)."""
    c0 = image_ops.bilinear_sample(image, uv)
    dx = jnp.zeros_like(c0)
    dy = jnp.zeros_like(c0)
    denom = 0.0
    for b in range(1, ssd):
        off = jnp.asarray([b, 0.0], uv.dtype)
        dx = dx + image_ops.bilinear_sample(image, uv + off) \
            - image_ops.bilinear_sample(image, uv - off)
        offv = jnp.asarray([0.0, b], uv.dtype)
        dy = dy + image_ops.bilinear_sample(image, uv + offv) \
            - image_ops.bilinear_sample(image, uv - offv)
        denom += 2 * b
    return c0, dx / denom, dy / denom


@jax.jit
def vio_photometric(cam: CameraState, q_wi: jnp.ndarray, t_wi: jnp.ndarray,
                    image: jnp.ndarray,
                    pts_world: jnp.ndarray, pt_rgb: jnp.ndarray,
                    pt_rgb_cov: jnp.ndarray, pt_n_rgb: jnp.ndarray,
                    img_vel: jnp.ndarray, valid: jnp.ndarray,
                    n_new_visited) -> Tuple[CameraState, jnp.ndarray]:
    """6-dof photometric ESIKF (vioPhotometric).  Returns (new_cam, ok)."""
    dtype = cam.cov.dtype
    m = pts_world.shape[0]
    use = valid & (pt_n_rgb >= 3)                  # imageProcessing.cpp:465
    ok = jnp.sum(use) >= MIN_ITERATION_POINTS
    w = measurement_weight(n_new_visited)
    pred = cam

    def iteration(carry, _):
        c = carry
        _, _, q_cw, t_cw = world_camera_pose(c, q_wi, t_wi)
        uv, pc, j_u_pc = _camera_projection_blocks(c, pts_world, q_cw, t_cw)
        proj = uv + c.td * img_vel
        obs, g_dx, g_dy = color_gradient(image, proj)
        res = obs - pt_rgb                         # (M, 3)
        h_l = huber_scale(jnp.linalg.norm(res, axis=-1))
        vmask = use.astype(dtype)

        info = 1.0 / jnp.maximum(pt_rgb_cov, 1e-4)  # (M, 3) diag R^-1
        j_color_u = jnp.stack([g_dx, g_dy], axis=-1)         # (M, 3, 2)
        j_color_pc = jnp.einsum("nij,njk->nik", j_color_u, j_u_pc)  # (M,3,3)
        r_ic = lie.quat_to_rot(c.q_ic)
        h_rows = jnp.concatenate([
            jnp.einsum("nij,njk->nik", j_color_pc, lie.skew(pc)),
            -jnp.einsum("nij,jk->nik", j_color_pc, r_ic.T)], axis=-1)  # (M,3,6)
        scale = (h_l * vmask)[:, None, None]
        h_mat = (h_rows * scale).reshape(3 * m, 6)
        r_vec = (res * (h_l * vmask)[:, None]).reshape(3 * m)
        r_inv = (info * vmask[:, None]).reshape(3 * m)

        d_so3 = lie.quat_to_so3(lie.quat_mul(lie.quat_conj(pred.q_ic), c.q_ic))
        d_p = c.t_ic - pred.t_ic
        d_x = jnp.concatenate([d_so3, d_p])
        j0 = jnp.eye(6, dtype=dtype).at[0:3, 0:3].set(
            jnp.eye(3, dtype=dtype) - 0.5 * lie.skew(d_so3))

        ht_rinv = h_mat.T * r_inv[None, :]
        hth = ht_rinv @ h_mat
        cov6 = cam.cov[1:7, 1:7]
        prior = jnp.linalg.inv(j0 @ cov6 @ j0.T * w)
        kk = jnp.linalg.inv(hth + prior)
        k_h = kk @ (ht_rinv @ r_vec)
        k_hmat = kk @ hth
        sol = -k_h - (jnp.eye(6, dtype=dtype) - k_hmat) @ (j0 @ d_x)

        c_new = c._replace(
            q_ic=lie.quat_normalize(
                lie.quat_mul(c.q_ic, lie.exp_so3_quat(sol[0:3]))),
            t_ic=c.t_ic + sol[3:6])
        return c_new, (sol, k_hmat)

    cam_it, (sols, k_hmats) = jax.lax.scan(
        iteration, cam, None, length=NUM_ITERATIONS)
    j_k = jnp.eye(6, dtype=dtype).at[0:3, 0:3].set(
        jnp.eye(3, dtype=dtype) - 0.5 * lie.skew(sols[-1][0:3]))
    cov6_new = j_k @ (jnp.eye(6, dtype=dtype) - k_hmats[-1]) \
        @ cam.cov[1:7, 1:7] @ j_k.T
    cam_new = cam_it._replace(cov=cam.cov.at[1:7, 1:7].set(cov6_new))
    out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(ok, a, b), cam_new, cam)
    return out, ok

"""Batched RANSAC gates: fundamental-matrix and PnP outlier rejection.

TPU-native replacements for cv::findFundamentalMat(FM_RANSAC) at
opticalFlowTracker.cpp:144 and cv::solvePnPRansac at
opticalFlowTracker.cpp:295: all hypotheses are evaluated in parallel with
`vmap` instead of sequential sampling.  The PnP solver refines from the
LIO pose prior with Gauss-Newton (the reference initializes from EPnP;
with a tight odometry prior available, prior-seeded GN is both cheaper
and more robust on TPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sr_livo_tpu.utils import lie


def _sample_indices(key, n_hyp: int, k: int, n: int, p_valid) -> jnp.ndarray:
    """(n_hyp, k) random indices biased toward valid entries: we sample from
    a permutation weighted by validity (invalid entries get pushed out by
    rejection via gumbel-top-k)."""
    g = jax.random.gumbel(key, (n_hyp, n))
    logits = jnp.where(p_valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(logits, k)
    return idx


@functools.partial(jax.jit, static_argnames=("n_hyp", "threshold"))
def fundamental_ransac(p0: jnp.ndarray, p1: jnp.ndarray, valid: jnp.ndarray,
                       key: jnp.ndarray, *, n_hyp: int = 128,
                       threshold: float = 1.0) -> jnp.ndarray:
    """8-point fundamental-matrix RANSAC; returns the inlier mask.

    Matches cv::findFundamentalMat(..., FM_RANSAC, 1.0, 0.997) semantics:
    hypotheses from normalized 8-point solves, scored by Sampson distance.
    """
    n = p0.shape[0]
    nv = jnp.sum(valid)

    # normalize (shift/scale) for conditioning
    def _norm(p):
        mask = valid[:, None]
        mu = jnp.sum(jnp.where(mask, p, 0), axis=0) / jnp.maximum(nv, 1)
        d = jnp.where(valid, jnp.linalg.norm(p - mu, axis=-1), 0)
        s = jnp.sqrt(2.0) / jnp.maximum(
            jnp.sum(d) / jnp.maximum(nv, 1), 1e-6)
        t = jnp.array([[s, 0, -s * mu[0]], [0, s, -s * mu[1]], [0, 0, 1.0]],
                      p.dtype)
        pn = (p - mu) * s
        return pn, t

    p0n, t0 = _norm(p0)
    p1n, t1 = _norm(p1)

    idx = _sample_indices(key, n_hyp, 8, n, valid)

    def solve_f(sub_idx):
        a0 = p0n[sub_idx]
        a1 = p1n[sub_idx]
        x0, y0 = a0[:, 0], a0[:, 1]
        x1, y1 = a1[:, 0], a1[:, 1]
        one = jnp.ones_like(x0)
        A = jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1,
                       x0, y0, one], axis=-1)           # (8, 9)
        # Fix f33 = 1 and solve the 8x8 system (after the normalizing
        # transform f33 ~ 1 holds for non-degenerate geometry) — batched
        # small SVDs lower poorly on TPU, a dense solve does not.  Skipping
        # the rank-2 projection only perturbs the Sampson scores slightly.
        lhs = A[:, :8]
        rhs = -A[:, 8]
        f8 = jnp.linalg.solve(lhs + 1e-8 * jnp.eye(8, dtype=A.dtype), rhs)
        f = jnp.concatenate([f8, jnp.ones(1, A.dtype)]).reshape(3, 3)
        return t1.T @ f @ t0

    fs = jax.vmap(solve_f)(idx)                         # (H, 3, 3)

    ones = jnp.ones((n, 1), p0.dtype)
    h0 = jnp.concatenate([p0, ones], axis=-1)           # (N, 3)
    h1 = jnp.concatenate([p1, ones], axis=-1)

    def score(f):
        fe0 = h0 @ f.T                                  # (N, 3) = F x0
        fe1 = h1 @ f                                    # (N, 3) = F^T x1
        num = jnp.sum(h1 * fe0, axis=-1) ** 2
        den = fe0[:, 0] ** 2 + fe0[:, 1] ** 2 + fe1[:, 0] ** 2 + fe1[:, 1] ** 2
        samp = num / jnp.maximum(den, 1e-12)
        inl = valid & (samp < threshold * threshold)
        return inl, jnp.sum(inl)

    inls, counts = jax.vmap(score)(fs)
    best = jnp.argmax(counts)
    ok = counts[best] >= 8
    return jnp.where(ok, inls[best], valid)


def _project(pts3d, q_cw, t_cw, intr):
    pc = lie.quat_rotate(jnp.broadcast_to(q_cw, (pts3d.shape[0], 4)),
                         pts3d) + t_cw
    z = jnp.where(pc[..., 2] > 1e-3, pc[..., 2], 1e-3)
    u = pc[..., 0] * intr[0] / z + intr[2]
    v = pc[..., 1] * intr[1] / z + intr[3]
    return jnp.stack([u, v], axis=-1), pc


def _gn_pose_refine(pts3d, px, w, q0, t0, intr, iters: int):
    """Gauss-Newton on (so3, t) of the camera-from-world pose, minimizing
    weighted reprojection error."""
    def body(_i, carry):
        q, t = carry
        uv, pc = _project(pts3d, q, t, intr)
        r = (uv - px) * w[:, None]                        # (N, 2)
        z = jnp.maximum(pc[..., 2], 1e-3)
        fx, fy = intr[0], intr[1]
        # d(uv)/d(pc)
        j00 = fx / z
        j02 = -fx * pc[..., 0] / (z * z)
        j11 = fy / z
        j12 = -fy * pc[..., 1] / (z * z)
        zeros = jnp.zeros_like(z)
        j_u_pc = jnp.stack([
            jnp.stack([j00, zeros, j02], axis=-1),
            jnp.stack([zeros, j11, j12], axis=-1)], axis=-2)  # (N, 2, 3)
        # pc = R_cw p + t_cw ; right perturbation: d pc = -[pc - t]x? Use
        # d pc/d so3 = -R [p]x ... simpler: left perturbation on camera
        # pose: pc' = exp(w) pc + dt  =>  d pc/dw = -[pc]x, d pc/dt = I.
        j_pc = jnp.concatenate([-lie.skew(pc), jnp.broadcast_to(
            jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))], axis=-1)
        jac = jnp.einsum("nij,njk->nik", j_u_pc, j_pc) * w[:, None, None]
        jtj = jnp.einsum("nik,nil->kl", jac, jac) + 1e-6 * jnp.eye(6)
        jtr = jnp.einsum("nik,ni->k", jac, r)
        dx = -jnp.linalg.solve(jtj, jtr)
        q_new = lie.quat_normalize(lie.quat_mul(lie.exp_so3_quat(dx[:3]), q))
        t_new = t + dx[3:]
        return q_new, t_new

    return jax.lax.fori_loop(0, iters, body, (q0, t0))


@functools.partial(jax.jit, static_argnames=("n_hyp", "threshold", "iters"))
def pnp_ransac(pts3d: jnp.ndarray, px: jnp.ndarray, valid: jnp.ndarray,
               q_prior: jnp.ndarray, t_prior: jnp.ndarray,
               intr: jnp.ndarray, key: jnp.ndarray, *,
               n_hyp: int = 64, threshold: float = 1.5,
               iters: int = 5) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Prior-seeded RANSAC-PnP outlier gate.

    Each hypothesis GN-refines (q_cw, t_cw) from the odometry prior on a
    random 4-point minimal set; the best-consensus pose defines the inlier
    mask (reproj < threshold px).  Returns (inliers, q_best, t_best).
    """
    n = pts3d.shape[0]
    idx = _sample_indices(key, n_hyp, 4, n, valid)

    def hyp(sub_idx):
        w = jnp.zeros((n,), pts3d.dtype).at[sub_idx].set(1.0)
        w = w * valid.astype(pts3d.dtype)
        q, t = _gn_pose_refine(pts3d, px, w, q_prior, t_prior, intr, iters)
        uv, pc = _project(pts3d, q, t, intr)
        err = jnp.linalg.norm(uv - px, axis=-1)
        inl = valid & (err < threshold) & (pc[..., 2] > 1e-3)
        return inl, jnp.sum(inl), q, t

    inls, counts, qs, ts = jax.vmap(hyp)(idx)
    best = jnp.argmax(counts)

    # final refinement on the best consensus set
    w_best = inls[best].astype(pts3d.dtype)
    q_f, t_f = _gn_pose_refine(pts3d, px, w_best, qs[best], ts[best],
                               intr, iters)
    uv, pc = _project(pts3d, q_f, t_f, intr)
    err = jnp.linalg.norm(uv - px, axis=-1)
    inl_f = valid & (err < threshold) & (pc[..., 2] > 1e-3)

    ok = counts[best] >= 10
    return (jnp.where(ok, inl_f, valid),
            jnp.where(ok, q_f, q_prior),
            jnp.where(ok, t_f, t_prior))

"""Batched neighborhood PCA: closed-form symmetric 3x3 eigendecomposition.

Replaces the per-keypoint Eigen::SelfAdjointEigenSolver in
computeNeighborhoodDistribution (optimize.cpp:316-353) with an analytic,
fully-vectorized eigensolver (trigonometric method for eigenvalues,
row-cross-product method for the eigenvector), so thousands of 3x3
problems run as one fused VPU program instead of a scalar loop.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_TWO_PI_3 = 2.0943951023931953  # 2*pi/3


def eigvals_sym3x3(a: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues of symmetric (..., 3, 3), descending: [l1 >= l2 >= l3]."""
    a00, a11, a22 = a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]
    a01, a02, a12 = a[..., 0, 1], a[..., 0, 2], a[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))

    # det(B)/2 with B = (A - qI)/p
    detb = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02))
    r = jnp.clip(detb / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    l1 = q + 2.0 * p * jnp.cos(phi)
    l3 = q + 2.0 * p * jnp.cos(phi + _TWO_PI_3)
    l2 = 3.0 * q - l1 - l3

    degenerate = p2 < 1e-20
    lq = jnp.stack([q, q, q], axis=-1)
    ls = jnp.stack([l1, l2, l3], axis=-1)
    return jnp.where(degenerate[..., None], lq, ls)


def eigvec_for(a: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of symmetric (..., 3, 3) for eigenvalue lam (...,).

    Uses the cross product of rows of (A - lam I): for a rank-2 shifted
    matrix any two independent rows' cross product spans the null space.
    Picks the largest-norm candidate of the three row pairs for stability;
    on full degeneracy returns e_z.
    """
    m = a - lam[..., None, None] * jnp.eye(3, dtype=a.dtype)
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    cands = jnp.stack([c01, c02, c12], axis=-2)
    norms = jnp.stack([n01, n02, n12], axis=-1)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1),
                            axis=-2)[..., 0, :]
    nrm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], a.dtype), v.shape)
    return jnp.where(nrm > 1e-12, v / jnp.maximum(nrm, 1e-30), fallback)


def neighborhood_distribution(neighbors: jnp.ndarray, n_valid: jnp.ndarray
                              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-query PCA over masked neighbor sets.

    neighbors: (Q, M, 3) with the first n_valid[q] entries valid.
    Returns (normal (Q, 3), a2D (Q,), barycenter (Q, 3)) where `normal` is
    the smallest-eigenvalue direction and a2D = (s2 - s3)/s1 with
    s_i = sqrt(|l_i|) — exactly computeNeighborhoodDistribution
    (optimize.cpp:316-353).
    """
    Q, M, _ = neighbors.shape
    mask = (jnp.arange(M)[None, :] < n_valid[:, None]).astype(neighbors.dtype)
    cnt = jnp.maximum(n_valid.astype(neighbors.dtype), 1.0)
    bary = jnp.sum(neighbors * mask[..., None], axis=1) / cnt[:, None]
    centered = (neighbors - bary[:, None, :]) * mask[..., None]
    # Scatter matrix (not normalized by count — matches the reference).
    cov = jnp.einsum("qmi,qmj->qij", centered, centered)
    lams = eigvals_sym3x3(cov)
    normal = eigvec_for(cov, lams[..., 2])
    s = jnp.sqrt(jnp.abs(lams))
    a2d = (s[..., 1] - s[..., 2]) / jnp.maximum(s[..., 0], 1e-12)
    return normal, a2d, bary

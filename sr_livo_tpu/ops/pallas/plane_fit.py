"""Pallas TPU kernel: fused point-to-plane residual construction.

Fuses the entire per-keypoint tail of buildPlaneResiduals
(optimize.cpp:18-131) — masked neighborhood mean, 3x3 scatter matrix,
closed-form symmetric eigen-decomposition, normal orientation, planarity
weighting and the 1x6 Jacobian row — into one VMEM-resident kernel
(block of 256 keypoints per grid step), replacing ~40 separate XLA ops
with a single fused VPU program.

The kernel consumes the kNN gather results (which stay in XLA where the
HBM gathers belong) and produces the weighted (H row, h, mask) triples
the IEKF stacks.  Used on TPU; the pure-jnp path in models.lio remains
the reference implementation and the CPU/interpret fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK_Q = 256
_TWO_PI_3 = 2.0943951023931953


def _acos(x):
    """Polynomial arccos (Abramowitz & Stegun 4.4.45, |err| < 7e-5 rad):
    Mosaic has no acos lowering."""
    xa = jnp.abs(x)
    p = ((-0.0187293 * xa + 0.0742610) * xa - 0.2121144) * xa + 1.5707288
    r = jnp.sqrt(jnp.maximum(1.0 - xa, 0.0)) * p
    return jnp.where(x < 0, jnp.float32(3.14159265358979) - r, r)


def _eig_smallest(a00, a01, a02, a11, a12, a22):
    """Componentwise symmetric 3x3 eigen: returns (l1, l2, l3, nx, ny, nz)
    with l1 >= l2 >= l3 and (nx, ny, nz) the unit eigenvector of l3.
    All operands are (B, 1) vectors."""
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))
    detb = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02))
    r = jnp.clip(detb / (2.0 * p * p * p), -1.0, 1.0)
    phi = _acos(r) / 3.0
    l1 = q + 2.0 * p * jnp.cos(phi)
    l3 = q + 2.0 * p * jnp.cos(phi + _TWO_PI_3)
    l2 = 3.0 * q - l1 - l3
    degenerate = p2 < 1e-20
    l1 = jnp.where(degenerate, q, l1)
    l2 = jnp.where(degenerate, q, l2)
    l3 = jnp.where(degenerate, q, l3)

    # eigenvector of l3: best cross product of rows of (A - l3 I)
    m00, m11, m22 = a00 - l3, a11 - l3, a22 - l3
    # rows: r0 = (m00, a01, a02), r1 = (a01, m11, a12), r2 = (a02, a12, m22)
    c01x = a01 * a12 - a02 * m11
    c01y = a02 * a01 - m00 * a12
    c01z = m00 * m11 - a01 * a01
    c02x = a01 * m22 - a02 * a12
    c02y = a02 * a02 - m00 * m22
    c02z = m00 * a12 - a01 * a02
    c12x = m11 * m22 - a12 * a12
    c12y = a12 * a02 - a01 * m22
    c12z = a01 * a12 - m11 * a02
    n01 = c01x * c01x + c01y * c01y + c01z * c01z
    n02 = c02x * c02x + c02y * c02y + c02z * c02z
    n12 = c12x * c12x + c12y * c12y + c12z * c12z
    use02 = n02 > n01
    bx = jnp.where(use02, c02x, c01x)
    by = jnp.where(use02, c02y, c01y)
    bz = jnp.where(use02, c02z, c01z)
    bn = jnp.where(use02, n02, n01)
    use12 = n12 > bn
    bx = jnp.where(use12, c12x, bx)
    by = jnp.where(use12, c12y, by)
    bz = jnp.where(use12, c12z, bz)
    bn = jnp.where(use12, n12, bn)
    inv = jax.lax.rsqrt(jnp.maximum(bn, 1e-30))
    ok = bn > 1e-12
    nx = jnp.where(ok, bx * inv, 0.0)
    ny = jnp.where(ok, by * inv, 0.0)
    nz = jnp.where(ok, bz * inv, 1.0)
    return l1, l2, l3, nx, ny, nz


def _kernel(nx_ref, ny_ref, nz_ref, cnt_ref, wx_ref, wy_ref, wz_ref,
            lx_ref, ly_ref, lz_ref, valid_ref, rmat_ref, lt_ref,
            hx_ref, h_ref, good_ref, *,
            m_neighbors, lam_w, lam_nb, power_planarity, max_dist,
            min_neighbors):
    """One block of BLOCK_Q keypoints."""
    cnt = cnt_ref[:].astype(jnp.float32)            # (B, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_Q, m_neighbors), 1)
    mask = (col < cnt_ref[:]).astype(jnp.float32)    # (B, M)

    nbx = nx_ref[:] * mask
    nby = ny_ref[:] * mask
    nbz = nz_ref[:] * mask
    cnt_safe = jnp.maximum(cnt, 1.0)
    mx = jnp.sum(nbx, axis=1, keepdims=True) / cnt_safe
    my = jnp.sum(nby, axis=1, keepdims=True) / cnt_safe
    mz = jnp.sum(nbz, axis=1, keepdims=True) / cnt_safe

    cx = (nx_ref[:] - mx) * mask
    cy = (ny_ref[:] - my) * mask
    cz = (nz_ref[:] - mz) * mask
    a00 = jnp.sum(cx * cx, axis=1, keepdims=True)
    a01 = jnp.sum(cx * cy, axis=1, keepdims=True)
    a02 = jnp.sum(cx * cz, axis=1, keepdims=True)
    a11 = jnp.sum(cy * cy, axis=1, keepdims=True)
    a12 = jnp.sum(cy * cz, axis=1, keepdims=True)
    a22 = jnp.sum(cz * cz, axis=1, keepdims=True)

    l1, l2, l3, vx, vy, vz = _eig_smallest(a00, a01, a02, a11, a12, a22)
    s1 = jnp.sqrt(jnp.abs(l1))
    s2 = jnp.sqrt(jnp.abs(l2))
    s3 = jnp.sqrt(jnp.abs(l3))
    a2d = (s2 - s3) / jnp.maximum(s1, 1e-12)

    wx, wy, wz = wx_ref[:], wy_ref[:], wz_ref[:]     # world point (B, 1)
    ltx = lt_ref[0, 0]
    lty = lt_ref[0, 1]
    ltz = lt_ref[0, 2]
    # orient toward the previous sensor position (optimize.cpp:49-51)
    dot = vx * (ltx - wx) + vy * (lty - wy) + vz * (ltz - wz)
    flip = dot < 0
    vx = jnp.where(flip, -vx, vx)
    vy = jnp.where(flip, -vy, vy)
    vz = jnp.where(flip, -vz, vz)

    # nearest neighbor (column 0 of the distance-sorted kNN result)
    c0x = nx_ref[:, 0:1]
    c0y = ny_ref[:, 0:1]
    c0z = nz_ref[:, 0:1]
    dcl = jnp.sqrt((c0x - wx) ** 2 + (c0y - wy) ** 2 + (c0z - wz) ** 2)
    if power_planarity == 2.0:
        plan = a2d * a2d
    else:
        plan = jnp.exp(power_planarity * jnp.log(jnp.maximum(a2d, 1e-12)))
    weight = (lam_w * plan
              + lam_nb * jnp.exp(-dcl / (max_dist * min_neighbors)))

    offset = -(vx * c0x + vy * c0y + vz * c0z)
    dist = vx * wx + vy * wy + vz * wz + offset

    enough = cnt_ref[:] >= min_neighbors
    good = valid_ref[:] & enough & (dist < max_dist)
    w = jnp.where(good, weight, 0.0)

    # J_rot = -n^T R [loc]x  (optimize.cpp:101)
    r00, r01, r02 = rmat_ref[0, 0], rmat_ref[0, 1], rmat_ref[0, 2]
    r10, r11, r12 = rmat_ref[1, 0], rmat_ref[1, 1], rmat_ref[1, 2]
    r20, r21, r22 = rmat_ref[2, 0], rmat_ref[2, 1], rmat_ref[2, 2]
    # u = n^T R  (row vector, components (B, 1))
    ux = vx * r00 + vy * r10 + vz * r20
    uy = vx * r01 + vy * r11 + vz * r21
    uz = vx * r02 + vy * r12 + vz * r22
    px, py, pz = lx_ref[:], ly_ref[:], lz_ref[:]
    # -u x [p]x = (u x p) components with sign: -(u^T [p]x) = (u cross p)^T?
    # [p]x columns: c0 = (0, pz, -py), c1 = (-pz, 0, px), c2 = (py, -px, 0)
    jr0 = -(uy * pz - uz * py)
    jr1 = -(uz * px - ux * pz)
    jr2 = -(ux * py - uy * px)

    hx_ref[:, 0:1] = vx * w
    hx_ref[:, 1:2] = vy * w
    hx_ref[:, 2:3] = vz * w
    hx_ref[:, 3:4] = jr0 * w
    hx_ref[:, 4:5] = jr1 * w
    hx_ref[:, 5:6] = jr2 * w
    h_ref[:] = jnp.where(good, dist * weight, 0.0)
    good_ref[:] = good


@functools.partial(jax.jit, static_argnames=(
    "lam_w", "lam_nb", "power_planarity", "max_dist", "min_neighbors",
    "interpret"))
def plane_residuals_pallas(
    neighbors: jnp.ndarray,    # (Q, M, 3) distance-sorted kNN results
    n_found: jnp.ndarray,      # (Q,) int32
    world: jnp.ndarray,        # (Q, 3)
    location: jnp.ndarray,     # (Q, 3) IMU-frame keypoint
    r_world: jnp.ndarray,      # (3, 3)
    last_trans: jnp.ndarray,   # (3,)
    valid: jnp.ndarray,        # (Q,)
    *, lam_w: float, lam_nb: float, power_planarity: float,
    max_dist: float, min_neighbors: int, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (h_x (Q, 6), h (Q,), good (Q,)); the residual-cap prefix
    mask is applied by the caller."""
    q, m, _ = neighbors.shape
    qp = -(-q // BLOCK_Q) * BLOCK_Q

    def pad(x, fill=0):
        pad_n = qp - q
        if pad_n == 0:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad_n,) + x.shape[1:], fill, x.dtype)])

    nx = pad(neighbors[..., 0])
    ny = pad(neighbors[..., 1])
    nz = pad(neighbors[..., 2])
    cnt = pad(n_found.astype(jnp.int32))[:, None]
    wx = pad(world[:, 0])[:, None]
    wy = pad(world[:, 1])[:, None]
    wz = pad(world[:, 2])[:, None]
    lx = pad(location[:, 0])[:, None]
    ly = pad(location[:, 1])[:, None]
    lz = pad(location[:, 2])[:, None]
    vld = pad(valid)[:, None]
    lt = last_trans[None, :]

    grid = (qp // BLOCK_Q,)
    row_spec = lambda w_: pl.BlockSpec((BLOCK_Q, w_), lambda i: (i, 0))
    full_spec = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0))

    kern = functools.partial(
        _kernel, m_neighbors=m, lam_w=lam_w, lam_nb=lam_nb,
        power_planarity=power_planarity, max_dist=max_dist,
        min_neighbors=min_neighbors)
    h_x, h, good = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[row_spec(m), row_spec(m), row_spec(m), row_spec(1),
                  row_spec(1), row_spec(1), row_spec(1),
                  row_spec(1), row_spec(1), row_spec(1), row_spec(1),
                  full_spec(3, 3), full_spec(1, 3)],
        out_specs=[row_spec(6), row_spec(1), row_spec(1)],
        out_shape=[jax.ShapeDtypeStruct((qp, 6), jnp.float32),
                   jax.ShapeDtypeStruct((qp, 1), jnp.float32),
                   jax.ShapeDtypeStruct((qp, 1), jnp.bool_)],
        interpret=interpret,
    )(nx, ny, nz, cnt, wx, wy, wz, lx, ly, lz, vld, r_world, lt)
    return h_x[:q], h[:q, 0], good[:q, 0]

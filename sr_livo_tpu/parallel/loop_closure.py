"""Loop-closure detection + verification feeding the pose graph.

Beyond the reference (which has no loop handling): revisit candidates are
proposed by trajectory proximity and verified by point-to-plane
Gauss-Newton alignment of the query keyframe's scan against a temporary
voxel map built from the target keyframe's scan — the same registration
machinery as the LIO core, so the verification runs as one jitted
program.  Confirmed closures become PoseGraph edges.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sr_livo_tpu.ops import neighborhood as nb_ops
from sr_livo_tpu.ops import voxel_map as vm
from sr_livo_tpu.parallel import pose_graph as pg
from sr_livo_tpu.utils import lie


def find_candidates(positions: np.ndarray, *, radius: float = 2.0,
                    min_gap: int = 20, max_pairs: int = 8
                    ) -> List[Tuple[int, int]]:
    """Host-side proximity candidates: keyframe pairs (i, j), i < j,
    spatially within `radius` but at least `min_gap` frames apart."""
    n = positions.shape[0]
    out = []
    for j in range(n):
        d = np.linalg.norm(positions[:max(j - min_gap, 0)] - positions[j],
                           axis=-1)
        if d.size == 0:
            continue
        i = int(np.argmin(d))
        if d[i] < radius:
            out.append((i, j))
    # keep the best-separated subset
    out.sort(key=lambda ij: ij[1] - ij[0], reverse=True)
    dedup, seen = [], set()
    for (i, j) in out:
        key = (i // max(min_gap // 2, 1), j // max(min_gap // 2, 1))
        if key in seen:
            continue
        seen.add(key)
        dedup.append((i, j))
        if len(dedup) >= max_pairs:
            break
    return dedup


class ClosureResult(NamedTuple):
    q_meas: jnp.ndarray    # (4,) q_i^-1 q_j (refined)
    t_meas: jnp.ndarray    # (3,) R_i^T (t_j - t_i)
    fitness: jnp.ndarray   # () inlier fraction of the aligned scan
    mean_residual: jnp.ndarray  # () mean |point-to-plane| of inliers
    # () translation observability: min/mean eigenvalue ratio of the
    # inlier-weighted sum of normal outer products.  Plane-to-plane ICP
    # slides freely along directions no plane constrains; such sliding
    # alignments score HIGH fitness at a WRONG translation (round-4: a
    # widened candidate search fed sliding edges into the pose graph,
    # 7 cm -> 2.6 m on the revisit gate).  Near-zero ratio = degenerate.
    t_observability: jnp.ndarray


@functools.partial(jax.jit, static_argnames=(
    "map_capacity", "voxel_size", "max_probe", "iters", "min_neighbors"))
def verify_closure(points_i: jnp.ndarray, valid_i: jnp.ndarray,
                   points_j: jnp.ndarray, valid_j: jnp.ndarray,
                   q_i: jnp.ndarray, t_i: jnp.ndarray,
                   q_j: jnp.ndarray, t_j: jnp.ndarray, *,
                   map_capacity: int = 1 << 14, voxel_size: float = 0.5,
                   max_probe: int = 16, iters: int = 8,
                   min_neighbors: int = 6,
                   inlier_dist: float = 0.2) -> ClosureResult:
    """GN-align keyframe j's body-frame scan against a temporary map of
    keyframe i's scan; returns the refined relative edge + fitness."""
    # temporary voxel map from keyframe i (world frame)
    world_i = lie.quat_rotate(
        jnp.broadcast_to(q_i, (points_i.shape[0], 4)), points_i) + t_i
    tmp = vm.make_map(map_capacity, 20)
    tmp, _ = vm.insert(tmp, world_i, valid_i, voxel_size, 0.0, max_probe)

    def gn(_k, carry):
        q, t = carry
        n = points_j.shape[0]
        world = lie.quat_rotate(jnp.broadcast_to(q, (n, 4)), points_j) + t
        neighbors, nb_ok, _ = vm.knn(tmp, world, voxel_size=voxel_size,
                                     max_neighbors=10, max_probe=max_probe,
                                     nb_voxels=1)
        n_found = jnp.sum(nb_ok, axis=1).astype(jnp.int32)
        normal, a2d, _ = nb_ops.neighborhood_distribution(neighbors, n_found)
        closest = neighbors[:, 0, :]
        dist = jnp.sum(normal * (world - closest), axis=-1)
        w = jnp.where(valid_j & (n_found >= min_neighbors)
                      & (jnp.abs(dist) < 1.0), a2d * a2d, 0.0)
        r_w = lie.quat_to_rot(q)
        j_rot = -jnp.einsum("ni,ij,njk->nk", normal, r_w, lie.skew(points_j))
        jac = jnp.concatenate(
            [j_rot, jnp.broadcast_to(normal, (n, 3))], axis=-1)
        jw = jac * w[:, None]
        h = jw.T @ jac + 1e-4 * jnp.eye(6)
        b = jw.T @ dist
        dx = -jnp.linalg.solve(h, b)
        q_new = lie.quat_normalize(lie.quat_mul(q, lie.exp_so3_quat(dx[0:3])))
        return q_new, t + dx[3:6]

    q_f, t_f = jax.lax.fori_loop(0, iters, gn, (q_j, t_j))

    # fitness of the refined alignment
    n = points_j.shape[0]
    world = lie.quat_rotate(jnp.broadcast_to(q_f, (n, 4)), points_j) + t_f
    neighbors, nb_ok, _ = vm.knn(tmp, world, voxel_size=voxel_size,
                                 max_neighbors=10, max_probe=max_probe,
                                 nb_voxels=1)
    n_found = jnp.sum(nb_ok, axis=1).astype(jnp.int32)
    normal, _, _ = nb_ops.neighborhood_distribution(neighbors, n_found)
    dist = jnp.abs(jnp.sum(normal * (world - neighbors[:, 0, :]), axis=-1))
    usable = valid_j & (n_found >= min_neighbors)
    inlier = usable & (dist < inlier_dist)
    n_usable = jnp.maximum(jnp.sum(usable), 1)
    fitness = jnp.sum(inlier) / n_usable
    mean_res = jnp.sum(jnp.where(inlier, dist, 0.0)) / jnp.maximum(
        jnp.sum(inlier), 1)
    # translation observability of the alignment: eigenvalues of the
    # inlier normal covariance (see ClosureResult.t_observability)
    nw = jnp.where(inlier[:, None], normal, 0.0)
    h_t = nw.T @ nw
    eigs = jnp.linalg.eigvalsh(h_t)
    t_obs = eigs[0] / jnp.maximum(jnp.mean(eigs), 1e-9)

    q_meas, t_meas = pg.edge_from_poses(q_i, t_i, q_f, t_f)
    return ClosureResult(q_meas=q_meas, t_meas=t_meas, fitness=fitness,
                         mean_residual=mean_res, t_observability=t_obs)

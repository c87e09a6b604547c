"""LIO iterated ESIKF: point-to-plane registration against the voxel map.

TPU-native re-derivation of the reference optimizer
(/root/reference/src/optimize.cpp): `build_residuals` vectorizes
buildPlaneResiduals (optimize.cpp:18-131) over all keypoints at once
(27-voxel kNN gather + analytic PCA + masked residual assembly), and
`iekf_update` runs updateIEKF (optimize.cpp:133-314) as a
`lax.while_loop` with the same information-form Kalman gain and
SO(3)/S2 covariance-reset Jacobians, entirely on device.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sr_livo_tpu.models import eskf as eskf_mod
from sr_livo_tpu.models.eskf import EskfState
from sr_livo_tpu.ops import neighborhood as nb_ops
from sr_livo_tpu.ops import voxel_map as vm
from sr_livo_tpu.utils import lie


class ResidualBatch(NamedTuple):
    h_x: jnp.ndarray        # (Nk, 6) weighted jacobian rows
    h: jnp.ndarray          # (Nk,) weighted point-to-plane distances
    valid: jnp.ndarray      # (Nk,) bool
    num: jnp.ndarray        # () int32 residual count


class IekfSummary(NamedTuple):
    success: jnp.ndarray        # () bool
    num_residuals: jnp.ndarray  # () int32
    iterations: jnp.ndarray     # () int32


def build_residuals(
    voxel_map: vm.VoxelMap,
    keypts_raw: jnp.ndarray,      # (Nk, 3) de-skewed end-frame LiDAR coords
    keypts_valid: jnp.ndarray,    # (Nk,) bool
    q: jnp.ndarray, t: jnp.ndarray,
    last_trans: jnp.ndarray,
    r_il: jnp.ndarray, t_il: jnp.ndarray,
    *,
    size_voxel_map: float,
    nb_voxels_visited: int,
    max_number_neighbors: int,
    min_number_neighbors: int,
    threshold_voxel_capacity,
    power_planarity: float,
    max_dist_to_plane: float,
    weight_alpha: float,
    weight_neighborhood: float,
    max_num_residuals: int,
    max_probe: int,
    use_pallas: bool = False,
) -> ResidualBatch:
    """One residual-construction pass (buildPlaneResiduals semantics).

    All keypoints are processed in parallel; the reference's sequential
    `break` after max_num_residuals becomes a prefix mask over the same
    keypoint order.
    """
    lam_sum = abs(weight_alpha) + abs(weight_neighborhood)
    lam_w = abs(weight_alpha) / lam_sum
    lam_nb = abs(weight_neighborhood) / lam_sum

    location = keypts_raw @ r_il.T + t_il                    # IMU-frame
    world = lie.quat_rotate(jnp.broadcast_to(q, (keypts_raw.shape[0], 4)),
                            location) + t

    neighbors, nb_ok, dists = vm.knn(
        voxel_map, world, voxel_size=size_voxel_map,
        max_neighbors=max_number_neighbors, max_probe=max_probe,
        nb_voxels=nb_voxels_visited,
        threshold_capacity=threshold_voxel_capacity)
    n_found = jnp.sum(nb_ok, axis=1).astype(jnp.int32)
    r_world = lie.quat_to_rot(q)

    if use_pallas:
        from sr_livo_tpu.ops.pallas.plane_fit import plane_residuals_pallas
        h_x, h, good = plane_residuals_pallas(
            neighbors, n_found, world, location, r_world, last_trans,
            keypts_valid, lam_w=lam_w, lam_nb=lam_nb,
            power_planarity=power_planarity, max_dist=max_dist_to_plane,
            min_neighbors=min_number_neighbors)
    else:
        h_x, h, good = _plane_rows_jnp(
            neighbors, n_found, world, location, r_world, last_trans,
            keypts_valid, lam_w=lam_w, lam_nb=lam_nb,
            power_planarity=power_planarity, max_dist=max_dist_to_plane,
            min_neighbors=min_number_neighbors)

    return _cap_residuals(h_x, h, good, max_num_residuals)


def _plane_rows_from_assoc(normal0, a2d, closest, n_found, world, location,
                           r_world, last_trans, keypts_valid, *, lam_w,
                           lam_nb, power_planarity, max_dist, min_neighbors):
    """Pose-dependent tail of buildPlaneResiduals given a fixed association
    (plane normal + planarity + closest neighbor per keypoint)."""
    enough = n_found >= min_neighbors
    # Orient normal toward the previous sensor position (optimize.cpp:49-51).
    flip = jnp.sum(normal0 * (last_trans[None, :] - world), axis=-1) < 0
    normal = jnp.where(flip[:, None], -normal0, normal0)

    planarity_w = a2d ** power_planarity
    closest_dist = jnp.linalg.norm(closest - world, axis=-1)
    weight = (lam_w * planarity_w
              + lam_nb * jnp.exp(-closest_dist / (max_dist * min_neighbors)))

    norm_offset = -jnp.sum(normal * closest, axis=-1)
    distance = jnp.sum(normal * world, axis=-1) + norm_offset

    good = keypts_valid & enough & (distance < max_dist)
    w = jnp.where(good, weight, 0.0)
    j_rot = -jnp.einsum("ni,ij,njk->nk", normal, r_world,
                        lie.skew(location))
    h_x = jnp.concatenate([normal * w[:, None], j_rot * w[:, None]], axis=-1)
    h = jnp.where(good, distance * weight, 0.0)
    return h_x, h, good


def _plane_rows_jnp(neighbors, n_found, world, location, r_world,
                    last_trans, keypts_valid, *, lam_w, lam_nb,
                    power_planarity, max_dist, min_neighbors):
    """Pure-jnp residual rows (reference implementation; the Pallas kernel
    in ops.pallas.plane_fit mirrors this math)."""
    normal, a2d, _ = nb_ops.neighborhood_distribution(neighbors, n_found)
    return _plane_rows_from_assoc(
        normal, a2d, neighbors[:, 0, :], n_found, world, location, r_world,
        last_trans, keypts_valid, lam_w=lam_w, lam_nb=lam_nb,
        power_planarity=power_planarity, max_dist=max_dist,
        min_neighbors=min_neighbors)


def chunked_assoc(voxel_map, world, n_valid, *, voxel_size, max_neighbors,
                  max_probe, nb_voxels, threshold_capacity, chunk):
    """kNN + neighborhood PCA over only the VALID PREFIX of `world`,
    processed in `chunk`-row slices inside a dynamic-trip-count loop.

    The padded tail of a static query buffer costs as much as real
    queries in a full-batch association — and the sharded engine's query
    budget (K4) carries multiplicative slack for spatial imbalance, so
    at weak scaling the tail is most of the buffer.  Chunking makes the
    headroom free: compute scales with the actual query count (rounded
    up to `chunk`), not the budget.  Requires valid rows to be a prefix
    (frame_ops.voxel_subsample and routing.compact both emit
    prefix-compacted outputs).  Ragged edges are safe: dynamic_slice
    clamps the start, so the last chunk re-processes a few rows with
    identical results.

    Returns (normal (Q, 3), a2d (Q,), closest (Q, 3), n_found (Q,));
    rows beyond the processed prefix are zero (n_found 0 -> gated
    downstream exactly like an un-chunked association of padded rows).
    """
    q = world.shape[0]
    chunk = min(chunk, q)
    n_chunks = (jnp.asarray(n_valid, jnp.int32) + chunk - 1) // chunk

    def body(i, bufs):
        nrm, a2, cl, nf = bufs
        off = i * chunk
        w = jax.lax.dynamic_slice_in_dim(world, off, chunk)
        neighbors, nb_ok, _ = vm.knn(
            voxel_map, w, voxel_size=voxel_size,
            max_neighbors=max_neighbors, max_probe=max_probe,
            nb_voxels=nb_voxels, threshold_capacity=threshold_capacity)
        nfc = jnp.sum(nb_ok, axis=1).astype(jnp.int32)
        n0, a0, _ = nb_ops.neighborhood_distribution(neighbors, nfc)
        upd = jax.lax.dynamic_update_slice_in_dim
        return (upd(nrm, n0, off, 0), upd(a2, a0, off, 0),
                upd(cl, neighbors[:, 0, :], off, 0), upd(nf, nfc, off, 0))

    bufs0 = (jnp.zeros((q, 3), world.dtype), jnp.zeros((q,), world.dtype),
             jnp.zeros((q, 3), world.dtype), jnp.zeros((q,), jnp.int32))
    return jax.lax.fori_loop(0, n_chunks, body, bufs0)


def _cap_residuals(h_x, h, good, max_num_residuals):
    """Residual cap in keypoint order (optimize.cpp:107)."""
    if max_num_residuals > 0:
        prefix = jnp.cumsum(good.astype(jnp.int32))
        good = good & (prefix <= max_num_residuals)
        h_x = jnp.where(good[:, None], h_x, 0.0)
        h = jnp.where(good, h, 0.0)
    return ResidualBatch(h_x=h_x, h=h, valid=good,
                         num=jnp.sum(good).astype(jnp.int32))


def _reset_jacobian(d_so3: jnp.ndarray, so3_dg: jnp.ndarray,
                    b_x: jnp.ndarray) -> jnp.ndarray:
    """Block-diagonal 17x17 error-reset Jacobian: identity except
    J_so3 = I - 0.5 [d_so3]x on the attitude block and
    J_s2 = I + 0.5 B^T [so3_dg]x B on the gravity block
    (optimize.cpp:213-214, 278-279)."""
    j = jnp.eye(17, dtype=d_so3.dtype)
    j_so3 = jnp.eye(3, dtype=d_so3.dtype) - 0.5 * lie.skew(d_so3)
    j_s2 = jnp.eye(2, dtype=d_so3.dtype) + 0.5 * (b_x.T @ lie.skew(so3_dg) @ b_x)
    j = j.at[3:6, 3:6].set(j_so3)
    j = j.at[15:17, 15:17].set(j_s2)
    return j


def _error_vs_prediction(state: EskfState, pred: EskfState):
    """d_x (17,) between current state and the sweep-start prediction,
    plus the S2 helper quantities (optimize.cpp:172-218)."""
    d_p = state.p - pred.p
    d_so3 = lie.quat_to_so3(lie.quat_mul(lie.quat_conj(pred.q), state.q))
    d_v = state.v - pred.v
    d_ba = state.ba - pred.ba
    d_bg = state.bg - pred.bg

    r_dg = lie.rot_from_v1_to_v2(pred.g, state.g)
    so3_dg = lie.log_so3(r_dg)
    b_x_pred = lie.s2_bx(pred.g)
    d_g = b_x_pred.T @ so3_dg

    d_x = jnp.concatenate([d_p, d_so3, d_v, d_ba, d_bg, d_g])
    return d_x, d_so3, so3_dg, b_x_pred


@functools.partial(
    jax.jit,
    static_argnames=("size_voxel_map", "nb_voxels_visited",
                     "max_number_neighbors", "min_number_neighbors",
                     "power_planarity", "max_dist_to_plane",
                     "weight_alpha", "weight_neighborhood",
                     "max_num_residuals", "max_probe", "max_iters",
                     "threshold_translation_norm",
                     "threshold_orientation_norm", "laser_point_cov",
                     "check_convergence", "use_pallas",
                     "cache_association", "query_chunk"))
def iekf_update(
    state: EskfState,
    voxel_map: vm.VoxelMap,
    keypts_raw: jnp.ndarray,
    keypts_valid: jnp.ndarray,
    last_trans: jnp.ndarray,
    r_il: jnp.ndarray, t_il: jnp.ndarray,
    threshold_voxel_capacity: jnp.ndarray,
    *,
    size_voxel_map: float,
    nb_voxels_visited: int,
    max_number_neighbors: int,
    min_number_neighbors: int,
    power_planarity: float,
    max_dist_to_plane: float,
    weight_alpha: float,
    weight_neighborhood: float,
    max_num_residuals: int,
    max_probe: int,
    max_iters: int,
    threshold_translation_norm: float,
    threshold_orientation_norm: float,
    laser_point_cov: float,
    check_convergence: bool = True,
    use_pallas: bool = False,
    cache_association: bool = False,
    query_chunk: int = 0,
    seed_q: jnp.ndarray = None,
    seed_p: jnp.ndarray = None,
) -> Tuple[EskfState, IekfSummary]:
    """Iterated EKF measurement update (updateIEKF, optimize.cpp:133-314).

    Runs `max_iters + 1` iterations at most (the reference loops
    i = -1 .. max_num_iter-1), re-associating keypoints against the map each
    iteration, with early exit on |dt| / |dtheta| convergence.  The final
    covariance update folds the gain and reset Jacobians as
      P+ = J (P - K_x P[0:6,:]) J^T.

    With `cache_association=True` the kNN search and plane PCA run ONCE at
    the predicted pose; iterations recompute only the pose-dependent
    distances/Jacobians (see LivoConfig.cache_association).

    `seed_q`/`seed_p` optionally override the STARTING iterate pose while
    `state` stays the prediction prior — the INIT_CONSTANT_VELOCITY
    predictor of stateInitialization (lioOptimization.cpp:895-990) seeds
    updateIEKF from an extrapolated pose, but the error/gain are still
    measured against the ESKF prediction.
    """
    pred = state  # sweep-start prediction (p_predict etc., optimize.cpp:138)
    if seed_q is not None:
        state = state._replace(q=seed_q, p=seed_p)

    lam_sum = abs(weight_alpha) + abs(weight_neighborhood)
    lam_w = abs(weight_alpha) / lam_sum
    lam_nb = abs(weight_neighborhood) / lam_sum

    if cache_association:
        location = keypts_raw @ r_il.T + t_il               # IMU frame
        world0 = lie.quat_rotate(
            jnp.broadcast_to(state.q, (location.shape[0], 4)),
            location) + state.p
        if query_chunk and query_chunk < location.shape[0]:
            # keypoints are prefix-compacted (frame_ops.voxel_subsample),
            # so the association only computes the occupied prefix
            normal0, a2d, closest, n_found = chunked_assoc(
                voxel_map, world0, jnp.sum(keypts_valid),
                voxel_size=size_voxel_map,
                max_neighbors=max_number_neighbors, max_probe=max_probe,
                nb_voxels=nb_voxels_visited,
                threshold_capacity=threshold_voxel_capacity,
                chunk=query_chunk)
        else:
            neighbors, nb_ok, _ = vm.knn(
                voxel_map, world0, voxel_size=size_voxel_map,
                max_neighbors=max_number_neighbors, max_probe=max_probe,
                nb_voxels=nb_voxels_visited,
                threshold_capacity=threshold_voxel_capacity)
            n_found = jnp.sum(nb_ok, axis=1).astype(jnp.int32)
            normal0, a2d, _ = nb_ops.neighborhood_distribution(
                neighbors, n_found)
            closest = neighbors[:, 0, :]

        def residuals(s: EskfState) -> ResidualBatch:
            world = lie.quat_rotate(
                jnp.broadcast_to(s.q, (location.shape[0], 4)),
                location) + s.p
            h_x, h, good = _plane_rows_from_assoc(
                normal0, a2d, closest, n_found, world, location,
                lie.quat_to_rot(s.q), last_trans, keypts_valid,
                lam_w=lam_w, lam_nb=lam_nb,
                power_planarity=power_planarity,
                max_dist=max_dist_to_plane,
                min_neighbors=min_number_neighbors)
            return _cap_residuals(h_x, h, good, max_num_residuals)
    else:
        def residuals(s: EskfState) -> ResidualBatch:
            return build_residuals(
                voxel_map, keypts_raw, keypts_valid, s.q, s.p, last_trans,
                r_il, t_il,
                size_voxel_map=size_voxel_map,
                nb_voxels_visited=nb_voxels_visited,
                max_number_neighbors=max_number_neighbors,
                min_number_neighbors=min_number_neighbors,
                threshold_voxel_capacity=threshold_voxel_capacity,
                power_planarity=power_planarity,
                max_dist_to_plane=max_dist_to_plane,
                weight_alpha=weight_alpha,
                weight_neighborhood=weight_neighborhood,
                max_num_residuals=max_num_residuals,
                max_probe=max_probe,
                use_pallas=use_pallas)

    def body(carry):
        s, it, _conv, _ok, _nres, cov_final = carry
        res = residuals(s)
        enough = res.num >= min_number_neighbors

        d_x_cur, d_so3, so3_dg, b_x_pred = _error_vs_prediction(s, pred)
        j_old = _reset_jacobian(d_so3, so3_dg, b_x_pred)
        d_x_new = j_old @ d_x_cur

        cov = j_old @ state.cov @ j_old.T

        hth = res.h_x.T @ res.h_x                      # (6, 6)
        temp = jnp.linalg.inv(cov / laser_point_cov)
        temp = temp.at[0:6, 0:6].add(hth)
        temp_inv = jnp.linalg.inv(temp)

        k_h = temp_inv[:, 0:6] @ (res.h_x.T @ res.h)   # (17,)
        k_x6 = temp_inv[:, 0:6] @ hth                  # (17, 6)

        k_x = jnp.zeros((17, 17), state.cov.dtype).at[:, 0:6].set(k_x6)
        d_x = -k_h + (k_x - jnp.eye(17, dtype=state.cov.dtype)) @ d_x_new

        # Divergence guard (optimize.cpp:248-251): skip the injection.
        diverged = (jnp.linalg.norm(d_x[0:3]) > 100.0) | (
            lie.angular_distance_deg(d_x[3:6]) > 100.0)
        apply = enough & ~diverged
        g_before = s.g
        s_new = eskf_mod.observe(s, jnp.where(apply, d_x, 0.0))

        converged = (
            (jnp.linalg.norm(d_x[0:3]) < threshold_translation_norm)
            & (lie.angular_distance_deg(d_x[3:6]) < threshold_orientation_norm)
            & apply) if check_convergence else jnp.asarray(False)

        # Final covariance candidate from this iteration's quantities
        # (optimize.cpp:272-309): J built from the applied d_x and the
        # pre-injection gravity.
        b_x_before = lie.s2_bx(g_before)
        so3_dg_new = b_x_before @ d_x[15:17]
        j_new = _reset_jacobian(d_x[3:6], so3_dg_new, b_x_before)
        cov_final_new = j_new @ (cov - k_x @ cov) @ j_new.T

        return (s_new, it + 1, converged, enough, res.num,
                jnp.where(apply, cov_final_new, cov_final))

    def cond(carry):
        _s, it, conv, ok, _nres, _cf = carry
        return (it < max_iters + 1) & ~conv & ok

    init = (state, jnp.int32(0), jnp.asarray(False), jnp.asarray(True),
            jnp.int32(0), state.cov)
    s_out, iters, _conv, ok, n_res, cov_final = jax.lax.while_loop(
        cond, body, init)

    s_out = s_out._replace(cov=jnp.where(ok, cov_final, state.cov))
    s_out = jax.tree_util.tree_map(
        lambda new, old: jnp.where(ok, new, old), s_out, state)
    summary = IekfSummary(success=ok, num_residuals=n_res, iterations=iters)
    return s_out, summary

"""Batched pyramidal Lucas-Kanade optical flow.

TPU-native re-design of the vendored OpenCV LK kernel
(/root/reference/src/lkpyramid.cpp): instead of SSE2 intrinsics +
cv::parallel_for_ over points, all <=M tracks are solved as one batched
array program per pyramid level — (M, W^2) bilinear window gathers, 2x2
normal equations on the VPU, masked Gauss-Newton iterations.  Pyramids
and Scharr derivative maps of the previous frame are reused across frames
(the reference's swapImageBuffer trick, lkpyramid.cpp:744-753) by keeping
them in the vision carry state.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sr_livo_tpu.ops import image_ops


class LkParams(NamedTuple):
    window: int = 21
    levels: int = 3            # pyramid levels above full-res (0..levels)
    iters: int = 10
    eps: float = 0.05
    min_eig_threshold: float = 1e-4
    patch_buffer: int = 6      # in-patch motion margin per level (pixels)


def _track_level(img_prev, img_cur, dx_prev, dy_prev, pts_prev, guess,
                 valid, params: LkParams):
    """One pyramid level: returns (new_guess, ok, min_eig).

    TPU formulation: the current-image window is re-sampled every
    Gauss-Newton iteration at a moving fractional position — as a gather
    that is the slowest op class on TPU.  Instead we gather ONE
    (W+1+2B)^2 patch per point per level and extract each iteration's
    bilinear window from it with two small selection matmuls
    (window = S_v @ patch @ S_u^T, where S encodes the bilinear weights),
    keeping the whole solver loop on the VPU/MXU.  A point whose iterate
    drifts more than B pixels inside one level samples a clamped window
    (tracking of such points generally fails the residual gates anyway).
    """
    w = params.window
    i_prev = image_ops.sample_windows_bilinear(img_prev, pts_prev, w)
    gx = image_ops.sample_windows_bilinear(dx_prev, pts_prev, w)
    gy = image_ops.sample_windows_bilinear(dy_prev, pts_prev, w)
    i_prev = i_prev.reshape(i_prev.shape[0], -1)            # (M, W^2)
    gx = gx.reshape(gx.shape[0], -1)
    gy = gy.reshape(gy.shape[0], -1)

    a11 = jnp.sum(gx * gx, axis=-1)
    a12 = jnp.sum(gx * gy, axis=-1)
    a22 = jnp.sum(gy * gy, axis=-1)
    det = a11 * a22 - a12 * a12
    tr = a11 + a22
    w2 = params.window * params.window
    min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / (2.0 * w2)
    ok_g = (min_eig > params.min_eig_threshold) & (det > 1e-12)
    det_safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)

    h, iw = img_cur.shape
    half = (w - 1) // 2
    buf = params.patch_buffer
    p_sz = w + 1 + 2 * buf
    m = guess.shape[0]

    # One contiguous patch per point around the level-entry guess.
    tl_u = jnp.floor(guess[:, 0] - half).astype(jnp.int32) - buf
    tl_v = jnp.floor(guess[:, 1] - half).astype(jnp.int32) - buf
    tl_u = jnp.clip(tl_u, 0, max(iw - p_sz, 0))
    tl_v = jnp.clip(tl_v, 0, max(h - p_sz, 0))
    patch = image_ops.extract_patches(
        img_cur, jnp.stack([tl_v, tl_u], axis=-1), p_sz)    # (M, P, P)

    win_idx = jnp.arange(w, dtype=jnp.float32)
    p_idx = jnp.arange(p_sz, dtype=jnp.float32)

    def _sel_matrix(off):
        """(M, W, P) bilinear selection rows: S[m, i, p] picks patch
        column/row floor(off)+i with weight (1-f), +1 with weight f."""
        o0 = jnp.floor(off)
        f = (off - o0)[:, None, None]
        pos = o0[:, None, None] + win_idx[None, :, None]     # (M, W, 1)
        d = p_idx[None, None, :] - pos                       # (M, W, P)
        return jnp.where(d == 0.0, 1.0 - f, 0.0) + jnp.where(d == 1.0, f, 0.0)

    max_off = jnp.float32(p_sz - w - 1) - 1e-3

    def body(carry):
        g, live, it = carry
        ou = jnp.clip(g[:, 0] - half - tl_u, 0.0, max_off)
        ov = jnp.clip(g[:, 1] - half - tl_v, 0.0, max_off)
        s_u = _sel_matrix(ou)                                # (M, W, P)
        s_v = _sel_matrix(ov)
        rows = jnp.einsum("mip,mpq->miq", s_v, patch)        # (M, W, P)
        i_cur = jnp.einsum("miq,mjq->mij", rows, s_u)        # (M, W, W)
        i_cur = i_cur.reshape(m, -1)
        diff = i_cur - i_prev
        b1 = jnp.sum(diff * gx, axis=-1)
        b2 = jnp.sum(diff * gy, axis=-1)
        du = -(a22 * b1 - a12 * b2) / det_safe
        dv = -(a11 * b2 - a12 * b1) / det_safe
        delta = jnp.stack([du, dv], axis=-1)
        g_new = jnp.where(live[:, None], g + delta, g)
        live = live & (jnp.sum(delta * delta, axis=-1) >= params.eps ** 2)
        return g_new, live, it + 1

    def cond(carry):
        _g, live, it = carry
        return (it < params.iters) & jnp.any(live)

    live0 = ok_g & valid
    guess, _, _ = jax.lax.while_loop(cond, body,
                                     (guess, live0, jnp.int32(0)))

    half = (params.window - 1) / 2.0
    inb = ((guess[:, 0] > half) & (guess[:, 0] < iw - half - 1)
           & (guess[:, 1] > half) & (guess[:, 1] < h - half - 1))
    inb_prev = ((pts_prev[:, 0] > half) & (pts_prev[:, 0] < iw - half - 1)
                & (pts_prev[:, 1] > half) & (pts_prev[:, 1] < h - half - 1))
    return guess, ok_g & inb & inb_prev, min_eig


@functools.partial(jax.jit, static_argnames=("params",))
def track_pyramidal(prev_pyr: Tuple[jnp.ndarray, ...],
                    cur_pyr: Tuple[jnp.ndarray, ...],
                    prev_dx: Tuple[jnp.ndarray, ...],
                    prev_dy: Tuple[jnp.ndarray, ...],
                    pts_prev: jnp.ndarray,       # (M, 2) full-res pixels
                    valid: jnp.ndarray,          # (M,) bool
                    params: LkParams = LkParams(),
                    init_flow: jnp.ndarray = None,   # (M, 2) px seed or None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Track points from prev -> cur through the pyramid (coarse to fine).

    Returns (pts_cur (M, 2), status (M,) bool).  Derivatives are of the
    *previous* image per level (reference semantics: the gradient windows
    come from the prev pyramid, lkpyramid.cpp:231-334).

    `init_flow` seeds the coarsest-level iterate at pts_prev + init_flow
    (OpenCV's OPTFLOW_USE_INITIAL_FLOW): with fast camera yaw the
    inter-frame flow can exceed what the pyramid can absorb from a zero
    seed, and the tracker's stored per-point image velocity predicts it
    well.  A coarse level that fails with the seed falls back to the
    identity guess (the un-seeded behavior), so a bad seed cannot lose a
    track the zero seed would have kept beyond that level's vote.
    """
    n_levels = len(prev_pyr)
    scale = 2.0 ** (n_levels - 1)
    guess = (pts_prev if init_flow is None else pts_prev + init_flow) / scale
    status = valid
    for lvl in range(n_levels - 1, -1, -1):
        p_l = pts_prev / (2.0 ** lvl)
        guess, ok, _eig = _track_level(
            prev_pyr[lvl], cur_pyr[lvl], prev_dx[lvl], prev_dy[lvl],
            p_l, guess, valid, params)
        if lvl == 0:
            status = status & ok
        else:
            # keep coarse failures alive but reset their guess to identity
            guess = jnp.where(ok[:, None], guess, p_l)
            guess = guess * 2.0
    return guess, status


@functools.partial(jax.jit, static_argnames=("levels",))
def precompute_frame(gray: jnp.ndarray, levels: int):
    """Build (pyramid, dx, dy) tuples for one frame (reused as `prev`)."""
    pyr = image_ops.build_pyramid(gray, levels)
    dxs, dys = [], []
    for img in pyr:
        dx, dy = image_ops.scharr_derivatives(img)
        dxs.append(dx)
        dys.append(dy)
    return tuple(pyr), tuple(dxs), tuple(dys)

"""Image preprocessing ops: undistort-remap, gray, CLAHE, pyramids, Scharr.

TPU-native replacements for the OpenCV calls in imageProcessing
(/root/reference/src/imageProcessing.cpp:89-200) and the pyramid/derivative
machinery of the vendored LK kernel (/root/reference/src/lkpyramid.cpp).
Images are f32 arrays scaled 0..255 (matching the reference's uint8
constants); all ops are batched, fixed-shape, jit-safe.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# BT.601 luma weights (cv::COLOR_RGB2GRAY).
_LUMA = (0.299, 0.587, 0.114)


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) -> (H, W) with OpenCV RGB2GRAY weights."""
    return (img[..., 0] * _LUMA[0] + img[..., 1] * _LUMA[1]
            + img[..., 2] * _LUMA[2])


def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray,
                    clamp: bool = True) -> jnp.ndarray:
    """Sample img ((H, W) or (H, W, C)) at uv (..., 2) = (u=x=col, v=y=row).

    Matches getSubPixel (lioOptimization.cpp:71-97): bilinear over the four
    neighbors; coordinates are clamped to the valid interior when `clamp`.
    """
    h, w = img.shape[0], img.shape[1]
    u = uv[..., 0]
    v = uv[..., 1]
    if clamp:
        u = jnp.clip(u, 0.0, w - 1.001)
        v = jnp.clip(v, 0.0, h - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = (u - u0)[..., None] if img.ndim == 3 else (u - u0)
    fv = (v - v0)[..., None] if img.ndim == 3 else (v - v0)
    u1 = jnp.clip(u0 + 1, 0, w - 1)
    v1 = jnp.clip(v0 + 1, 0, h - 1)
    p00 = img[v0, u0]
    p01 = img[v0, u1]
    p10 = img[v1, u0]
    p11 = img[v1, u1]
    return ((1 - fv) * (1 - fu) * p00 + (1 - fv) * fu * p01
            + fv * (1 - fu) * p10 + fv * fu * p11)


def extract_patches(img: jnp.ndarray, top_left: jnp.ndarray,
                    size: int) -> jnp.ndarray:
    """Gather (M, size, size) contiguous patches from a 2-D image.

    top_left: (M, 2) int32 (row, col).  Uses one XLA gather with 2-D slice
    sizes — contiguous row slices are ~2 orders of magnitude cheaper on TPU
    than per-element window gathers.  Start indices are clamped in-bounds
    (XLA gather clip semantics)."""
    ph = max(size - img.shape[0], 0)
    pw = max(size - img.shape[1], 0)
    if ph or pw:   # tiny pyramid levels can be smaller than the window
        img = jnp.pad(img, ((0, ph), (0, pw)), mode="edge")
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    return jax.lax.gather(img, top_left, dn, slice_sizes=(size, size),
                          mode=jax.lax.GatherScatterMode.CLIP)


def sample_windows_bilinear(img: jnp.ndarray, centers: jnp.ndarray,
                            window: int) -> jnp.ndarray:
    """Bilinear (M, window, window) windows centered at fractional pixel
    positions `centers` (M, 2) as (u=x, v=y).

    One contiguous (window+1)^2 patch gather per point + shifted-slice
    bilinear blend (the TPU-friendly formulation of the reference's
    per-pixel subpixel window reads, lkpyramid.cpp:231-334)."""
    half = (window - 1) // 2
    u = centers[:, 0] - half
    v = centers[:, 1] - half
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[:, None, None]
    fv = (v - v0)[:, None, None]
    top_left = jnp.stack([v0.astype(jnp.int32), u0.astype(jnp.int32)],
                         axis=-1)
    p = extract_patches(img, top_left, window + 1)     # (M, W+1, W+1)
    return ((1 - fv) * (1 - fu) * p[:, :window, :window]
            + (1 - fv) * fu * p[:, :window, 1:]
            + fv * (1 - fu) * p[:, 1:, :window]
            + fv * fu * p[:, 1:, 1:])


def make_undistort_map(intrinsic: np.ndarray, dist: np.ndarray,
                       size: Tuple[int, int]) -> np.ndarray:
    """Host-side (H, W, 2) source-pixel map for plumb-bob undistortion.

    Equivalent of cv::initUndistortRectifyMap with new_K == K
    (imageProcessing.cpp:103): for each undistorted pixel, the distorted
    source coordinate (k1, k2, p1, p2, k3 model).
    """
    h, w = size
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    k1, k2, p1, p2, k3 = [float(d) for d in np.asarray(dist).ravel()[:5]]
    us, vs = np.meshgrid(np.arange(w), np.arange(h))
    x = (us - cx) / fx
    y = (vs - cy) / fy
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([xd * fx + cx, yd * fy + cy], axis=-1).astype(np.float32)


def remap(img: jnp.ndarray, src_map: jnp.ndarray) -> jnp.ndarray:
    """Apply an (H, W, 2) source map with bilinear sampling (cv::remap)."""
    return bilinear_sample(img, src_map)


def clahe(gray: jnp.ndarray, clip_limit: float, n_tiles: int,
          n_bins: int = 256) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalization.

    Equivalent of cv::createCLAHE(amp, tiles)->apply (imageEqualize,
    imageProcessing.cpp:166-173): per-tile clipped histogram -> CDF LUTs,
    bilinearly interpolated between the four surrounding tile LUTs.
    The image is padded to a tile multiple with edge replication.
    """
    h, w = gray.shape
    th = -(-h // n_tiles)
    tw = -(-w // n_tiles)
    ph, pw = th * n_tiles, tw * n_tiles
    img = jnp.pad(gray, ((0, ph - h), (0, pw - w)), mode="edge")

    tiles = img.reshape(n_tiles, th, n_tiles, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(n_tiles * n_tiles, th * tw)
    q = jnp.clip(tiles.astype(jnp.int32), 0, n_bins - 1)
    # per-tile histogram via one flat scatter-add (a one-hot formulation
    # materializes a (T, px, 256) tensor — hundreds of MB at VGA sizes)
    n_t = n_tiles * n_tiles
    flat_bins = (jnp.arange(n_t, dtype=jnp.int32)[:, None] * n_bins
                 + q).reshape(-1)
    hist = jnp.zeros((n_t * n_bins,), jnp.float32).at[flat_bins].add(1.0)
    hist = hist.reshape(n_t, n_bins)

    # Clip + uniform redistribution (single pass, as OpenCV does).
    tile_px = th * tw
    limit = jnp.maximum(clip_limit * tile_px / n_bins, 1.0)
    clipped = jnp.minimum(hist, limit)
    excess = jnp.sum(hist - clipped, axis=-1, keepdims=True)
    clipped = clipped + excess / n_bins

    cdf = jnp.cumsum(clipped, axis=-1)
    # LUT: scale CDF to 0..255 (OpenCV: lutScale = 255 / tile_px).
    lut = cdf * (255.0 / tile_px)                       # (T, bins)
    lut = lut.reshape(n_tiles, n_tiles, n_bins)

    # Per-pixel interpolation between the 4 surrounding tile LUTs.  The
    # x-side tile blend is folded into per-row-tile tables
    # A[r, x, b] = sum_t w_x[x, t] * lut[r, t, b] (tiny matmuls), after
    # which the application is ONE flat gather per y-side:
    # out0[y, x] = A[ty0[y], x, q[y, x]].  This avoids materializing a
    # (H, W, 256) one-hot tensor (hundreds of MB of HBM traffic at VGA).
    ys = jnp.arange(ph, dtype=jnp.float32)
    xs = jnp.arange(pw, dtype=jnp.float32)
    ty = (ys - th / 2.0 + 0.5) / th
    tx = (xs - tw / 2.0 + 0.5) / tw
    ty0 = jnp.clip(jnp.floor(ty).astype(jnp.int32), 0, n_tiles - 1)
    tx0 = jnp.clip(jnp.floor(tx).astype(jnp.int32), 0, n_tiles - 1)
    ty1 = jnp.clip(ty0 + 1, 0, n_tiles - 1)
    tx1 = jnp.clip(tx0 + 1, 0, n_tiles - 1)
    fy = jnp.clip(ty - ty0, 0.0, 1.0)[:, None]
    fx = jnp.clip(tx - tx0, 0.0, 1.0)

    # x-side blend folded into a dense (pw, T) weight matrix.
    w_x = (jnp.zeros((pw, n_tiles), img.dtype)
           .at[jnp.arange(pw), tx0].add(1.0 - fx)
           .at[jnp.arange(pw), tx1].add(fx))
    a_tab = jnp.einsum("xt,rtb->rxb", w_x, lut,
                       preferred_element_type=img.dtype)  # (T, pw, bins)
    a_flat = a_tab.reshape(-1)
    qimg = jnp.clip(img.astype(jnp.int32), 0, n_bins - 1)
    base = jnp.arange(pw, dtype=jnp.int32)[None, :] * n_bins + qimg
    out0 = jnp.take(a_flat, ty0[:, None] * (pw * n_bins) + base)
    out1 = jnp.take(a_flat, ty1[:, None] * (pw * n_bins) + base)
    out = (1 - fy) * out0 + fy * out1
    return out[:h, :w]


def clahe_tiles_for_width(width: int) -> int:
    """Reference tile-count rule (imageProcessing.cpp:169)."""
    return max(int(width * 32.0 / 640.0), 4)


_RGB2YCRCB = np.array([[0.299, 0.587, 0.114],
                       [0.5, -0.418688, -0.081312],
                       [-0.168736, -0.331264, 0.5]])
_YCRCB2RGB = np.linalg.inv(_RGB2YCRCB)


def equalize_color_ycrcb(img: jnp.ndarray, n_tiles: int) -> jnp.ndarray:
    """CLAHE on the Y channel of YCrCb (equalizeColorImageYcrcb,
    imageProcessing.cpp:185-200), clip limit 1."""
    m = jnp.asarray(_RGB2YCRCB, img.dtype)
    ycc = img @ m.T
    y = clahe(ycc[..., 0], 1.0, n_tiles)
    ycc = ycc.at[..., 0].set(y)
    out = ycc @ jnp.asarray(_YCRCB2RGB, img.dtype).T
    return jnp.clip(out, 0.0, 255.0)


def _conv_sep(img: jnp.ndarray, k: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Small odd-length 1-D convolution along `axis` of a 2-D image as
    shifted-slice adds (zero border).  Pure VPU elementwise work — single-
    channel conv ops lower poorly on TPU (no MXU mapping at C=1)."""
    taps = k.shape[0]
    r = taps // 2
    pad = [(r, r) if a == axis else (0, 0) for a in range(2)]
    p = jnp.pad(img, pad)
    h, w = img.shape
    out = None
    for i in range(taps):
        sl = (slice(i, i + h), slice(None)) if axis == 0 \
            else (slice(None), slice(i, i + w))
        term = k[i] * p[sl]    # correlation order (lax.conv semantics)
        out = term if out is None else out + term
    return out


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """Gaussian 5x5 blur + 2x decimation (cv::pyrDown equivalent)."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], img.dtype) / 16.0
    x = _conv_sep(img, k, axis=1)
    x = _conv_sep(x, k, axis=0)
    return x[::2, ::2]


def build_pyramid(gray: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """List of `levels + 1` images, level 0 = full resolution."""
    pyr = [gray]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def scharr_derivatives(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scharr x/y derivatives with the reference's 1/32 scaling
    (calcSharrDeriv, lkpyramid.cpp:57-150: smooth [3 10 3], diff [-1 0 1],
    stored as int16 without normalization; the LK solver folds the scale
    via FLT_SCALE — here we keep float and normalize by 32)."""
    smooth = jnp.asarray([3.0, 10.0, 3.0], img.dtype)
    diff = jnp.asarray([-1.0, 0.0, 1.0], img.dtype)

    def sep(kx, ky):
        return _conv_sep(_conv_sep(img, kx, axis=1), ky, axis=0)

    dx = sep(diff, smooth) / 32.0
    dy = sep(smooth, diff) / 32.0
    return dx, dy

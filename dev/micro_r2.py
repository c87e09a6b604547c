"""Round-2 micro-benchmarks: sub-stage device times for preprocess and
vision-step components at bench shapes (512x640, 300 tracks, 2^20 registry).
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(name, fn, *args, n=20, **kw):
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    print(f"{name:<28} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
    return out


def main():
    from sr_livo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from sr_livo_tpu.ops import image_ops, lk, ransac, color_map as cm
    from sr_livo_tpu.models import camera as cam_mod

    H, W = 512, 640
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    gray = image_ops.rgb_to_gray(img)
    n_tiles = 32

    timeit("clahe(gray, 3.0)", jax.jit(lambda g: image_ops.clahe(g, 3.0, n_tiles)), gray)
    timeit("equalize_ycrcb", jax.jit(lambda i: image_ops.equalize_color_ycrcb(i, n_tiles)), img)

    # CLAHE parts
    @jax.jit
    def hist_part(g):
        h, w = g.shape
        th, tw = -(-h // n_tiles), -(-w // n_tiles)
        im = jnp.pad(g, ((0, th * n_tiles - h), (0, tw * n_tiles - w)),
                     mode="edge")
        tiles = im.reshape(n_tiles, th, n_tiles, tw).transpose(0, 2, 1, 3)
        tiles = tiles.reshape(n_tiles * n_tiles, th * tw)
        q = jnp.clip(tiles.astype(jnp.int32), 0, 255)
        n_t = n_tiles * n_tiles
        flat = (jnp.arange(n_t, dtype=jnp.int32)[:, None] * 256 + q).reshape(-1)
        hist = jnp.zeros((n_t * 256,), jnp.float32).at[flat].add(1.0)
        return hist

    timeit("clahe hist scatter", hist_part, gray)

    @jax.jit
    def apply_part(g, a_flat, ty0, ty1, fy):
        pw = 640
        qimg = jnp.clip(g.astype(jnp.int32), 0, 255)
        base = jnp.arange(pw, dtype=jnp.int32)[None, :] * 256 + qimg
        out0 = jnp.take(a_flat, ty0[:, None] * (pw * 256) + base)
        out1 = jnp.take(a_flat, ty1[:, None] * (pw * 256) + base)
        return (1 - fy) * out0 + fy * out1

    a_flat = jnp.zeros((n_tiles * 640 * 256,), jnp.float32)
    ty0 = jnp.zeros((H,), jnp.int32)
    ty1 = jnp.ones((H,), jnp.int32)
    fy = jnp.zeros((H, 1), jnp.float32)
    timeit("clahe apply gathers", apply_part, gray, a_flat, ty0, ty1, fy)

    # LK
    M = 300
    params = lk.LkParams(window=21, levels=3, iters=10)
    pyr = lk.precompute_frame(gray, params.levels)
    jax.block_until_ready(pyr)
    pts = jnp.asarray(rng.uniform(30, 400, (M, 2)).astype(np.float32))
    valid = jnp.ones((M,), bool)
    timeit("lk.track_pyramidal", lk.track_pyramidal,
           pyr[0], pyr[0], pyr[1], pyr[2], pts, valid, params)

    key = jax.random.PRNGKey(0)
    cur = pts + 1.0
    status = valid
    timeit("fundamental_ransac", ransac.fundamental_ransac, pts, cur,
           status, key)

    pw3 = jnp.asarray(rng.uniform(-5, 5, (M, 3)).astype(np.float32))
    intr = jnp.asarray([420.0, 420.0, 320.0, 256.0], jnp.float32)
    q0 = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t0_ = jnp.zeros((3,), jnp.float32)
    timeit("pnp_ransac", ransac.pnp_ransac, pw3, cur, status, q0, t0_,
           intr, key)

    camera = cam_mod.init_camera_state(np.eye(3), np.zeros(3),
                                       np.asarray(intr))
    vel = jnp.zeros((M, 2), jnp.float32)
    timeit("vio_esikf", jax.jit(lambda *a: cam_mod.vio_esikf(
        *a, estimate_intrinsic=True, estimate_extrinsic=True)),
        camera, q0, t0_, pw3, cur, vel, status, jnp.int32(1))
    rgbv = jnp.asarray(rng.uniform(0, 255, (M, 3)).astype(np.float32))
    covv = jnp.full((M, 3), 15.0, jnp.float32)
    nv = jnp.full((M,), 5.0, jnp.float32)
    timeit("vio_photometric", cam_mod.vio_photometric,
           camera, q0, t0_, img, pw3, rgbv, covv, nv, vel, status,
           jnp.int32(1))

    # color map render/select/insert at bench shapes
    cmap = cm.make_color_map(1 << 20, 1 << 19, 20, recent=2048)
    pts_w = jnp.asarray(rng.uniform(-10, 10, (2048, 3)).astype(np.float32))
    pv = jnp.ones((2048,), bool)
    cmap, _ = cm.color_insert(cmap, pts_w, pv, 0.1, voxel_size=0.1,
                              min_distance=0.01, max_probe=8, budget=2048)
    jax.block_until_ready(cmap.reg)

    def ins(c):
        c2, n = cm.color_insert(c, pts_w, pv, 0.2, voxel_size=0.1,
                                min_distance=0.01, max_probe=8, budget=2048)
        return c2

    # NOTE: donation — rebind each call
    c = cmap
    import jax as _jax
    out = ins(c)
    _jax.block_until_ready(out.reg)
    t0n = time.perf_counter()
    for _ in range(20):
        out = ins(out)
    _jax.block_until_ready(out.reg)
    print(f"{'color_insert(2048)':<28} {(time.perf_counter()-t0n)/20*1e3:8.2f} ms")
    cmap = out

    timeit("render_recent", cm.render_recent, cmap, img, q0, t0_, t0_,
           intr, 0.3, cols=W, rows=H, max_render_points=8192)
    timeit("select_points", cm.select_points_for_projection, cmap, q0,
           t0_, t0_, intr, 0.3, max_out=300, cols=W, rows=H, grid_px=16)


if __name__ == "__main__":
    main()

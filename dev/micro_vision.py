"""Vision-path micro-bench with device-resident inputs + transfer costs."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, n=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from sr_livo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)

    # -- host->device transfer costs through the tunnel --
    for shape, dtype in [((512, 640, 3), np.uint8), ((512, 640, 3), np.float32),
                         ((16384, 3), np.float32), ((256, 256), np.float32)]:
        a = rng.uniform(0, 255, shape).astype(dtype)
        nbytes = a.nbytes
        ms = timeit(lambda: jax.device_put(a), n=10)
        print(f"device_put {str(shape):16s} {str(np.dtype(dtype)):8s} "
              f"{nbytes/1024:8.0f} KB  {ms:8.2f} ms")

    # -- device->host readback --
    d = jax.device_put(rng.uniform(0, 1, (17,)).astype(np.float32))
    print(f"readback tiny (17,)     {timeit(lambda: np.asarray(d), n=10):8.2f} ms")
    d2 = jax.device_put(rng.uniform(0, 1, (8192, 3)).astype(np.float32))
    print(f"readback (8192,3)       {timeit(lambda: np.asarray(d2), n=10):8.2f} ms")

    # -- vision step with fully device-resident args --
    from sr_livo_tpu.config import LivoConfig
    from sr_livo_tpu.models.vision import VisionModule, _vision_step
    from sr_livo_tpu.ops import lk, color_map as cm

    cfg = LivoConfig()
    cfg.camera_options.image_width = 1280
    cfg.camera_options.image_height = 1024
    cfg.camera_options.image_scale = 0.5
    cfg.camera_options.camera_intrinsic = [
        863.0, 0.0, 640.0, 0.0, 863.0, 512.0, 0, 0, 1]
    cfg.camera_options.camera_dist_coeffs = [-0.1, 0.1, 0.0, 0.0, 0.0]
    vmod = VisionModule(cfg)
    print(f"processed size: {vmod.rows}x{vmod.cols}")

    img_dev = jax.device_put(
        rng.uniform(0, 255, (vmod.rows, vmod.cols, 3)).astype(np.float32))
    import jax as _jax
    pre_jit = _jax.jit(vmod._preprocess_core)
    ms_pre = timeit(lambda: pre_jit(img_dev))
    print(f"preprocess (device img) {ms_pre:8.2f} ms")

    rgb, gray = pre_jit(img_dev)
    pyr = lk.precompute_frame(gray, vmod.lk_params.levels)
    print(f"pyramid+scharr          {timeit(lambda: lk.precompute_frame(gray, vmod.lk_params.levels)):8.2f} ms")

    n_seed = 20000
    pts = rng.uniform(-8, 8, (n_seed, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0, 3, n_seed)
    pts_dev = jax.device_put(pts)
    ones = jnp.ones(n_seed, bool)
    vmod.insert_sweep_points(pts_dev, ones, jnp.asarray(True), 0.1)
    q_wi = jax.device_put(np.array([1.0, 0, 0, 0], np.float32))
    t_wi = jax.device_put(np.zeros(3, np.float32))
    vmod._init_tracks(q_wi, t_wi, 0.1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    scal = jax.device_put(np.array([0.033, 0.2], np.float32))
    nv = jax.device_put(np.int32(100))

    def run_vision():
        cam, cmap_, trk, a, b = _vision_step(
            vmod.camera, vmod.color_map, vmod.tracks, pyr, pyr, rgb,
            q_wi, t_wi, scal, nv, k1,
            lk_params=vmod.lk_params, cols=vmod.cols, rows=vmod.rows,
            track_grid=vmod.track_grid,
            max_render_points=cfg.shapes.max_render_points,
            estimate_intrinsic=True, estimate_extrinsic=True)
        vmod.color_map, vmod.tracks = cmap_, trk
        return a
    print(f"_vision_step (device)   {timeit(run_vision):8.2f} ms")

    # color insert with device-resident points
    sub = jax.device_put(pts[:8192])
    subv = jnp.ones(8192, bool)
    otime = jax.device_put(np.float32(0.3))

    import copy as _copy
    _cs = [jax.tree_util.tree_map(jnp.copy, vmod.color_map)]

    def run_ins():
        m, _ = cm.color_insert(
            _cs[0], sub, subv, otime,
            voxel_size=cfg.map_options.size_voxel_map,
            min_distance=cfg.map_options.min_distance_points,
            max_probe=cfg.shapes.map_max_probe,
            budget=cfg.shapes.max_insert_points)
        _cs[0] = m
        return m.count
    print(f"color_insert (device)   {timeit(run_ins):8.2f} ms")

    # LK tracker alone
    from sr_livo_tpu.models.vision import make_tracks
    tr = vmod.tracks

    def run_lk():
        return lk.track_pyramidal(pyr[0], pyr[0], pyr[1], pyr[2],
                                  tr.px, tr.active, vmod.lk_params)
    print(f"lk.track_pyramidal      {timeit(run_lk):8.2f} ms")

    # render_recent alone
    from sr_livo_tpu.models import camera as cam_mod
    _, t_wc, q_cw, t_cw = cam_mod.world_camera_pose(vmod.camera, q_wi, t_wi)
    rr = jax.jit(lambda cmap, img: cm.render_recent(
        cmap, img, q_cw, t_cw, t_wc, vmod.camera.intr, ot,
        cols=vmod.cols, rows=vmod.rows))
    print(f"render_recent           {timeit(lambda: rr(vmod.color_map, rgb)):8.2f} ms")

    sel = jax.jit(lambda cmap: cm.select_points_for_projection(
        cmap, q_cw, t_cw, t_wc, vmod.camera.intr, ot,
        max_out=300, cols=vmod.cols, rows=vmod.rows,
        grid_px=vmod.track_grid))
    print(f"select_for_projection   {timeit(lambda: sel(vmod.color_map)):8.2f} ms")


if __name__ == "__main__":
    main()

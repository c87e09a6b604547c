"""In-program ablation of _vision_step: compile truncated variants so each
stage's cost is the delta between consecutive variants.

    python scripts/ablate_vision.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, n=30, warmup=5):
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
    from sr_livo_tpu.config import LivoConfig
    from sr_livo_tpu.models import camera as cam_mod
    from sr_livo_tpu.models.vision import VisionModule
    from sr_livo_tpu.ops import color_map as cm
    from sr_livo_tpu.ops import image_ops, lk, ransac

    print("backend:", jax.default_backend())
    cfg = LivoConfig()
    rng = np.random.RandomState(0)
    H, W = 512, 640
    img = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)

    vmod = VisionModule(cfg)
    vmod.cols, vmod.rows = W, H
    rgb, gray = vmod.preprocess(img)
    pyr = lk.precompute_frame(gray, vmod.lk_params.levels)

    n_seed = 20000
    pts = rng.uniform(-8, 8, (n_seed, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0.5, 3, n_seed)
    vmod.insert_sweep_points(jnp.asarray(pts), jnp.ones(n_seed, bool),
                             jnp.asarray(True), 0.1)
    q_wi = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t_wi = jnp.zeros(3, jnp.float32)
    vmod._init_tracks(q_wi, t_wi, 0.1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    dt = jnp.float32(0.033)
    ot = jnp.float32(0.1)   # matches insert time => voxels are "recent"
    nv = jnp.int32(100)

    lk_params = vmod.lk_params
    cols, rows = vmod.cols, vmod.rows
    track_grid = vmod.track_grid
    max_render_voxels = cfg.shapes.max_render_voxels

    def make(stage):
        @functools.partial(jax.jit, static_argnames=())
        def f(camera, color_map, tracks, prev_pyr, cur_pyr, rgb_img,
              q_wi, t_wi, dt, obs_time, n_new_visited, key_f, key_pnp):
            m = tracks.reg_id.shape[0]
            registry = color_map.reg.shape[0]
            prev_imgs, prev_dx, prev_dy = prev_pyr
            cur_imgs, _, _ = cur_pyr

            n_active = jnp.sum(tracks.active)
            track_ok_gate = n_active >= 30
            cur_px, status = lk.track_pyramidal(
                prev_imgs, cur_imgs, prev_dx, prev_dy, tracks.px,
                tracks.active, lk_params)
            status = status & tracks.active & track_ok_gate
            if stage == "lk":
                return cur_px, status

            f_inl = ransac.fundamental_ransac(tracks.px, cur_px, status,
                                              key_f)
            status = status & f_inl
            if stage == "fransac":
                return cur_px, status

            uv_ok = cm.in_fov(cur_px, cols, rows, 0.05)
            status = status & uv_ok
            vel = (cur_px - tracks.px) / jnp.maximum(dt, 1e-5)
            vel = jnp.where(dt < 1e-5, jnp.full_like(vel, 1e-3), vel)
            ids_c = jnp.clip(tracks.reg_id, 0, registry - 1)
            reg_rows = color_map.reg[ids_c]
            reg_rows = reg_rows.at[:, cm.C_VEL].set(
                jnp.where(status[:, None], vel, reg_rows[:, cm.C_VEL]))
            oob = registry + jnp.arange(m, dtype=jnp.int32)
            color_map = color_map._replace(
                reg=color_map.reg.at[jnp.where(status, ids_c, oob)].set(
                    reg_rows, mode="drop", unique_indices=True))
            if stage == "vel":
                return color_map.count, status

            pts_world = reg_rows[:, cm.C_POS]
            _, _, q_cw0, t_cw0 = cam_mod.world_camera_pose(camera, q_wi,
                                                           t_wi)
            pnp_inl, _q, _t = ransac.pnp_ransac(
                pts_world, cur_px, status, q_cw0, t_cw0, camera.intr,
                key_pnp)
            status = status & pnp_inl
            enough = jnp.sum(status) >= cam_mod.MIN_ITERATION_POINTS
            if stage == "pnp":
                return status, enough

            img_vel_pts = reg_rows[:, cm.C_VEL]
            camera, _ok1 = cam_mod.vio_esikf(
                camera, q_wi, t_wi, pts_world, cur_px, img_vel_pts,
                status & enough, n_new_visited,
                estimate_intrinsic=True, estimate_extrinsic=True)
            if stage == "esikf":
                return camera.intr, status

            camera, _ok2 = cam_mod.vio_photometric(
                camera, q_wi, t_wi, rgb_img, pts_world,
                reg_rows[:, cm.C_RGB], reg_rows[:, cm.C_COV],
                reg_rows[:, cm.C_NRGB], img_vel_pts, status & enough,
                n_new_visited)
            if stage == "photo":
                return camera.intr, status

            _, t_wc, q_cw, t_cw = cam_mod.world_camera_pose(camera, q_wi,
                                                            t_wi)
            color_map = cm.render_recent(
                color_map, rgb_img, q_cw, t_cw, t_wc, camera.intr,
                obs_time, cols=cols,
                rows=rows)
            if stage == "render":
                return color_map.count, status

            cand_ids, cand_uv, cand_ok = cm.select_points_for_projection(
                color_map, q_cw, t_cw, t_wc, camera.intr, obs_time,
                max_out=m, cols=cols,
                rows=rows, grid_px=track_grid)
            return cand_ids, status

        return f

    args = (vmod.camera, vmod.color_map, vmod.tracks, pyr, pyr, rgb,
            q_wi, t_wi, dt, ot, nv, k1, k2)
    prev = 0.0
    for stage in ("lk", "fransac", "vel", "pnp", "esikf", "photo",
                  "render", "select"):
        f = make(stage)
        t = timeit(lambda: f(*args))
        print(f"  upto {stage:8s} {t:8.2f} ms  (+{t - prev:6.2f})")
        prev = t


if __name__ == "__main__":
    main()

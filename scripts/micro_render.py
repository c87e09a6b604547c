"""Bisect render_recent + color_insert costs on TPU."""
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
    import functools
    from sr_livo_tpu.config import LivoConfig
    from sr_livo_tpu.models.vision import VisionModule
    from sr_livo_tpu.models import camera as cam_mod
    from sr_livo_tpu.ops import color_map as cm
    from sr_livo_tpu.ops import image_ops, voxel_map as vm

    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    cfg = LivoConfig()
    cfg.camera_options.image_width = 1280
    cfg.camera_options.image_height = 1024
    cfg.camera_options.image_scale = 0.5
    cfg.camera_options.camera_intrinsic = [
        863.0, 0.0, 640.0, 0.0, 863.0, 512.0, 0, 0, 1]
    cfg.camera_options.camera_dist_coeffs = [0, 0, 0, 0, 0]
    vmod = VisionModule(cfg)
    print(f"registry={cfg.shapes.color_registry} "
          f"capacity={cfg.shapes.color_capacity} "
          f"K={cfg.shapes.color_voxel_points} "
          f"max_render_voxels={cfg.shapes.max_render_voxels} "
          f"max_probe={cfg.shapes.map_max_probe} "
          f"budget={cfg.shapes.max_insert_points}")

    n_seed = 20000
    pts = rng.uniform(-8, 8, (n_seed, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(0, 3, n_seed)
    vmod.insert_sweep_points(jax.device_put(pts), jnp.ones(n_seed, bool), 0.1)
    cmap = vmod.color_map
    rgb = jax.device_put(
        rng.uniform(0, 255, (vmod.rows, vmod.cols, 3)).astype(np.float32))
    q_wi = jax.device_put(np.array([1.0, 0, 0, 0], np.float32))
    t_wi = jax.device_put(np.zeros(3, np.float32))
    _, t_wc, q_cw, t_cw = cam_mod.world_camera_pose(vmod.camera, q_wi, t_wi)
    ot = jax.device_put(np.float32(0.1))
    V = cfg.shapes.max_render_voxels
    K = cmap.vox.block_capacity
    registry = cmap.pos.shape[0]

    # full render
    rr = jax.jit(functools.partial(
        cm.render_recent, cols=vmod.cols,
        rows=vmod.rows))
    print(f"render_recent full      "
          f"{timeit(lambda: rr(cmap, rgb, q_cw, t_cw, t_wc, vmod.camera.intr, ot)):8.2f} ms")

    # stage 1: top_k + id/count gathers
    @jax.jit
    def s1(cmap, ot):
        recent = cmap.vox_last_visit == ot
        _, slot_idx = jax.lax.top_k(recent.astype(jnp.float32), V)
        slot_ok = recent[slot_idx]
        ids = vm.gather_blocks(cmap.vox.point_ids, slot_idx, K)
        cnt = jnp.where(slot_ok, cmap.vox.counts[slot_idx], 0)
        return ids, cnt
    print(f"  topk+ids+cnt          {timeit(lambda: s1(cmap, ot)):8.2f} ms")
    ids, cnt = s1(cmap, ot)

    # stage 2: registry gathers
    @jax.jit
    def s2(cmap, ids, cnt):
        id_ok = (jnp.arange(K)[None, :] < cnt[:, None]) & (ids >= 0)
        idsf = ids.reshape(-1)
        ids_c = jnp.clip(idsf, 0, registry - 1)
        ok = id_ok.reshape(-1) & cmap.reg_valid[ids_c]
        pts = cmap.pos[ids_c]
        return pts, ok, ids_c
    print(f"  registry gathers      {timeit(lambda: s2(cmap, ids, cnt)):8.2f} ms")
    ptsr, okr, ids_c = s2(cmap, ids, cnt)

    # stage 3: project + bilinear image sample
    @jax.jit
    def s3(pts, ok, rgb):
        uv, z_ok, _ = cm.project_points(pts, q_cw, t_cw, vmod.camera.intr)
        vis = ok & z_ok & cm.in_fov(uv, vmod.cols, vmod.rows, 0.005)
        color = image_ops.bilinear_sample(rgb, uv)
        return color, vis, uv
    print(f"  project+img sample    {timeit(lambda: s3(ptsr, okr, rgb)):8.2f} ms")
    color, vis, _ = s3(ptsr, okr, rgb)

    # stage 4: update_rgb (gathers + scatters on registry)
    @jax.jit
    def s4(cmap, ids_c, color, vis, ot):
        depth = jnp.linalg.norm(cmap.pos[ids_c] - t_wc[None, :], axis=-1)
        return cm.update_rgb(cmap, ids_c, color, depth, ot, vis)
    print(f"  update_rgb            {timeit(lambda: s4(cmap, ids_c, color, vis, ot)):8.2f} ms")

    # color_insert bisect: dedup claim vs vm.insert
    sub = jax.device_put(pts[:8192])
    subv = jnp.ones(8192, bool)

    @jax.jit
    def d1(cmap, sub, subv):
        dd = vm.voxel_coords(sub, cfg.map_options.min_distance_points)
        return cm._claim_dedup(cmap.dedup_sig, dd, subv,
                               cfg.shapes.map_max_probe)
    print(f"  dedup claim           {timeit(lambda: d1(cmap, sub, subv)):8.2f} ms")

    @jax.jit
    def d2(cmap, sub, subv):
        return vm.insert(cmap.vox, sub, subv,
                         cfg.map_options.size_voxel_map, 0.0,
                         cfg.shapes.map_max_probe,
                         budget=cfg.shapes.max_insert_points)
    print(f"  vox insert            {timeit(lambda: d2(cmap, sub, subv)):8.2f} ms")

    ci = jax.jit(functools.partial(
        cm.color_insert, voxel_size=cfg.map_options.size_voxel_map,
        min_distance=cfg.map_options.min_distance_points,
        max_probe=cfg.shapes.map_max_probe,
        budget=cfg.shapes.max_insert_points))
    _cs = [jax.tree_util.tree_map(jnp.copy, cmap)]

    def run_ci():
        m, _ = ci(_cs[0], sub, subv, ot)
        _cs[0] = m
        return m.count
    print(f"color_insert full       {timeit(run_ci):8.2f} ms")


if __name__ == "__main__":
    main()

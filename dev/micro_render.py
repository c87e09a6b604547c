"""Break down render_recent + color_insert device time by phase."""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(name, fn, *args, n=30, **kw):
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    print(f"{name:<34} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")
    return out


def main():
    from sr_livo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from sr_livo_tpu.ops import image_ops, color_map as cm
    from sr_livo_tpu.ops import voxel_map as vm

    H, W = 512, 640
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    intr = jnp.asarray([420.0, 420.0, 320.0, 256.0], jnp.float32)
    q0 = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    t0_ = jnp.zeros((3,), jnp.float32)

    cmap = cm.make_color_map(1 << 20, 1 << 19, 20, recent=2048)
    # fill with several batches so blocks have real occupancy
    for i in range(6):
        pts_w = jnp.asarray(
            rng.uniform(-8, 8, (2048, 3)).astype(np.float32) + 0.02 * i)
        pv = jnp.ones((2048,), bool)
        cmap, _ = cm.color_insert(cmap, pts_w, pv, 0.1 * i, voxel_size=0.1,
                                  min_distance=0.01, max_probe=8, budget=2048)
    jax.block_until_ready(cmap.reg)
    print("map pts:", int(vm.map_size(cmap.vox)),
          "recent:", int(jnp.sum(cmap.recent_slots >= 0)))

    K = cmap.vox.block_capacity
    slot_idx = jnp.clip(cmap.recent_slots, 0, cmap.vox_last_visit.shape[0] - 1)

    @jax.jit
    def phase_gather(c):
        ids = vm.gather_blocks(c.vox.point_ids, slot_idx, K)
        pts_blk = vm.gather_blocks(c.vox.points, slot_idx, K)
        cnt = c.vox.counts[slot_idx]
        return ids, pts_blk, cnt

    ids, pts_blk, cnt = timeit("gather blocks (2048x20)", phase_gather, cmap)

    ids_f = ids.reshape(-1)
    pts_all = pts_blk.reshape(-1, 3)
    id_ok = (jnp.arange(K)[None, :] < cnt[:, None]).reshape(-1) & (ids_f >= 0)

    @jax.jit
    def phase_proj(pts_all):
        uv, z_ok, _ = cm.project_points(pts_all, q0, t0_, intr)
        vis = id_ok & z_ok & cm.in_fov(uv, W, H, 0.005)
        return uv, vis

    uv_all, vis = timeit("project+fov (40960)", phase_proj, pts_all)

    R = 8192

    @jax.jit
    def phase_compact(vis):
        rank = jnp.cumsum(vis.astype(jnp.int32)) - 1
        dst = jnp.where(vis & (rank < R), rank, R)
        n_all = ids_f.shape[0]
        sel = jnp.zeros((R,), jnp.int32).at[dst].set(
            jnp.arange(n_all, dtype=jnp.int32), mode="drop",
            unique_indices=True)
        live = jnp.zeros((R,), bool).at[dst].set(True, mode="drop",
                                                 unique_indices=True)
        return sel, live

    sel, live = timeit("compact to 8192", phase_compact, vis)

    @jax.jit
    def phase_reggather(c, sel):
        ids_c = jnp.clip(ids_f[sel], 0, c.reg.shape[0] - 1)
        return ids_c, c.reg[ids_c]

    ids_c, reg_rows = timeit("registry row gather (8192x16)",
                             phase_reggather, cmap, sel)

    @jax.jit
    def phase_sample(sel):
        return image_ops.bilinear_sample(img, uv_all[sel])

    timeit("bilinear sample (8192x3)", phase_sample, sel)

    @jax.jit
    def phase_update(c, ids_c, reg_rows, live, sel):
        pts = pts_all[sel]
        color = image_ops.bilinear_sample(img, uv_all[sel])
        depth = jnp.linalg.norm(pts - t0_[None, :], axis=-1)
        return cm.update_rgb(c, ids_c, color, depth, 0.7, live,
                             rows=reg_rows)

    timeit("update_rgb (gather+scatter)", phase_update, cmap, ids_c,
           reg_rows, live, sel)

    timeit("render_recent TOTAL", cm.render_recent, cmap, img, q0, t0_,
           t0_, intr, 0.9, cols=W, rows=H, max_render_points=8192)
    timeit("render_recent R=4096", cm.render_recent, cmap, img, q0, t0_,
           t0_, intr, 0.9, cols=W, rows=H, max_render_points=4096)

    # ---- color_insert phases ----
    pts_new = jnp.asarray(rng.uniform(-8, 8, (2048, 3)).astype(np.float32))
    pv = jnp.ones((2048,), bool)

    @jax.jit
    def phase_dedup(c, pts):
        dd = vm.voxel_coords(pts, 0.01)
        return cm._claim_dedup(c.dedup_sig, dd, pv, 8)

    timeit("color dedup claim", phase_dedup, cmap, pts_new)

    def ins(c, pts):
        c2, _ = cm.color_insert(c, pts, pv, 1.5, voxel_size=0.1,
                                min_distance=0.01, max_probe=8, budget=2048)
        return c2

    out = ins(cmap, pts_new)
    jax.block_until_ready(out.reg)
    t0n = time.perf_counter()
    for i in range(20):
        pts_i = pts_new + 0.011 * i
        out = ins(out, pts_i)
    jax.block_until_ready(out.reg)
    print(f"{'color_insert new pts':<34} {(time.perf_counter()-t0n)/20*1e3:8.3f} ms")

    # vm.insert alone at color shapes
    vx = vm.make_map(1 << 19, 20)
    vx, _ = vm.insert(vx, pts_new, pv, 0.1, 0.0, 8,
                      point_ids=jnp.arange(2048, dtype=jnp.int32))
    jax.block_until_ready(vx.counts)

    @jax.jit
    def vmins(v, pts):
        v2, acc = vm.insert(v, pts, pv, 0.1, 0.0, 8,
                            point_ids=jnp.arange(2048, dtype=jnp.int32))
        return v2

    out2 = vmins(vx, pts_new)
    jax.block_until_ready(out2.counts)
    t0n = time.perf_counter()
    for i in range(20):
        out2 = vmins(out2, pts_new + 0.011 * i)
    jax.block_until_ready(out2.counts)
    print(f"{'vm.insert (color shapes)':<34} {(time.perf_counter()-t0n)/20*1e3:8.3f} ms")

    # geometry map insert at lio shapes (2^18, 8192 pts budget 2048)
    vg = vm.make_map(1 << 18, 20)
    pts_g = jnp.asarray(rng.uniform(-20, 20, (8192, 3)).astype(np.float32))
    pvg = jnp.ones((8192,), bool)
    vg, _ = vm.insert(vg, pts_g, pvg, 1.0, 0.1, 8, budget=2048)
    jax.block_until_ready(vg.counts)

    @jax.jit
    def vgins(v, pts):
        v2, acc = vm.insert(v, pts, pvg, 1.0, 0.1, 8, budget=2048)
        return v2

    out3 = vgins(vg, pts_g)
    jax.block_until_ready(out3.counts)
    t0n = time.perf_counter()
    for i in range(20):
        out3 = vgins(out3, pts_g + 0.13 * i)
    jax.block_until_ready(out3.counts)
    print(f"{'vm.insert (geom shapes)':<34} {(time.perf_counter()-t0n)/20*1e3:8.3f} ms")

    # knn at lio shapes
    @jax.jit
    def kq(v, q):
        return vm.knn(v, q, voxel_size=1.0, max_neighbors=20, max_probe=8,
                      nb_voxels=1, threshold_capacity=1)

    qpts = jnp.asarray(rng.uniform(-20, 20, (1024, 3)).astype(np.float32))
    timeit("knn 1024x27x20", kq, out3, qpts)


if __name__ == "__main__":
    main()

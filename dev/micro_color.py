"""Stage-by-stage microbench of color_insert internals on TPU."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, n=50, warmup=5):
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
    from sr_livo_tpu.ops import color_map as cm
    from sr_livo_tpu.ops import voxel_map as vm

    print("backend:", jax.default_backend())
    N = 8192
    P = 8
    BUDGET = 2048
    rng = np.random.RandomState(0)

    cmap = cm.make_color_map(1 << 20, 1 << 19, 20)
    # warm the map with several sweeps of a static-ish scene
    base = (rng.rand(N, 3).astype(np.float32) * 40 - 20)
    for i in range(6):
        pts = base + rng.randn(N, 3).astype(np.float32) * 0.05
        cmap, _ = cm.color_insert(cmap, jnp.asarray(pts),
                                  jnp.ones((N,), bool), float(i),
                                  voxel_size=0.1, min_distance=0.01,
                                  max_probe=P, budget=BUDGET)
    jax.block_until_ready(cmap.reg)
    print("map points:", int(vm.map_size(cmap.vox)),
          "registry count:", int(cmap.count))

    pts = jnp.asarray(base + rng.randn(N, 3).astype(np.float32) * 0.05)
    valid = jnp.ones((N,), bool)

    _cs = [jax.tree_util.tree_map(jnp.copy, cmap)]

    def run_ci():
        m, _ = cm.color_insert(_cs[0], pts, valid, 9.0,
                               voxel_size=0.1, min_distance=0.01,
                               max_probe=P, budget=BUDGET)
        _cs[0] = m
        return m.count
    t = timeit(run_ci)
    print(f"color_insert full          {t:8.2f} ms")

    dd_coords = vm.voxel_coords(pts, 0.01)

    claim = jax.jit(lambda s, c, v: cm._claim_dedup(s, c, v, P))
    t = timeit(lambda: claim(cmap.dedup_sig, dd_coords, valid))
    print(f"  _claim_dedup             {t:8.2f} ms")

    ins = jax.jit(lambda m, p, v, ids: vm.insert(
        m, p, v, 0.1, 0.01, P, point_ids=ids, budget=BUDGET))
    ids = jnp.arange(N, dtype=jnp.int32)
    sparse = jnp.zeros((N,), bool).at[::64].set(True)
    t = timeit(lambda: ins(cmap.vox, pts, sparse, ids))
    print(f"  vm.insert (sparse cand)  {t:8.2f} ms")

    coords = vm.voxel_coords(pts, 0.1)
    lk = jax.jit(lambda m, c: vm.lookup(m, c, P))
    t = timeit(lambda: lk(cmap.vox, coords))
    print(f"  vm.lookup (visit)        {t:8.2f} ms")

    def reg_scatter(reg, ids, p):
        rows = jnp.zeros((N, cm.REG_WIDTH), reg.dtype)
        rows = rows.at[:, cm.C_POS].set(p)
        rows = rows.at[:, cm.C_VALID].set(1.0)
        return reg.at[ids].set(rows, mode="drop")
    rs = jax.jit(reg_scatter)
    t = timeit(lambda: rs(cmap.reg, ids, pts))
    print(f"  registry row scatter     {t:8.2f} ms")


if __name__ == "__main__":
    main()

"""Bisect vm.insert phases on TPU."""
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
    from sr_livo_tpu.ops import voxel_map as vm

    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    capacity, K = 1 << 19, 20
    n, b = 8192, 2048
    max_probe = 16
    voxel_size = 0.1

    vmap_ = vm.make_map(capacity, K)
    # warm map: insert 3 batches first
    pts0 = jnp.asarray(rng.uniform(-8, 8, (20000, 3)).astype(np.float32))
    vmap_, _ = vm.insert(vmap_, pts0, jnp.ones(20000, bool), voxel_size,
                         0.0, max_probe, budget=None)
    pts = jax.device_put(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
    valid = jnp.ones(n, bool)

    full = jax.jit(lambda v, p: vm.insert(v, p, valid, voxel_size, 0.0,
                                          max_probe, budget=b))
    print(f"insert full             {timeit(lambda: full(vmap_, pts)):8.2f} ms")

    fullnb = jax.jit(lambda v, p: vm.insert(v, p, valid, voxel_size, 0.0,
                                            max_probe, budget=None))
    print(f"insert no budget        {timeit(lambda: fullnb(vmap_, pts)):8.2f} ms")

    mind = jax.jit(lambda v, p: vm.insert(v, p, valid, voxel_size, 0.05,
                                          max_probe, budget=b))
    print(f"insert min_dist>0       {timeit(lambda: mind(vmap_, pts)):8.2f} ms")

    @jax.jit
    def p1(v, p):
        coords = vm.voxel_coords(p, voxel_size)
        cand, mi, ei = vm._probe_chain(v.sig, coords, max_probe)
        return vm._resolve(v.keys, cand, mi, ei, coords, max_probe)
    print(f"  phase1 probe+resolve  {timeit(lambda: p1(vmap_, pts)):8.2f} ms")

    @jax.jit
    def p2(v, p):
        slot = p1(v, p)
        has = slot >= 0
        safe = jnp.where(has, slot, 0)
        return jnp.where(has, v.counts[safe], 0)
    print(f"  +counts gather        {timeit(lambda: p2(vmap_, pts)):8.2f} ms")

    @jax.jit
    def p3(v, p):
        blk = p2(v, p)
        cand_mask = valid & (blk < K)
        rank_n = jnp.cumsum(cand_mask.astype(jnp.int32)) - 1
        dst = jnp.where(cand_mask & (rank_n < b), rank_n, b)
        sel = jnp.full((b,), n - 1, jnp.int32).at[dst].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True)
        return sel
    print(f"  +compaction           {timeit(lambda: p3(vmap_, pts)):8.2f} ms")

    # claim round cost (one round, on b candidates)
    @jax.jit
    def p4(v, p):
        sel = p3(v, p)
        pc = p[sel]
        coords_c = vm.voxel_coords(pc, voxel_size)
        cand_c, mi_c, ei_c = vm._probe_chain(v.sig, coords_c, max_probe)
        res = vm._resolve(v.keys, cand_c, mi_c, ei_c, coords_c, max_probe)
        tgt = jnp.take_along_axis(
            cand_c, jnp.minimum(ei_c, max_probe - 1)[..., None], -1)[..., 0]
        idx_b = jnp.arange(b, dtype=jnp.int32)
        claim = jnp.full((capacity,), b, jnp.int32).at[
            jnp.where(res < 0, tgt, capacity)].min(idx_b, mode="drop")
        return claim[tgt]
    print(f"  +1 claim round        {timeit(lambda: p4(vmap_, pts)):8.2f} ms")

    # phase 5/6: rank sort + scatters
    @jax.jit
    def p56(v, p):
        sel = p3(v, p)
        pc = p[sel]
        slot_c = p1(v, pc)
        ok_c = slot_c >= 0
        safe_c = jnp.where(ok_c, slot_c, 0)
        ro = jnp.argsort(jnp.where(ok_c, slot_c, capacity), stable=True)
        ss = jnp.where(ok_c, slot_c, capacity)[ro]
        seg = jnp.concatenate([jnp.ones((1,), bool), ss[1:] != ss[:-1]])
        start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(seg, jnp.arange(b), 0))
        rank = jnp.zeros((b,), jnp.int32).at[ro].set(
            (jnp.arange(b) - start).astype(jnp.int32))
        cnt_c = jnp.where(ok_c, v.counts[safe_c], 0)
        pos = cnt_c + rank
        accept = ok_c & (pos < K)
        idx_b = jnp.arange(b, dtype=jnp.int32)
        flat_idx = jnp.where(accept, safe_c * K + pos, capacity * K + idx_b)
        pf = v.points.reshape(capacity * K, 3)
        pf = pf.at[flat_idx].set(pc, mode="drop", unique_indices=True)
        add = jnp.zeros((capacity,), jnp.int32).at[
            jnp.where(accept, safe_c, capacity)].add(1, mode="drop")
        return pf[0, 0] + add[0]
    print(f"  rank+scatter tail     {timeit(lambda: p56(vmap_, pts)):8.2f} ms")


if __name__ == "__main__":
    main()

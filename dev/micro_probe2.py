"""Bisect the insert 'probe' phase at real map state."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, n=50, warmup=5):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
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
    capacity, K = 1 << 18, 20
    n = 8192
    max_probe = 8
    voxel_size = 1.0

    vmap_ = vm.make_map(capacity, K)
    pts0 = jnp.asarray(rng.uniform(-40, 40, (60000, 3)).astype(np.float32))
    vmap_, _ = vm.insert(vmap_, pts0, jnp.ones(60000, bool), voxel_size,
                         0.1, max_probe, budget=None)
    pts = jax.device_put(rng.uniform(-40, 40, (n, 3)).astype(np.float32))
    jax.block_until_ready(vmap_.counts)

    f0 = jax.jit(lambda v, p: p.sum() + v.sig[0].astype(jnp.float32))
    print(f"baseline                {timeit(f0, vmap_, pts):8.3f} ms")

    f1 = jax.jit(lambda v, p: vm.voxel_coords(p, voxel_size))
    print(f"voxel_coords            {timeit(f1, vmap_, pts):8.3f} ms")

    @jax.jit
    def f2(v, p):
        coords = vm.voxel_coords(p, voxel_size)
        return vm.voxel_hash(coords, capacity)
    print(f"+hash                   {timeit(f2, vmap_, pts):8.3f} ms")

    @jax.jit
    def f3(v, p):
        coords = vm.voxel_coords(p, voxel_size)
        base = vm.voxel_hash(coords, capacity)
        offs = jnp.arange(max_probe, dtype=jnp.int32)
        cand = (base[..., None] + offs) & (capacity - 1)
        return v.sig[cand]
    print(f"+sig gather             {timeit(f3, vmap_, pts):8.3f} ms")

    @jax.jit
    def f4(v, p):
        coords = vm.voxel_coords(p, voxel_size)
        return vm._probe_chain(v.sig, coords, max_probe)
    print(f"+probe_chain full       {timeit(f4, vmap_, pts):8.3f} ms")

    @jax.jit
    def f5(v, p):
        coords = vm.voxel_coords(p, voxel_size)
        cand, mi, ei = vm._probe_chain(v.sig, coords, max_probe)
        return vm._resolve(v.keys, cand, mi, ei, coords, max_probe)
    print(f"+resolve                {timeit(f5, vmap_, pts):8.3f} ms")

    # resolve minus the keys-verify gather
    @jax.jit
    def f6(v, p):
        coords = vm.voxel_coords(p, voxel_size)
        cand, match_idx, empty_idx = vm._probe_chain(v.sig, coords, max_probe)
        found = (match_idx < max_probe) & (match_idx < empty_idx)
        take = jnp.minimum(match_idx, max_probe - 1)
        slot = jnp.take_along_axis(cand, take[..., None], axis=-1)[..., 0]
        return jnp.where(found, slot, -1)
    print(f"+resolve no verify      {timeit(f6, vmap_, pts):8.3f} ms")


if __name__ == "__main__":
    main()

"""Stability check: same ops measured interleaved, 3 rounds each."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, n=100, warmup=10):
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
    n = 8192
    pts = jnp.asarray(rng.uniform(-40, 40, (n, 3)).astype(np.float32))
    c_i32 = jnp.asarray(rng.randint(-500, 500, (n, 3)).astype(np.int32))
    P = (73856093, 19349669, 83492791)
    C = 1 << 18

    @jax.jit
    def hash_only(c):
        u = c.astype(jnp.uint32)
        return (u[:, 0] * np.uint32(P[0]) + u[:, 1] * np.uint32(P[1])
                + u[:, 2] * np.uint32(P[2]))

    @jax.jit
    def coords_only(p):
        return vm.voxel_coords(p, 1.0)

    @jax.jit
    def coords_hash(p):
        return vm.voxel_hash(vm.voxel_coords(p, 1.0), C)

    @jax.jit
    def coords_hash_sig(p):
        c = vm.voxel_coords(p, 1.0)
        return vm.voxel_hash(c, C), vm.voxel_sig(c)

    fns = [("hash_only(i32 in)", hash_only, (c_i32,)),
           ("coords_only", coords_only, (pts,)),
           ("coords+hash", coords_hash, (pts,)),
           ("coords+hash+sig", coords_hash_sig, (pts,))]
    for rnd in range(3):
        print(f"--- round {rnd}")
        for name, f, a in fns:
            print(f"  {name:22s} {timeit(f, *a):8.3f} ms")


if __name__ == "__main__":
    main()

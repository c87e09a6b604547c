"""Second-round CLAHE micro-bench: isolate gather formulations."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, n=30, warmup=3):
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
    from sr_livo_tpu.ops import image_ops

    print("backend:", jax.default_backend())
    h, w = 512, 640
    n_tiles = 32
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))

    clahe_jit = jax.jit(image_ops.clahe, static_argnums=(1, 2))
    ms = timeit(lambda: clahe_jit(img, 3.0, n_tiles))
    print(f"clahe (one wrapper)    {ms:8.2f} ms")

    # remap cost (the undistort path) at this size
    k = np.array([[520.0, 0, w / 2], [0, 520.0, h / 2], [0, 0, 1]])
    dist = np.array([0.1, -0.05, 0.001, 0.001, 0.0])
    ud = jnp.asarray(image_ops.make_undistort_map(k, dist, (h, w)))
    img3 = jnp.asarray(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
    remap_jit = jax.jit(image_ops.remap)
    print(f"remap 3ch              {timeit(lambda: remap_jit(img3, ud)):8.2f} ms")
    remap1_jit = jax.jit(image_ops.remap)
    print(f"remap 1ch              {timeit(lambda: remap1_jit(img, ud)):8.2f} ms")

    # gather scaling: flat gather of N random indices from a small table
    for n_idx in (81920, 327680):
        idx = jnp.asarray(rng.randint(0, 256 * 1024, n_idx).astype(np.int32))
        table = jnp.asarray(rng.uniform(0, 1, 256 * 1024).astype(np.float32))
        g = jax.jit(lambda t, i: t[i])
        print(f"flat gather {n_idx:7d}    {timeit(lambda: g(table, idx)):8.2f} ms")

    # 2d-shaped index gather (like remap/lut): same count, (H, W) shaped
    idx2 = jnp.asarray(rng.randint(0, 256 * 1024, (512, 640)).astype(np.int32))
    table = jnp.asarray(rng.uniform(0, 1, 256 * 1024).astype(np.float32))
    g2 = jax.jit(lambda t, i: t[i])
    print(f"2d-shaped gather        {timeit(lambda: g2(table, idx2)):8.2f} ms")

    # take_along_axis formulation for per-row small LUTs
    lut_rows = jnp.asarray(rng.uniform(0, 1, (512, 1024)).astype(np.float32))
    idx_rows = jnp.asarray(rng.randint(0, 1024, (512, 640)).astype(np.int32))
    g3 = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=1))
    print(f"take_along_axis row     {timeit(lambda: g3(lut_rows, idx_rows)):8.2f} ms")


if __name__ == "__main__":
    main()

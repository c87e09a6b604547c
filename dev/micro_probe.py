"""Probe-gather and scatter strategy shootout on TPU."""
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

    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    C = 1 << 18
    P = 8
    n = 8192

    sig = jnp.asarray(rng.randint(0, 2**31, C, dtype=np.int64).astype(np.uint32))
    base = jnp.asarray(rng.randint(0, C, n).astype(np.int32))

    # A: fancy-index gather (current)
    @jax.jit
    def gather_fancy(sig, base):
        offs = jnp.arange(P, dtype=jnp.int32)
        cand = (base[:, None] + offs) & (C - 1)
        return sig[cand]
    print(f"fancy (n,P) gather      {timeit(gather_fancy, sig, base):8.3f} ms")

    # B: vmapped dynamic_slice on padded column
    @jax.jit
    def gather_slice(sig, base):
        sig_ext = jnp.concatenate([sig, sig[:P]])
        return jax.vmap(
            lambda i: jax.lax.dynamic_slice(sig_ext, (i,), (P,)))(base)
    print(f"vmap dynamic_slice      {timeit(gather_slice, sig, base):8.3f} ms")

    # C: same for (n, 27) voxel-neighborhood probes (kNN shape)
    q = 1024
    base27 = jnp.asarray(rng.randint(0, C, (q, 27)).astype(np.int32))

    @jax.jit
    def knn_fancy(sig, b):
        offs = jnp.arange(P, dtype=jnp.int32)
        cand = (b[..., None] + offs) & (C - 1)
        return sig[cand]
    print(f"knn fancy               {timeit(knn_fancy, sig, base27):8.3f} ms")

    @jax.jit
    def knn_slice(sig, b):
        sig_ext = jnp.concatenate([sig, sig[:P]])
        return jax.vmap(jax.vmap(
            lambda i: jax.lax.dynamic_slice(sig_ext, (i,), (P,))))(b)
    print(f"knn vmap slice          {timeit(knn_slice, sig, base27):8.3f} ms")

    # D: row scatter into big buffer — donated vs not
    K = 20
    pts_tab = jnp.zeros((C * K, 3), jnp.float32)
    idx = jnp.asarray(rng.choice(C * K, 2048, replace=False).astype(np.int32))
    rows = jnp.asarray(rng.randn(2048, 3).astype(np.float32))

    @jax.jit
    def scat(tab, idx, rows):
        return tab.at[idx].set(rows, mode="drop", unique_indices=True)
    print(f"row scatter (no donate) {timeit(scat, pts_tab, idx, rows):8.3f} ms")

    scat_d = jax.jit(
        lambda tab, idx, rows: tab.at[idx].set(rows, mode="drop",
                                               unique_indices=True),
        donate_argnums=(0,))
    t0 = pts_tab
    ms_list = []
    for _ in range(30):
        t0b = scat_d(t0, idx, rows)
        jax.block_until_ready(t0b)
        t0 = t0b
    t_start = time.perf_counter()
    for _ in range(50):
        t0 = scat_d(t0, idx, rows)
    jax.block_until_ready(t0)
    print(f"row scatter (donated)   {(time.perf_counter()-t_start)/50*1e3:8.3f} ms")

    # E: scalar-ized scatter (3 columns separately into flat buffers)
    cols = jnp.zeros((3, C * K), jnp.float32)

    scat_cols = jax.jit(
        lambda cols, idx, rows: cols.at[:, idx].set(rows.T, mode="drop",
                                                    unique_indices=True),
        donate_argnums=(0,))
    c0 = cols
    for _ in range(10):
        c0 = scat_cols(c0, idx, rows)
    jax.block_until_ready(c0)
    t_start = time.perf_counter()
    for _ in range(50):
        c0 = scat_cols(c0, idx, rows)
    jax.block_until_ready(c0)
    print(f"col scatter (donated)   {(time.perf_counter()-t_start)/50*1e3:8.3f} ms")


if __name__ == "__main__":
    main()

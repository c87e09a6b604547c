"""Verify the gather performance model: scalar vs slice gathers vs table size."""
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
    n_idx = 131072

    # scalar gather vs table size
    for tab_elems in (1 << 12, 1 << 15, 1 << 17, 1 << 19, 1 << 22):
        tab = jax.device_put(rng.uniform(0, 1, tab_elems).astype(np.float32))
        idx = jax.device_put(rng.randint(0, tab_elems, n_idx).astype(np.int32))
        f = jax.jit(lambda t, i: t[i])
        ms = timeit(lambda: f(tab, idx))
        print(f"scalar gather tab={tab_elems>>10:6d}K elems  {ms:8.2f} ms")

    # same but table shaped (T, 2) with slice (1, 2)
    for tab_elems in (1 << 17, 1 << 19, 1 << 22):
        tab = jax.device_put(
            rng.uniform(0, 1, (tab_elems, 2)).astype(np.float32))
        idx = jax.device_put(rng.randint(0, tab_elems, n_idx).astype(np.int32))
        f = jax.jit(lambda t, i: t[i])
        ms = timeit(lambda: f(tab, idx))
        print(f"(1,2)-slice gather tab={tab_elems>>10:6d}K rows {ms:8.2f} ms")

    # contiguous probe chain: pad + slice gather (16,) vs scalar mod-gather
    cap = 1 << 18
    P = 16
    sig = jax.device_put(rng.randint(0, 2**31, cap).astype(np.uint32))
    base = jax.device_put(rng.randint(0, cap, 8192).astype(np.int32))

    def probe_scalar(s, b):
        offs = jnp.arange(P, dtype=jnp.int32)
        cand = (b[:, None] + offs) & (cap - 1)
        return s[cand]
    f = jax.jit(probe_scalar)
    print(f"probe scalar-gather      {timeit(lambda: f(sig, base)):8.2f} ms")

    def probe_slice(s, b):
        sp = jnp.concatenate([s, s[:P]])
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(),
            start_index_map=(0,))
        return jax.lax.gather(sp, b[:, None], dn, slice_sizes=(P,),
                              mode=jax.lax.GatherScatterMode.CLIP)
    f2 = jax.jit(probe_slice)
    print(f"probe slice-gather       {timeit(lambda: f2(sig, base)):8.2f} ms")
    # correctness
    a = np.asarray(f(sig, base))
    b_ = np.asarray(f2(sig, base))
    wrap = (np.asarray(base)[:, None] + np.arange(P)) >= cap
    print("probe parity (non-wrap rows equal):",
          np.array_equal(a[~wrap.any(1)], b_[~wrap.any(1)]),
          "| wrapped rows:", int(wrap.any(1).sum()))

    # block gather: (C, K, 3) rows
    C, K = 1 << 18, 20
    blocks = jax.device_put(rng.uniform(0, 1, (C, K, 3)).astype(np.float32))
    slots = jax.device_put(rng.randint(0, C, 27648).astype(np.int32))
    f3 = jax.jit(lambda t, i: t[i])
    print(f"block gather (1,K,3)     {timeit(lambda: f3(blocks, slots)):8.2f} ms")

    # scalar gather from (C,) counts — the slow pattern in knn
    counts = jax.device_put(rng.randint(0, 20, C).astype(np.int32))
    f4 = jax.jit(lambda t, i: t[i])
    print(f"counts scalar gather     {timeit(lambda: f4(counts, slots)):8.2f} ms")

    # counts as (C, 2) padded rows
    counts2 = jax.device_put(
        np.stack([np.asarray(counts)] * 2, -1).astype(np.int32))
    print(f"counts (1,2) gather      {timeit(lambda: f4(counts2, slots)):8.2f} ms")

    # scatter-add into large table
    big_idx = jax.device_put(rng.randint(0, C, 131072).astype(np.int32))
    f5 = jax.jit(lambda i: jnp.zeros((C,), jnp.float32).at[i].add(1.0))
    print(f"scatter-add 131K->256K   {timeit(lambda: f5(big_idx)):8.2f} ms")

    # scatter-set rows into large (C*K, 3)
    vals = jax.device_put(rng.uniform(0, 1, (8192, 3)).astype(np.float32))
    flat = jax.device_put(rng.uniform(0, 1, (C * K, 3)).astype(np.float32))
    fi = jax.device_put(rng.randint(0, C * K, 8192).astype(np.int32))
    f6 = jax.jit(lambda d, i, v: d.at[i].set(v, mode="drop",
                                             unique_indices=True))
    print(f"scatter-set rows 5M tab  {timeit(lambda: f6(flat, fi, vals)):8.2f} ms")

    # argsort re-verify with big table
    keys = jax.device_put(rng.uniform(0, 1, 16384).astype(np.float32))
    f7 = jax.jit(lambda k: jnp.argsort(k))
    r = timeit(lambda: f7(keys))
    print(f"argsort 16384 (again)    {r:8.2f} ms")

    # while_loop of tiny ops (LK-style): 40 sequential small gathers
    imgt = jax.device_put(rng.uniform(0, 255, (512, 640)).astype(np.float32))
    pts = jax.device_put(rng.uniform(16, 400, (304, 2)).astype(np.float32))
    from sr_livo_tpu.ops import image_ops

    def lk_like(im, p):
        def body(i, g):
            w = image_ops.sample_windows_bilinear(im, g, 21)
            return g + jnp.mean(w, axis=(1, 2), keepdims=False)[:, None] * 1e-6
        return jax.lax.fori_loop(0, 40, body, p)
    f8 = jax.jit(lk_like)
    print(f"40x window-gather loop   {timeit(lambda: f8(imgt, pts)):8.2f} ms")


if __name__ == "__main__":
    main()

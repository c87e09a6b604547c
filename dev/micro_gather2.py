"""Definitive gather/scatter formulation bench — ALL inputs traced args."""
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
    h, w = 512, 640

    img = jax.device_put(rng.uniform(0, 255, (h, w)).astype(np.float32))
    img3 = jax.device_put(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))

    # take_along_axis along rows (axis=1): per-row index
    u = jax.device_put(rng.randint(0, w, (h, w)).astype(np.int32))
    v = jax.device_put(rng.randint(0, h, (h, w)).astype(np.int32))
    f1 = jax.jit(lambda im, uu: jnp.take_along_axis(im, uu, axis=1))
    print(f"take_along axis=1       {timeit(lambda: f1(img, u)):8.2f} ms")
    f2 = jax.jit(lambda im, vv: jnp.take_along_axis(im, vv, axis=0))
    print(f"take_along axis=0       {timeit(lambda: f2(img, v)):8.2f} ms")

    # small-table gather: 256-entry LUT, 327K lookups
    lut = jax.device_put(rng.uniform(0, 1, 256).astype(np.float32))
    q = jax.device_put(rng.randint(0, 256, (h, w)).astype(np.int32))
    f3 = jax.jit(lambda t, qq: t[qq])
    print(f"256-LUT gather          {timeit(lambda: f3(lut, q)):8.2f} ms")

    # one-hot matmul LUT apply: (HW, 256) @ (256,) via einsum, f32 vs bf16
    def f4(t, qq):
        oh = (qq[..., None] == jnp.arange(256, dtype=jnp.int32))
        return jnp.einsum("hwb,b->hw", oh.astype(jnp.bfloat16),
                          t.astype(jnp.bfloat16)).astype(jnp.float32)
    f4 = jax.jit(f4)
    print(f"256-LUT onehot-matmul   {timeit(lambda: f4(lut, q)):8.2f} ms")

    # blocked one-hot with per-block luts: (B, P, 256) @ (B, 256, 4)
    nb = 1024
    pp = (h * w) // nb
    lut4 = jax.device_put(rng.uniform(0, 1, (nb, 256, 4)).astype(np.float32))
    qb = jax.device_put(rng.randint(0, 256, (nb, pp)).astype(np.int32))
    def f5(t4, qq):
        oh = (qq[..., None] == jnp.arange(256, dtype=jnp.int32))
        return jnp.einsum("bpq,bqk->bpk", oh.astype(jnp.bfloat16),
                          t4.astype(jnp.bfloat16))
    f5 = jax.jit(f5)
    print(f"blocked onehot batched  {timeit(lambda: f5(lut4, qb)):8.2f} ms")

    # 12-element slice gather for bilinear remap (2,2,3 slices)
    tl = jax.device_put(
        np.stack([rng.randint(0, h - 2, h * w), rng.randint(0, w - 2, h * w)],
                 -1).astype(np.int32))
    def f6(im, t):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        return jax.lax.gather(im, t, dn, slice_sizes=(2, 2, 3),
                              mode=jax.lax.GatherScatterMode.CLIP)
    f6 = jax.jit(f6)
    print(f"2x2x3 slice gather      {timeit(lambda: f6(img3, tl)):8.2f} ms")

    def f6b(im, t):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        return jax.lax.gather(im, t, dn, slice_sizes=(2, 2),
                              mode=jax.lax.GatherScatterMode.CLIP)
    f6b = jax.jit(f6b)
    print(f"2x2 slice gather gray   {timeit(lambda: f6b(img, tl)):8.2f} ms")

    # scatter-add of 205K into 64K bins
    sidx = jax.device_put(rng.randint(0, 65536, 256 * 800).astype(np.int32))
    f7 = jax.jit(lambda i: jnp.zeros((65536,), jnp.float32).at[i].add(1.0))
    print(f"scatter-add 205K        {timeit(lambda: f7(sidx)):8.2f} ms")

    # scatter-set of 8192 rows into (64K, 3)
    dst = jax.device_put(rng.uniform(0, 1, (65536, 3)).astype(np.float32))
    rows = jax.device_put(rng.uniform(0, 1, (8192, 3)).astype(np.float32))
    ridx = jax.device_put(rng.randint(0, 65536, 8192).astype(np.int32))
    f8 = jax.jit(lambda d, r, i: d.at[i].set(r))
    print(f"scatter-set 8K rows     {timeit(lambda: f8(dst, rows, ridx)):8.2f} ms")

    # gather 8K rows from (64K, 3)
    f9 = jax.jit(lambda d, i: d[i])
    print(f"gather 8K rows          {timeit(lambda: f9(dst, ridx)):8.2f} ms")

    # gather 82K rows (render path scale)
    ridx2 = jax.device_put(rng.randint(0, 65536, 81920).astype(np.int32))
    print(f"gather 82K rows         {timeit(lambda: f9(dst, ridx2)):8.2f} ms")

    # argsort costs
    keys = jax.device_put(rng.uniform(0, 1, 8192).astype(np.float32))
    f10 = jax.jit(lambda k: jnp.argsort(k))
    print(f"argsort 8192            {timeit(lambda: f10(keys)):8.2f} ms")
    keys2 = jax.device_put(rng.uniform(0, 1, 2048).astype(np.float32))
    print(f"argsort 2048            {timeit(lambda: f10(keys2)):8.2f} ms")
    keys3 = jax.device_put(rng.uniform(0, 1, 16384).astype(np.float32))
    print(f"argsort 16384           {timeit(lambda: f10(keys3)):8.2f} ms")

    # top_k over 262144 (render recent voxel selection)
    big = jax.device_put(rng.uniform(0, 1, 262144).astype(np.float32))
    f11 = jax.jit(lambda b: jax.lax.top_k(b, 4096))
    print(f"top_k 4096 of 262K      {timeit(lambda: f11(big)):8.2f} ms")


if __name__ == "__main__":
    main()

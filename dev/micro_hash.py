"""Integer-multiply/hash strategy shootout on TPU."""
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

    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    n = 8192
    c_i32 = jnp.asarray(rng.randint(-500, 500, (n, 3)).astype(np.int32))

    P = (73856093, 19349669, 83492791)

    @jax.jit
    def h_u32(c):
        u = c.astype(jnp.uint32)
        return (u[:, 0] * np.uint32(P[0]) + u[:, 1] * np.uint32(P[1])
                + u[:, 2] * np.uint32(P[2]))
    print(f"u32 mul hash            {timeit(h_u32, c_i32):8.3f} ms")

    @jax.jit
    def h_i32(c):
        return (c[:, 0] * np.int32(P[0] & 0x7FFFFFFF)
                + c[:, 1] * np.int32(P[1]) + c[:, 2] * np.int32(P[2]))
    print(f"i32 mul hash            {timeit(h_i32, c_i32):8.3f} ms")

    # 16-bit decomposition: coords are short-range (reference casts to short).
    # c in [-2^15, 2^15): hash via two u16-range multiplies that stay exact
    # in f32? No — use precomputed low/high parts with i32 adds and shifts,
    # all multiplies between values < 2^16 so they fit an f32 mantissa? f32
    # mantissa is 24 bits; 16x16=32 bits doesn't fit. Try: split prime into
    # 12-bit chunks, coords are 16-bit => products <= 28 bits, still too big.
    # Instead: lookup-free shift-add hash (primes replaced by odd constants
    # built from shifts): h = (x<<13)-x ... but semantics change.
    # Option: keep u32 mul but on 8-bit coord chunks via table-free shifts.

    # Per-axis lookup table: coords are bounded (|c| < 4096 for 400 m /
    # 0.1 m). Precompute hx[c] once per... table changes per? No — static!
    T = 1 << 13  # 8192 entries per axis, coords offset by T//2
    tab = []
    for p in P:
        idx = (np.arange(T, dtype=np.int64) - T // 2) & 0xFFFFFFFF
        tab.append(((idx * p) & 0xFFFFFFFF).astype(np.uint32))
    tabs = jnp.asarray(np.stack(tab))  # (3, T)

    @jax.jit
    def h_lut(c):
        i = jnp.clip(c + T // 2, 0, T - 1)
        return tabs[0, i[:, 0]] + tabs[1, i[:, 1]] + tabs[2, i[:, 2]]
    r_lut = h_lut(c_i32)
    r_ref = h_u32(c_i32)
    print("lut == u32:", bool(jnp.all(r_lut == r_ref)))
    print(f"lut hash                {timeit(h_lut, c_i32):8.3f} ms")

    # f64 trick? not on TPU. Try jnp.int64 disabled anyway.

    # 27-neighborhood shape (kNN): (1024, 27, 3)
    c27 = jnp.asarray(rng.randint(-500, 500, (1024, 27, 3)).astype(np.int32))

    @jax.jit
    def h27_u32(c):
        u = c.astype(jnp.uint32)
        return (u[..., 0] * np.uint32(P[0]) + u[..., 1] * np.uint32(P[1])
                + u[..., 2] * np.uint32(P[2]))
    print(f"27nb u32 hash           {timeit(h27_u32, c27):8.3f} ms")

    @jax.jit
    def h27_lut(c):
        i = jnp.clip(c + T // 2, 0, T - 1)
        return (tabs[0][i[..., 0]] + tabs[1][i[..., 1]] + tabs[2][i[..., 2]])
    print(f"27nb lut hash           {timeit(h27_lut, c27):8.3f} ms")

    # Additivity trick: hash(q + off) = hash(q) + hash(off) (linear in u32
    # arithmetic!) => 27-neighborhood hashes = base hash + 27 constants.
    @jax.jit
    def h27_add(cq):
        u = cq.astype(jnp.uint32)
        hq = (u[..., 0] * np.uint32(P[0]) + u[..., 1] * np.uint32(P[1])
              + u[..., 2] * np.uint32(P[2]))  # (1024,)
        offs = np.stack(np.meshgrid(*[np.arange(-1, 2)] * 3,
                                    indexing="ij"), -1).reshape(-1, 3)
        hoff = jnp.asarray(((offs.astype(np.int64) * np.array(P)).sum(-1)
                            & 0xFFFFFFFF).astype(np.uint32))
        return hq[:, None] + hoff[None, :]
    cq = jnp.asarray(rng.randint(-500, 500, (1024, 3)).astype(np.int32))
    print(f"27nb additive hash      {timeit(h27_add, cq):8.3f} ms")


if __name__ == "__main__":
    main()

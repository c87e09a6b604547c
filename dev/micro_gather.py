"""Find the fast gather formulation on this TPU."""
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
    table = jax.device_put(rng.uniform(0, 1, 256 * 1024).astype(np.float32))
    q = jax.device_put(rng.randint(0, 256, (h, w)).astype(np.int32))
    ty = jax.device_put(rng.randint(0, 32, (h,)).astype(np.int32))
    tx = jax.device_put(rng.randint(0, 32, (w,)).astype(np.int32))

    fA = jax.jit(lambda t, i: t[i])
    idx_pre = jax.device_put(((np.asarray(ty)[:, None] * 32
                               + np.asarray(tx)[None, :]) * 256
                              + np.asarray(q)).astype(np.int32))
    print(f"A idx traced direct     {timeit(lambda: fA(table, idx_pre)):8.2f} ms")

    def fB(t, q_, ty_, tx_):
        idx = (ty_[:, None] * 32 + tx_[None, :]) * 256 + q_
        return t[idx]
    fB = jax.jit(fB)
    print(f"B idx computed inside   {timeit(lambda: fB(table, q, ty, tx)):8.2f} ms")

    def fC(t, q_, ty_, tx_):
        idx = (ty_[:, None] * 32 + tx_[None, :]) * 256 + q_
        idx = jax.lax.optimization_barrier(idx)
        return t[idx]
    fC = jax.jit(fC)
    print(f"C barrier before gather {timeit(lambda: fC(table, q, ty, tx)):8.2f} ms")

    def fD(t, q_, ty_, tx_):
        idx = (ty_[:, None] * 32 + tx_[None, :]) * 256 + q_
        return t[idx] + t[idx + 1] + t[idx + 2] + t[idx + 3]
    fD = jax.jit(fD)
    print(f"D 4 gathers computed    {timeit(lambda: fD(table, q, ty, tx)):8.2f} ms")

    def fE(t, q_, ty_, tx_):
        idx = (ty_[:, None] * 32 + tx_[None, :]) * 256 + q_
        i0 = jax.lax.optimization_barrier(idx)
        i1 = jax.lax.optimization_barrier(idx + 1)
        i2 = jax.lax.optimization_barrier(idx + 2)
        i3 = jax.lax.optimization_barrier(idx + 3)
        return t[i0] + t[i1] + t[i2] + t[i3]
    fE = jax.jit(fE)
    print(f"E 4 gathers barriered   {timeit(lambda: fE(table, q, ty, tx)):8.2f} ms")

    # flat vs reshaped index
    def fF(t, q_, ty_, tx_):
        idx = ((ty_[:, None] * 32 + tx_[None, :]) * 256 + q_).reshape(-1)
        return t[idx].reshape(h, w)
    fF = jax.jit(fF)
    print(f"F flat idx (reshape)    {timeit(lambda: fF(table, q, ty, tx)):8.2f} ms")

    # 2-index-array gather (the remap pattern)
    img3 = jax.device_put(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
    v0 = jax.device_put(rng.randint(0, h, (h, w)).astype(np.int32))
    u0 = jax.device_put(rng.randint(0, w, (h, w)).astype(np.int32))

    fG = jax.jit(lambda im, v, u: im[v, u])
    print(f"G img3[v,u] 2d-index    {timeit(lambda: fG(img3, v0, u0)):8.2f} ms")

    def fH(im, v, u):
        flat = im.reshape(h * w, 3)
        return flat[v * w + u]
    fH = jax.jit(fH)
    print(f"H flat row gather 3ch   {timeit(lambda: fH(img3, v0, u0)):8.2f} ms")

    def fI(im, v, u):
        flat = im.reshape(h * w, 3)
        idx = jax.lax.optimization_barrier(v * w + u)
        return flat[idx]
    fI = jax.jit(fI)
    print(f"I flat row + barrier    {timeit(lambda: fI(img3, v0, u0)):8.2f} ms")

    gray = jax.device_put(rng.uniform(0, 255, (h, w)).astype(np.float32))
    fJ = jax.jit(lambda im, v, u: im.reshape(-1)[v * w + u])
    print(f"J gray flat gather      {timeit(lambda: fJ(gray, v0, u0)):8.2f} ms")

    fK = jax.jit(lambda im, v, u: im[v, u])
    print(f"K gray[v,u] 2d-index    {timeit(lambda: fK(gray, v0, u0)):8.2f} ms")


if __name__ == "__main__":
    main()

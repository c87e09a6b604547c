"""Measure per-call and per-buffer dispatch overhead on the axon TPU tunnel."""
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

    x = jnp.ones((128,), jnp.float32)

    f1 = jax.jit(lambda x: x + 1.0)
    print(f"1 in / 1 out            {timeit(f1, x):8.3f} ms")

    ins8 = [jnp.ones((128,), jnp.float32) * i for i in range(8)]
    f8 = jax.jit(lambda *a: sum(a))
    print(f"8 in / 1 out            {timeit(f8, *ins8):8.3f} ms")

    f1_8 = jax.jit(lambda x: tuple(x + i for i in range(8)))
    print(f"1 in / 8 out            {timeit(f1_8, x):8.3f} ms")

    f1_24 = jax.jit(lambda x: tuple(x + i for i in range(24)))
    print(f"1 in / 24 out           {timeit(f1_24, x):8.3f} ms")

    ins24 = [jnp.ones((128,), jnp.float32) * i for i in range(24)]
    f24_24 = jax.jit(lambda *a: tuple(v + 1 for v in a))
    print(f"24 in / 24 out          {timeit(f24_24, *ins24):8.3f} ms")

    big = jnp.ones((1 << 18, 20, 3), jnp.float32)
    fbig = jax.jit(lambda x, b: (x + b[0, 0, 0],))
    print(f"big in (63MB) / 1 out   {timeit(fbig, x, big):8.3f} ms")

    fbig_out = jax.jit(lambda b: b * 1.000001, donate_argnums=(0,))
    b0 = big
    for _ in range(10):
        b0 = fbig_out(b0)
    jax.block_until_ready(b0)
    t0 = time.perf_counter()
    for _ in range(100):
        b0 = fbig_out(b0)
    jax.block_until_ready(b0)
    print(f"big in+out donated      {(time.perf_counter()-t0)/100*1e3:8.3f} ms")

    # chained dependent calls (pipeline depth)
    def chain(k):
        f = jax.jit(lambda x: x * 1.0001 + 1.0)
        def run(x):
            for _ in range(k):
                x = f(x)
            return x
        # warm
        y = run(x)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(20):
            y = run(y)
        jax.block_until_ready(y)
        return (time.perf_counter() - t0) / (20 * k) * 1e3
    print(f"chained tiny call       {chain(50):8.3f} ms/call")


if __name__ == "__main__":
    main()

"""Bisect the preprocess pipeline cost on TPU."""
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
    from sr_livo_tpu.ops import image_ops

    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    h, w = 512, 640
    img = jax.device_put(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))
    k = np.array([[431.0, 0, w / 2], [0, 431.0, h / 2], [0, 0, 1]])
    dist = np.array([-0.1, 0.1, 0.0, 0.0, 0.0])
    ud = jnp.asarray(image_ops.make_undistort_map(k, dist, (h, w)))
    n_tiles = 32

    f1 = jax.jit(lambda im: image_ops.remap(im, ud))
    print(f"1 remap only            {timeit(lambda: f1(img)):8.2f} ms")

    f2 = jax.jit(lambda im: image_ops.rgb_to_gray(image_ops.remap(im, ud)))
    print(f"2 remap+gray            {timeit(lambda: f2(img)):8.2f} ms")

    f3 = jax.jit(lambda im: image_ops.clahe(
        image_ops.rgb_to_gray(image_ops.remap(im, ud)), 3.0, n_tiles))
    print(f"3 remap+gray+clahe      {timeit(lambda: f3(img)):8.2f} ms")

    f4 = jax.jit(lambda im: image_ops.equalize_color_ycrcb(
        image_ops.remap(im, ud), n_tiles))
    print(f"4 remap+ycrcb-eq        {timeit(lambda: f4(img)):8.2f} ms")

    f5 = jax.jit(lambda im: image_ops.equalize_color_ycrcb(im, n_tiles))
    print(f"5 ycrcb-eq only         {timeit(lambda: f5(img)):8.2f} ms")

    gray = jax.device_put(rng.uniform(0, 255, (h, w)).astype(np.float32))
    f6 = jax.jit(lambda g: image_ops.clahe(g, 3.0, n_tiles))
    print(f"6 clahe only            {timeit(lambda: f6(gray)):8.2f} ms")

    def both(im):
        u = image_ops.remap(im, ud)
        g = image_ops.clahe(image_ops.rgb_to_gray(u), 3.0, n_tiles)
        c = image_ops.equalize_color_ycrcb(u, n_tiles)
        return c, g
    f7 = jax.jit(both)
    print(f"7 full preprocess       {timeit(lambda: f7(img)):8.2f} ms")


if __name__ == "__main__":
    main()

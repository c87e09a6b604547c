"""Micro-bench CLAHE internals on TPU: histogram + LUT-apply formulations."""
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
    n_tiles = image_ops.clahe_tiles_for_width(w)
    n_tiles = min(n_tiles, 32)
    print("tiles:", n_tiles)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))

    ms = timeit(lambda: jax.jit(image_ops.clahe, static_argnums=(1, 2))(
        img, 3.0, n_tiles))
    print(f"clahe current          {ms:8.2f} ms")

    # histogram variants
    th = -(-h // n_tiles)
    tw = -(-w // n_tiles)
    ph, pw = th * n_tiles, tw * n_tiles
    pimg = jnp.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    tiles = pimg.reshape(n_tiles, th, n_tiles, tw).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(n_tiles * n_tiles, th * tw)
    q = jnp.clip(tiles.astype(jnp.int32), 0, 255)
    n_t = n_tiles * n_tiles

    @jax.jit
    def hist_scatter(q):
        flat = (jnp.arange(n_t, dtype=jnp.int32)[:, None] * 256 + q).reshape(-1)
        return jnp.zeros((n_t * 256,), jnp.float32).at[flat].add(1.0).reshape(n_t, 256)

    @jax.jit
    def hist_onehot(q):
        # (T, px) vs 256 bins -> sum over px, computed in chunks of bins
        oh = (q[:, :, None] == jnp.arange(256, dtype=jnp.int32)[None, None, :])
        return jnp.sum(oh.astype(jnp.float32), axis=1)

    @jax.jit
    def hist_matmul(q):
        # one-hot via MXU: A (T*px bf16 rounded?) — use segment trick:
        # compare in f32 then dot with identity is pointless; skip
        oh = (q[:, :, None] == jnp.arange(256, dtype=jnp.int32)[None, None, :])
        return jnp.einsum("tpb->tb", oh.astype(jnp.bfloat16)).astype(jnp.float32)

    print(f"hist scatter           {timeit(lambda: hist_scatter(q)):8.2f} ms")
    print(f"hist onehot-reduce     {timeit(lambda: hist_onehot(q)):8.2f} ms")
    print(f"hist onehot bf16       {timeit(lambda: hist_matmul(q)):8.2f} ms")

    # LUT apply variants
    lut = jnp.asarray(rng.uniform(0, 255, (n_tiles, n_tiles, 256)).astype(np.float32))
    qimg = jnp.clip(pimg.astype(jnp.int32), 0, 255)
    ys = jnp.arange(ph, dtype=jnp.float32)
    xs = jnp.arange(pw, dtype=jnp.float32)
    ty = (ys - th / 2.0 + 0.5) / th
    tx = (xs - tw / 2.0 + 0.5) / tw
    ty0 = jnp.clip(jnp.floor(ty).astype(jnp.int32), 0, n_tiles - 1)
    tx0 = jnp.clip(jnp.floor(tx).astype(jnp.int32), 0, n_tiles - 1)
    ty1 = jnp.clip(ty0 + 1, 0, n_tiles - 1)
    tx1 = jnp.clip(tx0 + 1, 0, n_tiles - 1)

    @jax.jit
    def lut_gather4(qimg):
        def _at(tyi, txi):
            return lut[tyi[:, None], txi[None, :], qimg]
        return _at(ty0, tx0) + _at(ty0, tx1) + _at(ty1, tx0) + _at(ty1, tx1)

    print(f"lut 4x 3d-gather       {timeit(lambda: lut_gather4(qimg)):8.2f} ms")

    @jax.jit
    def lut_flat(qimg):
        lutf = lut.reshape(-1)
        def _at(tyi, txi):
            idx = (tyi[:, None] * n_tiles + txi[None, :]) * 256 + qimg
            return lutf[idx]
        return _at(ty0, tx0) + _at(ty0, tx1) + _at(ty1, tx0) + _at(ty1, tx1)

    print(f"lut 4x flat-gather     {timeit(lambda: lut_flat(qimg)):8.2f} ms")


if __name__ == "__main__":
    main()

"""Test: does flattening index arrays to 1-D unlock the fast gather path?"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CHAIN = 50


def chain_time(make_fn, n_outer=3):
    import jax
    fn, args = make_fn()
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN * 1e3


def main():
    from sr_livo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}  (ms per op, chain={CHAIN})")
    rng = np.random.RandomState(0)

    # LUT apply: 2-D idx vs flattened 1-D idx
    def mk_lut(flat):
        nt = 32
        lut = jax.device_put(
            rng.uniform(0, 255, (nt * nt * 256,)).astype(np.float32))
        q = jax.device_put(rng.randint(0, 256, (512, 640)).astype(np.int32))
        tid = jax.device_put(
            rng.randint(0, nt * nt, (512, 640)).astype(np.int32))

        def f(l, qq, tt):
            def body(_, carry):
                s, q2 = carry
                idx = tt * 256 + q2
                if flat:
                    g = l[idx.reshape(-1)].reshape(512, 640)
                else:
                    g = l[idx]
                s = s + jnp.sum(g)
                q2 = (q2 + 1) % 256
                return (s, q2)
            return jax.lax.fori_loop(0, CHAIN, body, (0.0, qq))[0]
        return jax.jit(f), (lut, q, tid)

    print(f"LUT 2-D idx gather       {chain_time(lambda: mk_lut(False)):8.3f}")
    print(f"LUT 1-D flattened idx    {chain_time(lambda: mk_lut(True)):8.3f}")

    # probe chain: 2-D cand vs flattened
    def mk_probe(flat):
        cap, P = 1 << 18, 16
        sig = jax.device_put(rng.randint(0, 2**31, cap).astype(np.uint32))
        base = jax.device_put(rng.randint(0, cap, 8192).astype(np.int32))

        def f(s, b):
            def body(_, carry):
                acc, b2 = carry
                offs = jnp.arange(P, dtype=jnp.int32)
                cand = (b2[:, None] + offs) & (cap - 1)
                if flat:
                    g = s[cand.reshape(-1)].reshape(8192, P)
                else:
                    g = s[cand]
                acc = acc + jnp.sum(g.astype(jnp.float32))
                b2 = (b2 + g[0, :1].astype(jnp.int32) + 1) & (cap - 1)
                return (acc, b2)
            return jax.lax.fori_loop(0, CHAIN, body, (0.0, base))[0]
        return jax.jit(f), (sig, base)

    print(f"probe 2-D cand           {chain_time(lambda: mk_probe(False)):8.3f}")
    print(f"probe flattened cand     {chain_time(lambda: mk_probe(True)):8.3f}")

    # remap via flattened 1-D indices (4 gathers) vs advanced 2-D
    def mk_remap(kind):
        from sr_livo_tpu.ops import image_ops
        img = jax.device_put(
            rng.uniform(0, 255, (512, 640, 3)).astype(np.float32))
        k = np.array([[431.0, 0, 320], [0, 431.0, 256], [0, 0, 1]])
        dist = np.array([-0.1, 0.1, 0.0, 0.0, 0.0])
        ud = jnp.asarray(image_ops.make_undistort_map(k, dist, (512, 640)))
        u = jnp.clip(ud[..., 0], 0.0, 639 - 1.001)
        v = jnp.clip(ud[..., 1], 0.0, 511 - 1.001)
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        fu = (u - u0)[..., None]
        fv = (v - v0)[..., None]
        u0i = u0.astype(jnp.int32)
        v0i = v0.astype(jnp.int32)

        def f(im):
            def body(_, carry):
                s, im2 = carry
                if kind == "adv":
                    p00 = im2[v0i, u0i]
                    p01 = im2[v0i, u0i + 1]
                    p10 = im2[v0i + 1, u0i]
                    p11 = im2[v0i + 1, u0i + 1]
                else:
                    flat = im2.reshape(-1, 3)
                    i00 = (v0i * 640 + u0i).reshape(-1)
                    p00 = flat[i00].reshape(512, 640, 3)
                    p01 = flat[i00 + 1].reshape(512, 640, 3)
                    p10 = flat[i00 + 640].reshape(512, 640, 3)
                    p11 = flat[i00 + 641].reshape(512, 640, 3)
                r = ((1 - fv) * (1 - fu) * p00 + (1 - fv) * fu * p01
                     + fv * (1 - fu) * p10 + fv * fu * p11)
                s = s + jnp.sum(r)
                im2 = im2 + r * 1e-9
                return (s, im2)
            return jax.lax.fori_loop(0, CHAIN, body, (0.0, img))[0]
        return jax.jit(f), (img,)

    print(f"remap adv 2-D idx        {chain_time(lambda: mk_remap('adv')):8.3f}")
    print(f"remap flat 1-D idx       {chain_time(lambda: mk_remap('flat')):8.3f}")

    # window gather: per-point patches, flat-idx one-shot formulation
    def mk_win(kind):
        from sr_livo_tpu.ops import image_ops
        img = jax.device_put(
            rng.uniform(0, 255, (512, 640)).astype(np.float32))
        pts = jax.device_put(rng.uniform(16, 400, (304, 2)).astype(np.float32))

        def f(im, p):
            def body(_, carry):
                s, p2 = carry
                if kind == "cur":
                    w = image_ops.sample_windows_bilinear(im, p2, 21)
                else:
                    half = 10
                    u = p2[:, 0] - half
                    v = p2[:, 1] - half
                    u0 = jnp.floor(u)
                    v0 = jnp.floor(v)
                    fu = (u - u0)[:, None, None]
                    fv = (v - v0)[:, None, None]
                    base = (v0.astype(jnp.int32) * 640
                            + u0.astype(jnp.int32))            # (M,)
                    dy = jnp.arange(22, dtype=jnp.int32)
                    dxo = jnp.arange(22, dtype=jnp.int32)
                    off = (dy[:, None] * 640 + dxo[None, :])   # (22,22)
                    idx = (base[:, None, None] + off[None]).reshape(-1)
                    pch = im.reshape(-1)[idx].reshape(304, 22, 22)
                    w = ((1 - fv) * (1 - fu) * pch[:, :21, :21]
                         + (1 - fv) * fu * pch[:, :21, 1:]
                         + fv * (1 - fu) * pch[:, 1:, :21]
                         + fv * fu * pch[:, 1:, 1:])
                s = s + jnp.sum(w)
                p2 = p2 + jnp.float32(1e-6)
                return (s, p2)
            return jax.lax.fori_loop(0, CHAIN, body, (0.0, pts))[0]
        return jax.jit(f), (img, pts)

    print(f"window patch-gather cur  {chain_time(lambda: mk_win('cur')):8.3f}")
    print(f"window flat 1-D idx      {chain_time(lambda: mk_win('flat')):8.3f}")


if __name__ == "__main__":
    main()

"""Trustworthy per-op timing: chain each op N times inside ONE jit with a
data dependency, so tunnel/dispatch noise amortizes away."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CHAIN = 50


def chain_time(make_fn, n_outer=3):
    """make_fn() -> (jitted chained fn, args). Returns ms per single op."""
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
    from sr_livo_tpu.ops import image_ops

    print(f"backend: {jax.default_backend()}  (ms per op, chain={CHAIN})")
    rng = np.random.RandomState(0)

    def mk_scalar_gather(tab_elems, n_idx):
        tab = jax.device_put(rng.uniform(0, 1, tab_elems).astype(np.float32))
        idx = jax.device_put(rng.randint(0, tab_elems, n_idx).astype(np.int32))

        def f(t, i):
            def body(_, carry):
                s, i2 = carry
                g = t[i2]
                s = s + jnp.sum(g)
                # data-dep: rotate indices by a value derived from g
                i2 = (i2 + g[:1].astype(jnp.int32) + 1) % tab_elems
                return (s, i2)
            return jax.lax.fori_loop(0, CHAIN, body, (0.0, i))[0]
        return jax.jit(f), (tab, idx)

    for te in (1 << 12, 1 << 18, 1 << 22):
        ms = chain_time(lambda te=te: mk_scalar_gather(te, 131072))
        print(f"scalar gather 131K idx, tab {te>>10:6d}K   {ms:8.3f}")

    def mk_row_gather(rows, width, n_idx):
        tab = jax.device_put(
            rng.uniform(0, 1, (rows, width)).astype(np.float32))
        idx = jax.device_put(rng.randint(0, rows, n_idx).astype(np.int32))

        def f(t, i):
            def body(_, carry):
                s, i2 = carry
                g = t[i2]
                s = s + jnp.sum(g)
                i2 = (i2 + g[0, :1].astype(jnp.int32) + 1) % rows
                return (s, i2)
            return jax.lax.fori_loop(0, CHAIN, body, (0.0, i))[0]
        return jax.jit(f), (tab, idx)

    print(f"row gather (256K,3) 8K idx         "
          f"{chain_time(lambda: mk_row_gather(1 << 18, 3, 8192)):8.3f}")
    print(f"row gather (256K,3) 82K idx        "
          f"{chain_time(lambda: mk_row_gather(1 << 18, 3, 81920)):8.3f}")

    def mk_block_gather():
        C, K = 1 << 18, 20
        tab = jax.device_put(rng.uniform(0, 1, (C, K, 3)).astype(np.float32))
        idx = jax.device_put(rng.randint(0, C, 27648).astype(np.int32))

        def f(t, i):
            def body(_, carry):
                s, i2 = carry
                g = t[i2]
                s = s + jnp.sum(g)
                i2 = (i2 + g[0, 0, :1].astype(jnp.int32) + 1) % C
                return (s, i2)
            return jax.lax.fori_loop(0, CHAIN, body, (0.0, i))[0]
        return jax.jit(f), (tab, idx)

    print(f"block gather (1,20,3) 27.6K idx    "
          f"{chain_time(mk_block_gather):8.3f}")

    def mk_probe(kind):
        cap, P = 1 << 18, 16
        sig = jax.device_put(rng.randint(0, 2**31, cap).astype(np.uint32))
        base = jax.device_put(rng.randint(0, cap, 8192).astype(np.int32))

        def f(s, b):
            sp = jnp.concatenate([s, s[:P]])

            def body(_, carry):
                acc, b2 = carry
                if kind == "scalar":
                    offs = jnp.arange(P, dtype=jnp.int32)
                    cand = (b2[:, None] + offs) & (cap - 1)
                    g = s[cand]
                else:
                    dn = jax.lax.GatherDimensionNumbers(
                        offset_dims=(1,), collapsed_slice_dims=(),
                        start_index_map=(0,))
                    g = jax.lax.gather(sp, b2[:, None], dn, slice_sizes=(P,),
                                       mode=jax.lax.GatherScatterMode.CLIP)
                acc = acc + jnp.sum(g.astype(jnp.float32))
                b2 = (b2 + g[0, :1].astype(jnp.int32) + 1) & (cap - 1)
                return (acc, b2)
            return jax.lax.fori_loop(0, CHAIN, body, (0.0, base))[0]
        return jax.jit(f), (sig, base)

    print(f"probe 8Kx16 scalar-idx gather      "
          f"{chain_time(lambda: mk_probe('scalar')):8.3f}")
    print(f"probe 8Kx16 contiguous slice       "
          f"{chain_time(lambda: mk_probe('slice')):8.3f}")

    def mk_counts():
        C = 1 << 18
        counts = jax.device_put(rng.randint(0, 20, C).astype(np.int32))
        idx = jax.device_put(rng.randint(0, C, 27648).astype(np.int32))

        def f(t, i):
            def body(_, carry):
                s, i2 = carry
                g = t[i2]
                s = s + jnp.sum(g)
                i2 = (i2 + g[:1] + 1) % C
                return (s, i2)
            return jax.lax.fori_loop(0, CHAIN, body, (jnp.int32(0), i))[0]
        return jax.jit(f), (counts, idx)

    print(f"counts scalar gather 27.6K         "
          f"{chain_time(mk_counts):8.3f}")

    def mk_scatter_add():
        C = 1 << 18
        idx = jax.device_put(rng.randint(0, C, 131072).astype(np.int32))

        def f(i):
            def body(_, carry):
                s, i2 = carry
                h = jnp.zeros((C,), jnp.float32).at[i2].add(1.0)
                s = s + h[0]
                i2 = (i2 + h[:1].astype(jnp.int32) + 1) % C
                return (s, i2)
            return jax.lax.fori_loop(0, CHAIN, body, (0.0, idx))[0]
        return jax.jit(f), (idx,)

    print(f"scatter-add 131K into 256K         "
          f"{chain_time(mk_scatter_add):8.3f}")

    def mk_scatter_set():
        CK = (1 << 18) * 20
        dst = jax.device_put(rng.uniform(0, 1, (CK, 3)).astype(np.float32))
        vals = jax.device_put(rng.uniform(0, 1, (8192, 3)).astype(np.float32))
        idx = jax.device_put(rng.randint(0, CK, 8192).astype(np.int32))

        def f(d, v, i):
            def body(_, carry):
                d2, i2 = carry
                d2 = d2.at[i2].set(v, mode="drop", unique_indices=True)
                i2 = (i2 + d2[0, :1].astype(jnp.int32) + 1) % CK
                return (d2, i2)
            return jax.lax.fori_loop(0, CHAIN, body, (d, i))[0][0, 0]
        return jax.jit(f), (dst, vals, idx)

    print(f"scatter-set 8K rows into 5M-row    "
          f"{chain_time(mk_scatter_set):8.3f}")

    def mk_argsort(n):
        keys = jax.device_put(rng.uniform(0, 1, n).astype(np.float32))

        def f(k):
            def body(_, carry):
                s, k2 = carry
                o = jnp.argsort(k2)
                s = s + o[0]
                k2 = k2 + o.astype(jnp.float32) * 1e-9
                return (s, k2)
            return jax.lax.fori_loop(0, CHAIN, body, (jnp.int32(0), k))[0]
        return jax.jit(f), (keys,)

    for n in (2048, 8192, 16384):
        print(f"argsort {n:6d}                     "
              f"{chain_time(lambda n=n: mk_argsort(n)):8.3f}")

    def mk_window_gather():
        img = jax.device_put(rng.uniform(0, 255, (512, 640)).astype(np.float32))
        pts = jax.device_put(rng.uniform(16, 400, (304, 2)).astype(np.float32))

        def f(im, p):
            def body(_, carry):
                s, p2 = carry
                w = image_ops.sample_windows_bilinear(im, p2, 21)
                s = s + jnp.sum(w)
                p2 = p2 + (w[0, 0, :1] * 0).astype(p2.dtype)[None, :] \
                    + jnp.float32(1e-6)
                return (s, p2)
            return jax.lax.fori_loop(0, CHAIN, body, (0.0, p))[0]
        return jax.jit(f), (img, pts)

    print(f"window gather (304,21,21) bilinear "
          f"{chain_time(mk_window_gather):8.3f}")

    def mk_lut(kind):
        nt = 32
        lut = jax.device_put(
            rng.uniform(0, 255, (nt * nt, 256)).astype(np.float32))
        q = jax.device_put(rng.randint(0, 256, (512, 640)).astype(np.int32))
        ty = jax.device_put(rng.randint(0, nt, (512,)).astype(np.int32))
        tx = jax.device_put(rng.randint(0, nt, (640,)).astype(np.int32))

        def f(l, qq, tyy, txx):
            def body(_, carry):
                s, q2 = carry
                tid = tyy[:, None] * nt + txx[None, :]
                if kind == "flat":
                    g = l.reshape(-1)[tid * 256 + q2]
                else:
                    # blocked take_along_axis: (B, P) gather from (B, 256)
                    th, tw = 512 // nt, 640 // nt
                    qb = q2.reshape(nt, th, nt, tw).transpose(0, 2, 1, 3)
                    qb = qb.reshape(nt * nt, th * tw)
                    g = jnp.take_along_axis(l, qb, axis=1)
                s = s + jnp.sum(g.astype(jnp.float32))
                q2 = (q2 + 1) % 256
                return (s, q2)
            return jax.lax.fori_loop(0, CHAIN, body, (0.0, qq))[0]
        return jax.jit(f), (lut, q, ty, tx)

    print(f"LUT apply flat scalar gather       "
          f"{chain_time(lambda: mk_lut('flat')):8.3f}")
    print(f"LUT apply blocked take_along       "
          f"{chain_time(lambda: mk_lut('block')):8.3f}")

    def mk_remap(kind):
        img = jax.device_put(
            rng.uniform(0, 255, (512, 640, 3)).astype(np.float32))
        k = np.array([[431.0, 0, 320], [0, 431.0, 256], [0, 0, 1]])
        dist = np.array([-0.1, 0.1, 0.0, 0.0, 0.0])
        ud = jnp.asarray(image_ops.make_undistort_map(k, dist, (512, 640)))

        def f(im):
            def body(_, carry):
                s, im2 = carry
                if kind == "cur":
                    r = image_ops.remap(im2, ud)
                else:
                    # 2x2x3 slice gather formulation
                    u = jnp.clip(ud[..., 0], 0.0, 639 - 1.001)
                    v = jnp.clip(ud[..., 1], 0.0, 511 - 1.001)
                    u0 = jnp.floor(u)
                    v0 = jnp.floor(v)
                    fu = (u - u0)[..., None]
                    fv = (v - v0)[..., None]
                    tl = jnp.stack([v0.astype(jnp.int32),
                                    u0.astype(jnp.int32)], -1).reshape(-1, 2)
                    dn = jax.lax.GatherDimensionNumbers(
                        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                        start_index_map=(0, 1))
                    p = jax.lax.gather(
                        im2, tl, dn, slice_sizes=(2, 2, 3),
                        mode=jax.lax.GatherScatterMode.CLIP)
                    p = p.reshape(512, 640, 2, 2, 3)
                    r = ((1 - fv) * (1 - fu) * p[:, :, 0, 0]
                         + (1 - fv) * fu * p[:, :, 0, 1]
                         + fv * (1 - fu) * p[:, :, 1, 0]
                         + fv * fu * p[:, :, 1, 1])
                s = s + jnp.sum(r)
                im2 = im2 + r * 1e-9
                return (s, im2)
            return jax.lax.fori_loop(0, CHAIN, body, (0.0, im))[0]
        return jax.jit(f), (img,)

    print(f"remap current (4 adv-idx gathers)  "
          f"{chain_time(lambda: mk_remap('cur')):8.3f}")
    print(f"remap 2x2x3 slice gather           "
          f"{chain_time(lambda: mk_remap('slice')):8.3f}")


if __name__ == "__main__":
    main()

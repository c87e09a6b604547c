"""Trustworthy per-component timing: each op looped 20x inside ONE jitted
program with a serializing data dependency, so tunnel/dispatch noise is
amortized away.  Numbers printed are per-iteration costs."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

LOOP = 20


def timeit(fn, *args, n=15, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3 / LOOP


def main():
    from sr_livo_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from sr_livo_tpu.ops import voxel_map as vm
    from sr_livo_tpu.ops import neighborhood as nb_ops
    from sr_livo_tpu.models import eskf as eskf_mod

    print("backend:", jax.default_backend(), f"(per-iter over {LOOP} loops)")
    rng = np.random.RandomState(0)
    capacity, K = 1 << 18, 20
    max_probe = 8
    voxel_size = 1.0
    Q = 1024
    NB = 27

    vmap_ = vm.make_map(capacity, K)
    pts0 = jnp.asarray(rng.uniform(-40, 40, (60000, 3)).astype(np.float32))
    vmap_, _ = vm.insert(vmap_, pts0, jnp.ones(60000, bool), voxel_size,
                         0.1, max_probe, budget=None)
    queries = jnp.asarray(rng.uniform(-35, 35, (Q, 3)).astype(np.float32))
    jax.block_until_ready(vmap_.counts)

    def loop(g):
        def f(x, *rest):
            def body(i, x):
                return g(x + i * 1e-6, *rest)
            return jax.lax.fori_loop(0, LOOP, body, x)
        return jax.jit(f)

    # 1. knn full
    knn_full = loop(lambda q, v: vm.knn(
        v, q, voxel_size=voxel_size, max_neighbors=K, max_probe=max_probe,
        nb_voxels=1, threshold_capacity=1)[0][:, 0, :])
    print(f"knn full              {timeit(knn_full, queries, vmap_):8.3f} ms")

    # 2. lookup only (27 coords per query)
    offs = vm._offsets(1)

    def lk(q, v):
        qc = vm.voxel_coords(q, voxel_size)
        c27 = qc[:, None, :] + offs[None, :, :]
        slots = vm.lookup(v, c27, max_probe)
        return q + slots[:, :1].astype(jnp.float32) * 1e-9
    lk_l = loop(lk)
    print(f"  lookup27            {timeit(lk_l, queries, vmap_):8.3f} ms")

    # 3. gather candidates given slots
    qc = vm.voxel_coords(queries, voxel_size)
    c27 = qc[:, None, :] + offs[None, :, :]
    slots0 = vm.lookup(vmap_, c27, max_probe)

    def gath(q, v, slots):
        found = slots >= 0
        safe = jnp.where(found, slots, 0)
        cnt = jnp.where(found, v.counts[safe], 0)
        cand = v.points[safe]
        return q + cand[:, 0, 0, :] * 1e-9 + cnt[:, :1].astype(jnp.float32) * 0
    gath_l = loop(gath)
    print(f"  cand gather         {timeit(gath_l, queries, vmap_, slots0):8.3f} ms")

    # 4. top_k given d2
    d2_0 = jnp.asarray(rng.uniform(0, 9, (Q, NB * K)).astype(np.float32))

    def topk(q, d2):
        neg, idx = jax.lax.top_k(-(d2 + q[:, :1] * 1e-9), K)
        return q + neg[:, :1] * 1e-9
    topk_l = loop(topk)
    print(f"  top_k 540->20       {timeit(topk_l, queries, d2_0):8.3f} ms")

    # 5. neighborhood PCA given neighbors
    nbrs0 = jnp.asarray(rng.randn(Q, K, 3).astype(np.float32))
    nf = jnp.full((Q,), K, jnp.int32)

    def pca(q, nbrs):
        normal, a2d, _ = nb_ops.neighborhood_distribution(
            nbrs + q[:, None, :] * 1e-9, nf)
        return q + normal * 1e-9
    pca_l = loop(pca)
    print(f"  pca (jnp)           {timeit(pca_l, queries, nbrs0):8.3f} ms")

    # 6. pallas plane rows
    try:
        from sr_livo_tpu.ops.pallas.plane_fit import plane_residuals_pallas
        r_world = jnp.eye(3, dtype=jnp.float32)

        def ppl(q, nbrs):
            h_x, h, good = plane_residuals_pallas(
                nbrs + q[:, None, :] * 1e-9, nf, q, q, r_world,
                jnp.zeros(3, jnp.float32), jnp.ones((Q,), bool),
                lam_w=0.5, lam_nb=0.5, power_planarity=2.0, max_dist=0.3,
                min_neighbors=12)
            return q + h_x[:, :3] * 1e-9
        ppl_l = loop(ppl)
        print(f"  pallas plane rows   {timeit(ppl_l, queries, nbrs0):8.3f} ms")
    except Exception as e:
        print("  pallas plane rows   skipped:", e)

    # 7. gain solve given H (17x17 inverses)
    hx0 = jnp.asarray(rng.randn(Q, 6).astype(np.float32))
    cov0 = jnp.eye(17, dtype=jnp.float32)

    def solve(q, hx):
        hx = hx + q[:, :1] * 1e-9
        hth = hx.T @ hx
        temp = jnp.linalg.inv(cov0 * 1e3)
        temp = temp.at[0:6, 0:6].add(hth)
        temp_inv = jnp.linalg.inv(temp)
        return q + temp_inv[0, :3] * 1e-9
    solve_l = loop(solve)
    print(f"  gain solve (2x inv) {timeit(solve_l, queries, hx0):8.3f} ms")

    # 8. insert (map threaded through the loop, shifted points each iter)
    ins_pts = jnp.asarray(rng.uniform(-40, 40, (8192, 3)).astype(np.float32))
    vld = jnp.ones(8192, bool)

    def ins_loop(p0, v):
        def body(i, carry):
            v, p = carry
            v2, _ = vm.insert(v, p, vld, voxel_size, 0.1, max_probe,
                              budget=2048)
            return (v2, p + 0.05)
        v2, _ = jax.lax.fori_loop(0, LOOP, body, (v, p0))
        return v2.counts
    ins_l = jax.jit(ins_loop)
    for _ in range(3):
        out = ins_l(ins_pts, vmap_)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = ins_l(ins_pts, vmap_)
    jax.block_until_ready(out)
    print(f"insert (looped)       {(time.perf_counter()-t0)/(3*LOOP)*1e3:8.3f} ms",
          flush=True)

    # 9. predict_sweep parallel vs sequential
    S = 64
    state = eskf_mod.init_state()
    noise = eskf_mod.noise_diag(0.1, 0.1, 1e-4, 1e-5)
    dts = jnp.full((S,), 0.005, jnp.float32)
    accs = jnp.asarray((np.array([0, 0, 9.81]) + rng.randn(S, 3) * 0.2
                        ).astype(np.float32))
    gyrs = jnp.asarray((rng.randn(S, 3) * 0.1).astype(np.float32))
    t_rel = jnp.cumsum(dts)
    valid = jnp.ones((S,), bool)

    for name, fn in (("predict par", eskf_mod.predict_sweep),
                     ("predict seq", eskf_mod.predict_sweep_sequential)):
        def pred(p, s=state, f=fn):
            def body(i, p):
                st = s._replace(p=p)
                fin, _ = f(st, noise, t_rel, dts, accs, gyrs, valid)
                return fin.p
            return jax.lax.fori_loop(0, LOOP, body, p)
        pl = jax.jit(pred)
        print(f"{name}           {timeit(pl, state.p):8.3f} ms")


if __name__ == "__main__":
    main()

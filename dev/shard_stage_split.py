"""Micro-measurement: per-stage cost split of the sharded per-shard
program at bench shapes, on CPU.  Guides budget/structure tuning —
not a product artifact."""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import numpy as np


def timeit(fn, *args, n=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from sr_livo_tpu.config import LivoConfig
    from sr_livo_tpu.ops import voxel_map as vm
    from sr_livo_tpu.ops import neighborhood as nb_ops
    from sr_livo_tpu.parallel import routing
    from sr_livo_tpu.parallel.sharded_lio import compute_budgets
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    from scaling_bench import base_cfg

    cfg = base_cfg()
    n = 8
    b = compute_budgets(cfg, n)
    print("budgets:", b)
    rng = np.random.RandomState(0)

    # representative data
    pts = jnp.asarray(rng.uniform(-20, 20, (8192, 3)), jnp.float32)

    # stage: local pre-dedup sort at Ns
    Ns = b["Ns"]
    fh = jnp.asarray(rng.randint(0, 2 ** 31 - 1, Ns), jnp.int32)
    gidx = jnp.arange(Ns, dtype=jnp.int32)
    val = jnp.ones(Ns, bool)
    from sr_livo_tpu.ops.frame import bucket_dedup_min
    f = jax.jit(lambda a, c, v: bucket_dedup_min(a, c, v))
    print(f"bucket_dedup_min Ns={Ns}: {timeit(f, fh, gidx, val)*1e3:.3f} ms")

    # stage: received dedup at n*B2
    m2 = n * b["B2"]
    fh2 = jnp.asarray(rng.randint(0, 2 ** 31 - 1, m2), jnp.int32)
    gx2 = jnp.asarray(rng.randint(0, 8192, m2), jnp.int32)
    v2 = jnp.ones(m2, bool)
    print(f"bucket_dedup_min n*B2={m2}: {timeit(f, fh2, gx2, v2)*1e3:.3f} ms")

    # stage: pack_for_exchange at Ns
    rows = routing.pack_cols(pts[:Ns], fh, gidx)
    dest = jnp.asarray(rng.randint(0, n, Ns), jnp.int32)
    g = jax.jit(lambda d, v, r: routing.pack_for_exchange(d, v, r, n,
                                                          b["B2"]))
    print(f"pack_for_exchange Ns={Ns}: "
          f"{timeit(g, dest, val, rows)*1e3:.3f} ms")

    # stage: de-skew-ish per-point math at Ns (quat rotate x2)
    from sr_livo_tpu.utils import lie
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    h = jax.jit(lambda p: lie.quat_rotate(
        jnp.broadcast_to(q, (p.shape[0], 4)), p) * 1.0001)
    print(f"pointwise Ns={Ns}: {timeit(h, pts[:Ns])*1e3:.3f} ms")

    # stage: local kNN at K4 on a populated local table
    lm = vm.make_map(b["local_capacity"], 20)
    for i in range(0, 8192, 2048):
        lm, _ = vm.insert(lm, pts[i:i + 2048],
                          jnp.ones(2048, bool), 1.0, 0.1, 8)
    K4 = b["K4"]
    queries = pts[:K4]
    knn = jax.jit(lambda m, qq: vm.knn(m, qq, voxel_size=1.0,
                                       max_neighbors=20, max_probe=8,
                                       nb_voxels=1, threshold_capacity=1))
    print(f"knn K4={K4}: {timeit(knn, lm, queries)*1e3:.3f} ms")
    Q = cfg.shapes.max_keypoints
    knn_t = timeit(knn, lm, pts[:Q])
    print(f"knn Q={Q} (single-chip): {knn_t*1e3:.3f} ms")

    # neighborhood PCA at K4
    nb, ok, _ = knn(lm, queries)
    nf = jnp.sum(ok, axis=1).astype(jnp.int32)
    pca = jax.jit(nb_ops.neighborhood_distribution)
    print(f"pca K4={K4}: {timeit(pca, nb, nf)*1e3:.3f} ms")

    # stage: insert at W_ins vs single-chip budget
    W = b["W_ins"]
    ins = jax.jit(lambda m, p, v: vm.insert(m, p, v, 1.0, 0.1, 8))
    pw = jnp.asarray(rng.uniform(-20, 20, (W, 3)), jnp.float32)
    vw = jnp.ones(W, bool)
    print(f"insert W_ins={W}: {timeit(ins, lm, pw, vw)*1e3:.3f} ms")
    bud = cfg.shapes.max_insert_points
    ins2 = jax.jit(lambda m, p, v: vm.insert(m, p, v, 1.0, 0.1, 8,
                                             budget=bud))
    print(f"insert single (F=4096, budget={bud}): "
          f"{timeit(ins2, lm, pts[:4096], jnp.ones(4096, bool))*1e3:.3f} ms")

    # full single-chip subsample at F
    from sr_livo_tpu.ops import frame as frame_ops
    sub = jax.jit(lambda p, v: frame_ops.voxel_subsample(p, v, 0.25, 4096))
    print(f"voxel_subsample single N=8192: "
          f"{timeit(sub, pts, jnp.ones(8192, bool))*1e3:.3f} ms")


if __name__ == "__main__":
    main()

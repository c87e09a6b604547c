"""A/B: weak-8 per-shard step with the stock 2x halo-headroom table vs a
halved (1x) table — isolates the table-size cache effect on the CPU
proxy.  Round-robin interleaved, per-config min."""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(ROOT, "scripts"))
import scaling_bench as sb
from sr_livo_tpu.models.odometry import LioEngine
from sr_livo_tpu.parallel import mesh as mesh_mod
from sr_livo_tpu.parallel.sharded_lio import ShardedLioEngine, compute_budgets
from sr_livo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
n = 8
cfg1 = sb.base_cfg()
sweeps1 = sb.build_sweeps(cfg1)
cfgw = sb.base_cfg(scale=n)
sweepsw = sb.build_sweeps(cfgw, tile=n)
b = compute_budgets(cfgw, n)
ov2 = dict(b)
for k in ("B2", "B3", "B4", "B5", "B6"):
    ov2[k] = b[k] * n
ov1 = dict(ov2)
ov1["local_capacity"] = b["local_capacity"] // 2
mesh1 = mesh_mod.make_mesh(1)

runs = {
    "single": (LioEngine(cfg1), sweeps1),
    "weak8_2x": (ShardedLioEngine(cfgw, mesh1, budget_override=ov2), sweepsw),
    "weak8_1x": (ShardedLioEngine(cfgw, mesh1, budget_override=ov1), sweepsw),
}
live = {}
for name, (eng, sw) in runs.items():
    st, vmp = eng.init_state(), eng.make_map()
    for fid, s_ in enumerate(sw, start=1):
        o = eng.step(st, vmp, s_, fid)
        st, vmp = o.state, o.voxel_map
    jax.block_until_ready(st.p)
    live[name] = [eng, st, vmp, sw]
    print(f"warmed {name}", flush=True)
best = {name: np.inf for name in runs}
for _pass in range(3):
    for name, slot in live.items():
        eng, st, vmp, sw = slot
        t0 = time.perf_counter()
        for fid, s_ in enumerate(sw, start=1):
            o = eng.step(st, vmp, s_, fid + len(sw))
            st, vmp = o.state, o.voxel_map
        jax.block_until_ready(st.p)
        best[name] = min(best[name], (time.perf_counter() - t0) / len(sw))
        slot[1], slot[2] = st, vmp
for name, t in best.items():
    print(f"{name}: {t*1e3:.2f} ms")
t1 = best["single"]
print(f"eff 2x: {t1/best['weak8_2x']:.3f}   eff 1x: {t1/best['weak8_1x']:.3f}")

"""Per-stage profile of the SATURATING weak-8 per-shard program (8x
base workload per chip, 64x global) vs the single-chip engine at the
same per-chip workload (8x base) — finds where the 74 ms/shard
saturating-weak overhead (SCALING_r05: 274.3 vs 200.4 ms, eff 0.73)
actually goes.  Usage:  python dev/r5_sat_profile.py
"""
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
from sr_livo_tpu.parallel import mesh as mesh_mod
from sr_livo_tpu.parallel.sharded_lio import ShardedLioEngine
from sr_livo_tpu.models.odometry import LioEngine
from sr_livo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

# --- single-chip engine at 8x base (the saturating per-chip workload)
cfg8 = sb.base_cfg(scale=8)
sweeps8 = sb.build_sweeps(cfg8, n=4, tile=8)
t_single8 = sb.time_engine(lambda: LioEngine(cfg8), sweeps8, repeats=2)
print(f"single-chip @8x: {t_single8*1e3:.2f} ms", flush=True)

# --- sharded per-shard program at the same per-chip workload
cfg64 = sb.base_cfg(scale=64)
b64 = sb.pershard_budgets(cfg64, 8)
ov64 = dict(b64)
for k in ("B2", "B3", "B4", "B5", "B6"):
    ov64[k] = b64[k] * 8
print("per-shard budgets:", {k: v for k, v in sorted(ov64.items())},
      flush=True)
sweeps64 = sb.build_sweeps(cfg64, n=4, tile=64)
mesh1 = mesh_mod.make_mesh(1)
eng = ShardedLioEngine(cfg64, mesh1, budget_override=ov64)
st, vmp = eng.init_state(), eng.make_map()
for fid, sw_ in enumerate(sweeps64, start=1):
    o = eng.step(st, vmp, sw_, fid)
    st, vmp = o.state, o.voxel_map
jax.block_until_ready(st.p)

stages = ["deskew", "frame_sub", "kp_sub", "route_q", "iekf",
          "ins_route", "ins_gate", "insert", "rep_pack",
          "rep_sort", "replay", "out"]
sw_ = sweeps64[-1]
times, prev = {}, 0.0
for stg in stages:
    f = eng.make_profile_step(stg)
    jax.block_until_ready(f(st, vmp, sw_))
    best = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(f(st, vmp, sw_))
        best = min(best, time.perf_counter() - t0)
    times[stg] = round((best - prev) * 1e3, 2)
    prev = best
    print(f"  {stg:<10} {times[stg]:8.2f} ms  (prefix {prev*1e3:8.2f})",
          flush=True)
times["prefix_total_ms"] = round(prev * 1e3, 2)
print("sat-weak8 per-shard stage profile:", times, flush=True)
print(f"single-chip @8x total: {t_single8*1e3:.2f} ms; "
      f"per-shard overhead = {times['prefix_total_ms'] - t_single8*1e3:.2f} "
      f"ms (vs SCALING_r05 delta 73.9)", flush=True)

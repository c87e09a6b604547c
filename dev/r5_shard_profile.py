"""Per-stage profile of the sharded engine's per-shard program (weak-n
workload on a 1-device mesh, collectives = identity): times each
stop_after prefix and prints the stage diffs.  Usage:
    python dev/r5_shard_profile.py [n] [--tpu]
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

use_tpu = "--tpu" in sys.argv
args = [a for a in sys.argv[1:] if not a.startswith("--")]
n = int(args[0]) if args else 8

import jax
if not use_tpu:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(ROOT, "scripts"))
import scaling_bench as sb
from sr_livo_tpu.parallel import mesh as mesh_mod
from sr_livo_tpu.parallel.sharded_lio import ShardedLioEngine, compute_budgets
from sr_livo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

cfg = sb.base_cfg(scale=n)
b = compute_budgets(cfg, n)
ov = dict(b)
for k in ("B2", "B3", "B4", "B5", "B6"):
    ov[k] = b[k] * n
sweeps = sb.build_sweeps(cfg, tile=n)
mesh1 = mesh_mod.make_mesh(1)
eng = ShardedLioEngine(cfg, mesh1, budget_override=ov)
state, vmap_ = eng.init_state(), eng.make_map()
for fid, s in enumerate(sweeps, start=1):
    out = eng.step(state, vmap_, s, fid)
    state, vmap_ = out.state, out.voxel_map
jax.block_until_ready(state.p)

stages = ["deskew", "frame_sub", "kp_sub", "route_q", "iekf",
          "ins_route", "ins_gate", "insert", "rep_pack", "rep_sort",
          "replay", "out"]
sweep = sweeps[-1]
times = {}
for st in stages:
    f = eng.make_profile_step(st)
    r = f(state, vmap_, sweep)
    jax.block_until_ready(r)
    best = np.inf
    for _ in range(6):
        t0 = time.perf_counter()
        r = f(state, vmap_, sweep)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    times[st] = best
    print(f"prefix {st:10s}: {best*1e3:8.2f} ms", flush=True)

print(f"\nweak n={n} per-shard stage breakdown (prefix diffs):")
prev = 0.0
for st in stages:
    print(f"  {st:10s}: {(times[st]-prev)*1e3:8.2f} ms")
    prev = times[st]

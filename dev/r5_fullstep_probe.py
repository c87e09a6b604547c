"""Where does the weak-n full step spend time beyond the 'out' profile
prefix?  Measures, at the weak-n per-shard override on a 1-device mesh:
  - per-sweep wall of the REAL jitted step on pass 1 (map cold: fresh
    sweeps, many IEKF iterations, inserts accepted)
  - per-sweep wall on pass 2+ (map warm/converged)
  - the 'out' profile prefix on the converged state (scalar return)
  - single-chip LioEngine cold/warm walls for the same split
Usage: python dev/r5_fullstep_probe.py [n]
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

args = [a for a in sys.argv[1:] if not a.startswith("--")]
n = int(args[0]) if args else 8

import jax
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(ROOT, "scripts"))
import scaling_bench as sb
from sr_livo_tpu.models.odometry import LioEngine
from sr_livo_tpu.parallel import mesh as mesh_mod
from sr_livo_tpu.parallel.sharded_lio import ShardedLioEngine, compute_budgets
from sr_livo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def passes(eng, sweeps, n_pass=4):
    """Per-sweep wall per pass (pass 1 = cold map)."""
    state, vmap_ = eng.init_state(), eng.make_map()
    walls = []
    fid = 1
    for p in range(n_pass):
        t0 = time.perf_counter()
        for s in sweeps:
            out = eng.step(state, vmap_, s, fid)
            state, vmap_ = out.state, out.voxel_map
            fid += 1
        jax.block_until_ready(state.p)
        walls.append((time.perf_counter() - t0) / len(sweeps))
    return walls, state, vmap_


# single chip
cfg1 = sb.base_cfg()
sweeps1 = sb.build_sweeps(cfg1)
eng1 = LioEngine(cfg1)
w1, _, _ = passes(eng1, sweeps1)
# drop pass-1 (compile included); re-run pass1-equivalent with warm jit
w1b, _, _ = passes(eng1, sweeps1)
print(f"single-chip per-sweep ms by pass (jit-warm): "
      f"{[f'{x*1e3:.1f}' for x in w1b]}")

# weak-n per-shard
cfgw = sb.base_cfg(scale=n)
b = compute_budgets(cfgw, n)
ov = dict(b)
for k in ("B2", "B3", "B4", "B5", "B6"):
    ov[k] = b[k] * n
sweepsw = sb.build_sweeps(cfgw, tile=n)
mesh1 = mesh_mod.make_mesh(1)
engw = ShardedLioEngine(cfgw, mesh1, budget_override=ov)
ww, state, vmap_ = passes(engw, sweepsw)
wwb, state, vmap_ = passes(engw, sweepsw)
print(f"weak n={n} per-shard ms by pass (jit-warm):  "
      f"{[f'{x*1e3:.1f}' for x in wwb]}")

# 'out' profile prefix on the converged state
sweep = sweepsw[-1]
f = engw.make_profile_step("out")
r = f(state, vmap_, sweep)
jax.block_until_ready(r)
best = np.inf
for _ in range(8):
    t0 = time.perf_counter()
    r = f(state, vmap_, sweep)
    jax.block_until_ready(r)
    best = min(best, time.perf_counter() - t0)
print(f"weak n={n} 'out' prefix (converged, scalar return): "
      f"{best*1e3:.2f} ms")

# the real steady step, single converged sweep, no donation reuse issue
sfn = engw._steps["steady"]
out = sfn(state, vmap_, sweep)
jax.block_until_ready(out.state.p)
state2, vmap2 = out.state, out.voxel_map
best = np.inf
for _ in range(8):
    t0 = time.perf_counter()
    out = sfn(state2, vmap2, sweep)
    jax.block_until_ready(out.state.p)
    state2, vmap2 = out.state, out.voxel_map
    best = min(best, time.perf_counter() - t0)
print(f"weak n={n} REAL step (converged, full SweepOutput): "
      f"{best*1e3:.2f} ms")

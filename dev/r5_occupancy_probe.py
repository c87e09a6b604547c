"""Per-shard table occupancy of the weak-n run: is the 2x halo headroom
actually needed, or can local_capacity drop a power-of-two step?
Usage: python dev/r5_occupancy_probe.py [n]
"""
import os
import sys

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
from sr_livo_tpu.ops import voxel_map as vm
from sr_livo_tpu.parallel import mesh as mesh_mod
from sr_livo_tpu.parallel.sharded_lio import ShardedLioEngine, compute_budgets
from sr_livo_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

# real n-shard run on the virtual mesh (not the 1-device override) so
# the per-shard tables see the true owned+halo population
cfgw = sb.base_cfg(scale=n)
sweepsw = sb.build_sweeps(cfgw, tile=n)
mesh = mesh_mod.make_mesh(n)
engw = ShardedLioEngine(cfgw, mesh)
state, vmap_ = engw.init_state(), engw.make_map()
fid = 1
for p in range(2):
    for s in sweepsw:
        out = engw.step(state, vmap_, s, fid)
        state, vmap_ = out.state, out.voxel_map
        fid += 1
jax.block_until_ready(state.p)
ovf = int(np.asarray(out.route_overflow))
keys = np.asarray(vmap_.keys[:, 0]).reshape(n, -1)
occ = (keys != vm.EMPTY).sum(axis=1)
cap = keys.shape[1]
print(f"weak n={n}: local_capacity={cap}, route_overflow={ovf}")
print(f"per-shard occupancy: {occ.tolist()}")
print(f"max load factor: {occ.max()/cap:.3f}  "
      f"(halved-table LF would be {2*occ.max()/cap:.3f})")

# single-chip comparison at the same global workload
cfg8 = sb.base_cfg(scale=n)
eng1 = LioEngine(cfg8)
s1, m1 = eng1.init_state(), eng1.make_map()
fid = 1
for p in range(2):
    for s in sweepsw:
        o = eng1.step(s1, m1, s, fid)
        s1, m1 = o.state, o.voxel_map
        fid += 1
jax.block_until_ready(s1.p)
k1 = np.asarray(m1.keys[:, 0])
occ1 = int((k1 != vm.EMPTY).sum())
print(f"single-chip scale={n}: capacity={k1.shape[0]}, occupancy={occ1}, "
      f"LF={occ1/k1.shape[0]:.3f}")
print(f"halo duplication realized: {occ.sum()/occ1:.3f}")

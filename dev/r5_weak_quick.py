"""Quick weak-scaling check: t_single(scale1) and full-step weak per-shard at n."""
import os, sys, time
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.path.join(ROOT, "scripts"))
import scaling_bench as sb
from sr_livo_tpu.models.odometry import LioEngine
from sr_livo_tpu.parallel import mesh as mesh_mod
from sr_livo_tpu.parallel.sharded_lio import ShardedLioEngine, compute_budgets
from sr_livo_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
cfg1 = sb.base_cfg()
sweeps1 = sb.build_sweeps(cfg1)
t_single = sb.time_engine(lambda: LioEngine(cfg1), sweeps1)
print(f"single-chip: {t_single*1e3:.2f} ms")
mesh1 = mesh_mod.make_mesh(1)
for n in (2, 8):
    cfgw = sb.base_cfg(scale=n)
    b = compute_budgets(cfgw, n); ov = dict(b)
    for k in ("B2","B3","B4","B5","B6"): ov[k] = b[k]*n
    sweepsw = sb.build_sweeps(cfgw, tile=n)
    t = sb.time_engine(lambda: ShardedLioEngine(cfgw, mesh1, budget_override=ov), sweepsw)
    comm = sb.comm_model(b, n)
    print(f"weak n={n}: pershard {t*1e3:.2f} ms, comm {comm*1e3:.3f} ms, eff {t_single/(t+comm):.3f}")

"""Sweep the IEKF query budget (K4) at the saturating weak-scaling point
(8x per-chip workload, n=8) to pick shard_query_slack: the one budget
that multiplies real per-iteration compute.  Run ALONE on the box — the
2-core CPU timing is contention-sensitive.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.join(ROOT, "scripts"))
from scaling_bench import base_cfg, build_sweeps, pershard_budgets  # noqa
from scaling_bench import comm_model, time_engine  # noqa


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu"
    from sr_livo_tpu.models.odometry import LioEngine
    from sr_livo_tpu.parallel import mesh as mesh_mod
    from sr_livo_tpu.parallel.sharded_lio import ShardedLioEngine

    mesh1 = mesh_mod.make_mesh(1)
    cfg8 = base_cfg(scale=8)
    sweeps8 = build_sweeps(cfg8, tile=8)
    t_single8 = time_engine(lambda: LioEngine(cfg8), sweeps8)
    print(f"single-chip 8x: {t_single8*1e3:.1f} ms", file=sys.stderr)

    cfg64 = base_cfg(scale=64)
    sweeps64 = build_sweeps(cfg64, n=4, tile=64)
    Q_ideal = cfg64.shapes.max_keypoints // 8
    for qs in (2.0, 1.5, 1.25, 1.0):
        b = pershard_budgets(cfg64, 8)
        b["K4"] = min(cfg64.shapes.max_keypoints,
                      int(np.ceil(Q_ideal * qs / 8) * 8) + 32)
        ov = dict(b)
        for k in ("B2", "B3", "B4", "B5", "B6"):
            ov[k] = b[k] * 8
        t = time_engine(lambda ov=ov: ShardedLioEngine(
            cfg64, mesh1, budget_override=ov), sweeps64, repeats=2)
        comm = comm_model(b, 8)
        eff = t_single8 / (t + comm)
        print(f"qslack={qs:4.2f}  K4={b['K4']:6d}  per-shard "
              f"{t*1e3:7.1f} ms  eff={eff:.3f}")


if __name__ == "__main__":
    main()

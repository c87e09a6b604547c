"""Per-stage cost breakdown of the weak-scaling per-shard program.

VERDICT r3 weak #1: the weak n=8 per-shard program costs ~113 ms where
ideal is ~46 ms.  This script attributes the gap by ABLATION: it re-times
the exact per-shard program (budget_override on a 1-device mesh, as
scripts/scaling_bench.py does) with individual stage budgets collapsed to
near-zero.  The delta vs baseline = that stage-chain's cost.  Correctness
of ablated runs is irrelevant (overflow counters absorb the drops); to
keep the data-dependent IEKF iteration count fixed across variants, the
convergence thresholds are set huge so every variant runs exactly one
IEKF iteration (a separate run with real thresholds reports the
full-iteration baseline).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(ROOT, "scripts"))
from scaling_bench import base_cfg, build_sweeps, pershard_budgets  # noqa: E402


def time_engine(make_engine, sweeps, repeats=3):
    import jax
    eng = make_engine()
    state, vmap_ = eng.init_state(), eng.make_map()
    for fid, s in enumerate(sweeps, start=1):
        out = eng.step(state, vmap_, s, fid)
        state, vmap_ = out.state, out.voxel_map
    jax.block_until_ready(state.p)
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        st, vm_ = state, vmap_
        for fid, s in enumerate(sweeps, start=1):
            out = eng.step(st, vm_, s, fid + len(sweeps))
            st, vm_ = out.state, out.voxel_map
        jax.block_until_ready(st.p)
        best = min(best, (time.perf_counter() - t0) / len(sweeps))
        state, vmap_ = st, vm_
    return best


def main():
    import jax
    # the container sitecustomize force-registers the axon TPU platform;
    # env vars alone are not enough (tests/conftest.py note)
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu"
    from sr_livo_tpu.models.odometry import LioEngine
    from sr_livo_tpu.parallel import mesh as mesh_mod
    from sr_livo_tpu.parallel.sharded_lio import ShardedLioEngine

    n = 8
    cfgw = base_cfg(scale=n)
    sweeps_w = build_sweeps(cfgw, tile=n)
    mesh1 = mesh_mod.make_mesh(1)

    bw = pershard_budgets(cfgw, n)
    ovw = dict(bw)
    for k in ("B2", "B3", "B4", "B5", "B6"):
        ovw[k] = bw[k] * n
    print("budgets:", {k: v for k, v in ovw.items()}, file=sys.stderr)

    def cfg_fast_conv():
        c = base_cfg(scale=n)
        c.icp.threshold_translation_norm = 1e9
        c.icp.threshold_orientation_norm = 1e9
        return c

    results = {}

    # full baseline with real convergence (the SCALING number)
    t = time_engine(lambda: ShardedLioEngine(cfgw, mesh1, budget_override=ovw),
                    sweeps_w)
    results["baseline_real_conv"] = t
    print(f"baseline (real conv): {t*1e3:.2f} ms", file=sys.stderr)

    # one-iteration baseline — all ablations compare to this
    c1 = cfg_fast_conv()
    t1 = time_engine(lambda: ShardedLioEngine(c1, mesh1, budget_override=ovw),
                     sweeps_w)
    results["baseline_1iter"] = t1
    print(f"baseline (1 iter):   {t1*1e3:.2f} ms", file=sys.stderr)

    # single-chip reference points
    cfg1 = base_cfg(scale=1)
    t_single = time_engine(lambda: LioEngine(cfg1), build_sweeps(cfg1))
    results["single_chip_1x"] = t_single
    print(f"single-chip 1x (real conv): {t_single*1e3:.2f} ms",
          file=sys.stderr)
    cfg1f = base_cfg(scale=1)
    cfg1f.icp.threshold_translation_norm = 1e9
    cfg1f.icp.threshold_orientation_norm = 1e9
    t_single1 = time_engine(lambda: LioEngine(cfg1f), build_sweeps(cfg1f))
    results["single_chip_1x_1iter"] = t_single1
    print(f"single-chip 1x (1 iter):    {t_single1*1e3:.2f} ms",
          file=sys.stderr)

    ablations = {
        # IEKF query count -> what K4 inflation costs
        "K4_to_1024": {"K4": 1024},
        # insert machinery (vm.insert candidate batch)
        "Wins_to_256": {"W_ins": 256},
        # insert routing chain (repeat x8, pack, exchange, argsort)
        "B5_to_8": {"B5": 8},
        # keypoint dedup chain
        "B3_to_8": {"B3": 8},
        # frame dedup chain (kills downstream too - bounds, not exact)
        "B2_to_8": {"B2": 8},
        # de-skew slice length
        "Ns_to_1024": {"Ns": 1024},
        # frame segment size (kNN-insert transform + scatter legs)
        "Fseg_to_256": {"F_seg": 256},
        "Kseg_to_64": {"K_seg": 64},
    }
    for name, patch in ablations.items():
        ov = dict(ovw)
        ov.update(patch)
        cfa = cfg_fast_conv()
        t = time_engine(
            lambda cfa=cfa, ov=ov: ShardedLioEngine(cfa, mesh1,
                                                    budget_override=ov),
            sweeps_w)
        results[name] = t
        print(f"{name:16s}: {t*1e3:7.2f} ms   (delta vs 1iter "
              f"{(t1-t)*1e3:+7.2f} ms)", file=sys.stderr)

    print("\n=== summary (ms) ===")
    for k, v in results.items():
        print(f"{k:24s} {v*1e3:8.2f}")


if __name__ == "__main__":
    main()

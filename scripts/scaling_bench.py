"""Sharded-engine scaling measurement (VERDICT r2 next-step #1).

The round-3 engine shards the whole sweep front half (de-skew, both
voxel subsamples, insert) and owner-routes kNN to block-local tables,
so the only replicated compute left is the IMU scan and the 17x17
solves.  Multi-chip hardware is not available here; this script builds
the scaling story from three DIRECT measurements plus an analytic
collective model, instead of round-2's emulation-dominated fit:

  1. `t_single`   — the single-chip LioEngine step (the baseline).
  2. `t_pershard(n)` — the EXACT per-shard program of an n-shard run,
     executed on a 1-device mesh via ShardedLioEngine(budget_override):
     all static shapes (slice, exchange buffers, local kNN set, insert
     batch) are forced to their n-shard values, and every collective
     degenerates to identity on the 1-device mesh.  What remains is
     precisely the compute one real chip would run.
  3. `t_replicated` — a standalone jit of the replicated remainder
     (predict_sweep IMU scan + the per-iteration 17x17 gain solves).

  Collective cost is modeled from exact byte counts of the engine's
  buffers: bytes/ICI_BW + n_collectives * latency (45 GB/s, 5 us —
  conservative v5e numbers), reported separately so the reader can
  re-scale.  The raw n-virtual-device wall times are also reported
  (they serialize all shards onto 2 physical cores and collective
  EMULATION dominates — a floor, not an estimate; see round-2 note).

Outputs SCALING_r05.json:
  * strong scaling: efficiency_strong_n = t_single /
      (n * (t_pershard(n) + comm(n)))  — same workload split n ways.
  * weak scaling:   efficiency_weak_n = t_single /
      (t_pershard_weak(n) + comm_weak(n)) — n x workload (n x sweep
      points, frame budget, keypoints, map) on n chips; the natural
      deployment regime for a map-sharding design (BASELINE configs
      4-5: bigger maps/denser sweeps per added chip).
  * replicated_fraction = t_replicated / t_single (target < 0.10).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

ICI_BW = 45e9          # bytes/s per direction, TPU v5e ICI
COLL_LAT = 5e-6        # per-collective launch latency, seconds


def base_cfg(scale: int = 1):
    from sr_livo_tpu.config import LivoConfig
    cfg = LivoConfig()
    cfg.odometry_options.voxel_size = 0.2
    cfg.odometry_options.init_voxel_size = 0.2
    cfg.odometry_options.sample_voxel_size = 0.8
    cfg.odometry_options.init_sample_voxel_size = 0.8
    cfg.odometry_options.min_distance_points = 0.05
    cfg.icp.size_voxel_map = 0.6
    cfg.icp.min_number_neighbors = 12
    # the residual budget must scale with the workload too, or the IEKF's
    # actual work is pinned at 600 rows regardless of scale
    cfg.icp.max_num_residuals = 600 * scale
    cfg.shapes.max_sweep_points = 8192 * scale
    cfg.shapes.max_frame_points = 4096 * scale
    cfg.shapes.max_keypoints = 1024 * scale
    cfg.shapes.max_imu_samples = 48
    cfg.shapes.map_capacity = (1 << 16) * scale
    cfg.shapes.max_insert_points = 2048 * scale
    return cfg


def build_sweeps(cfg, n=8, tile: int = 1):
    """Padded SweepInputs from the synthetic world; `tile` replicates the
    point payload at disjoint spatial EXTENTS (64 m grid offsets) to fill
    weak-scaling (n x) sweep budgets.

    Extent-tiling, not density-tiling: jittered same-extent copies
    saturate at the world's surface-voxel count, so the subsample caps
    bind and the "n x workload" stops creating n x keypoints/map voxels
    (discovered when chunked association collapsed the padded-tail cost:
    a density-tiled 8x baseline had ~1x actual work).  Disjoint extents
    give genuinely n x voxels, keypoints, inserts, and map occupancy —
    the BASELINE configs 4-5 regime map sharding exists for — and
    spread the block-ownership load the way a larger mapped area does."""
    import jax.numpy as jnp
    from sr_livo_tpu.models.odometry import SweepInput
    from sr_livo_tpu.runtime import measurements as meas_mod
    from sr_livo_tpu.runtime import synthetic
    sim = synthetic.simulate(duration=6.0, n_azimuth=160, n_rings=16, seed=4)
    cutter = meas_mod.SweepCutter(0.1)
    for (t, a, g) in sim.imu:
        cutter.push_imu(t, a, g)
    for c in sim.lidar_chunks:
        cutter.push_points(c)
    for (t, img) in sim.images:
        cutter.push_image(t, img)
    preps = []
    current = None
    while len(preps) < n:
        m = cutter.get()
        if m is None:
            break
        if current is None:
            current = m.time_sweep_begin
        prep = meas_mod.prepare_sweep(m, current, cfg)
        current = prep.new_current_time
        preps.append(prep)
    out = []
    N = cfg.shapes.max_sweep_points
    for fid, prep in enumerate(preps, start=1):
        # tile from the VALID payload only (prep.raw_pts is already
        # padded to N, so tiling the padded array was a no-op — the
        # round-3 "n x workload" never actually scaled; see docstring)
        nv = prep.n_points
        pts, trel, val = (prep.raw_pts[:nv], prep.t_rel[:nv],
                          prep.pt_valid[:nv])
        if pts.shape[0] != N:
            reps = int(np.ceil(N / pts.shape[0]))
            pcs = [pts]
            for r in range(1, reps):
                off = np.array([(r % 8) * 64.0, ((r // 8) % 8) * 64.0,
                                (r // 64) * 64.0], np.float32)
                pcs.append(pts + off)
            pts = np.concatenate(pcs)[:N]
            trel = np.concatenate([trel] * reps)[:N]
            val = np.concatenate([val] * reps)[:N]
        out.append(SweepInput(
            raw_pts=jnp.asarray(pts, jnp.float32),
            t_rel=jnp.asarray(trel, jnp.float32),
            pt_valid=jnp.asarray(val),
            imu_t=jnp.asarray(prep.imu_t), imu_dt=jnp.asarray(prep.imu_dt),
            imu_acc=jnp.asarray(prep.imu_acc),
            imu_gyr=jnp.asarray(prep.imu_gyr),
            imu_valid=jnp.asarray(prep.imu_valid),
            do_optimize=jnp.asarray(fid > 1),
            threshold_capacity=jnp.int32(1)))
    return out


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


def pershard_budgets(cfg, n):
    """Budgets an n-shard engine computes."""
    from sr_livo_tpu.parallel.sharded_lio import compute_budgets
    return compute_budgets(cfg, n)


def comm_model(b, n, iters=6, cap=False):
    """Per-sweep collective cost from exact buffer sizes.

    Round-4 collective inventory: 5 all_to_alls (validity packed into
    the row matrices; the 5th is the owner-insert ACCEPTED-replay leg),
    2 rank-histogram psums (N_tot + F floats, replacing round-3's
    scalar all_gathers AND its per-iteration rank/good all_gather), one
    packed psum per IEKF iteration (+1 (Q,) good-flag histogram psum
    per iteration when the residual cap is on), one (F,) insert-gate
    histogram psum when max_insert_points caps globally, and ONE fused
    output psum."""
    a2a_bytes = n * (b["B2"] * 24 + b["B3"] * 24 + b["B4"] * 20
                     + b["B5"] * 20 + b["B6"] * 20)
    N_tot = b["Ns"] * n
    ag_bytes = (N_tot + b["F_seg"] * n) * 4 * 2 \
        + (b["K4"] * 4 * 2 * iters if cap else 0)
    psum_bytes = iters * 43 * 4 * 2
    out_bytes = 0  # output psum overlaps next-frame host work
    n_coll = 5 + 2 + 1 + iters * (2 if cap else 1)
    return (a2a_bytes + ag_bytes + psum_bytes + out_bytes) / ICI_BW \
        + n_coll * COLL_LAT


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="run the per-shard proxy programs on the real "
                         "TPU chip (skips the virtual-device walls; "
                         "writes SCALING_r05_tpu.json).  The CPU fit "
                         "over-weights sort/gather stages relative to "
                         "the target hardware; this mode measures the "
                         "actual per-shard compute the projection needs.")
    args = ap.parse_args()
    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    from sr_livo_tpu.config import LivoConfig
    from sr_livo_tpu.models.odometry import LioEngine
    from sr_livo_tpu.parallel import mesh as mesh_mod
    from sr_livo_tpu.parallel.sharded_lio import ShardedLioEngine

    cfg = base_cfg()
    sweeps = build_sweeps(cfg)

    # 1+2+4. single-chip baseline, strong per-shard proxies, and weak
    # per-shard proxies measured ROUND-ROBIN (3 passes, per-config
    # min): this 2-core host drifts 20-30% minute-to-minute, and
    # sequential measurement (round 4/5a) let that drift masquerade as
    # scaling structure (e.g. a strong n=2 per-shard 'slower' than
    # n=1).  Interleaving puts every config through the same weather.
    mesh1 = mesh_mod.make_mesh(1)
    runs = {"single": (lambda: LioEngine(cfg), sweeps)}
    for n in (1, 2, 4, 8):
        b = pershard_budgets(cfg, n)
        ov = dict(b)
        # received-buffer sizes on the 1-device mesh are 1*B; force them
        # to the n-shard received size n*B
        for k in ("B2", "B3", "B4", "B5", "B6"):
            ov[k] = b[k] * n
        runs[f"strong{n}"] = (
            lambda ov=ov: ShardedLioEngine(cfg, mesh1, budget_override=ov),
            sweeps)
    for n in (2, 4, 8):
        cfgw = base_cfg(scale=n)
        bw = pershard_budgets(cfgw, n)
        ovw = dict(bw)
        for k in ("B2", "B3", "B4", "B5", "B6"):
            ovw[k] = bw[k] * n
        runs[f"weak{n}"] = (
            lambda ovw=ovw, cfgw=cfgw: ShardedLioEngine(
                cfgw, mesh1, budget_override=ovw),
            build_sweeps(cfgw, tile=n))

    import jax as _jax
    live = {}
    for name, (mk, sw) in runs.items():
        eng = mk()
        st, vmp = eng.init_state(), eng.make_map()
        for fid, s_ in enumerate(sw, start=1):
            o = eng.step(st, vmp, s_, fid)
            st, vmp = o.state, o.voxel_map
        _jax.block_until_ready(st.p)
        live[name] = [eng, st, vmp, sw]
    best = {name: np.inf for name in runs}
    for _pass in range(3):
        for name, slot in live.items():
            eng, st, vmp, sw = slot
            t0 = time.perf_counter()
            for fid, s_ in enumerate(sw, start=1):
                o = eng.step(st, vmp, s_, fid + len(sw))
                st, vmp = o.state, o.voxel_map
            _jax.block_until_ready(st.p)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / len(sw))
            slot[1], slot[2] = st, vmp
    del live
    t_single = best["single"]
    t_pershard = {n: best[f"strong{n}"] for n in (1, 2, 4, 8)}
    t_weak = {n: best[f"weak{n}"] for n in (2, 4, 8)}
    print(f"[scaling] round-robin minima: single {t_single*1e3:.2f} ms; "
          + "; ".join(f"strong{n} {t_pershard[n]*1e3:.2f}" for n in t_pershard)
          + "; " + "; ".join(f"weak{n} {t_weak[n]*1e3:.2f}" for n in t_weak),
          file=sys.stderr)

    # 3. replicated remainder: IMU scan + 17x17 solve loop
    import jax.numpy as jnp
    from sr_livo_tpu.models import eskf as eskf_mod
    eng1 = LioEngine(cfg)
    s0 = eng1.init_state()
    sw = sweeps[0]

    @jax.jit
    def repl_only(state, sweep):
        st, scan = eskf_mod.predict_sweep(
            state, eng1.noise, sweep.imu_t, sweep.imu_dt, sweep.imu_acc,
            sweep.imu_gyr, sweep.imu_valid)
        hth = jnp.eye(6) * 10.0
        hth_h = jnp.ones(6)

        def body(i, carry):
            cov, acc = carry
            temp = jnp.linalg.inv(cov / 0.001)
            temp = temp.at[0:6, 0:6].add(hth)
            temp_inv = jnp.linalg.inv(temp)
            k_h = temp_inv[:, 0:6] @ hth_h
            return cov + 1e-9 * jnp.outer(k_h, k_h), acc + k_h[0]

        cov, acc = jax.lax.fori_loop(0, 6, body, (st.cov, 0.0))
        return st.p + acc, cov

    repl_only(s0, sw)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(20):
        out = repl_only(s0, sw)
    jax.block_until_ready(out)
    t_repl = (time.perf_counter() - t0) / 20


    # 5. raw virtual-device walls (honest floor, round-2 style;
    #    CPU-only — the TPU has one physical chip) + the REAL-mesh
    #    route_overflow check: the 1-device per-shard proxies above
    #    report nonzero overflow because their local slice skips the
    #    hash-range spreading (a proxy artifact); only the real n-shard
    #    mesh's counter is meaningful, and it must be zero for the
    #    budgets to be honest.
    t_virtual = {}
    overflow_real_mesh = None
    if not args.tpu:
        for n in (1, 2, 8):
            t_virtual[n] = time_engine(
                lambda n=n: ShardedLioEngine(cfg, mesh_mod.make_mesh(n)),
                sweeps, repeats=2)
            print(f"[scaling] virtual {n}-device wall: "
                  f"{t_virtual[n]*1e3:.2f} ms", file=sys.stderr)
        engv = ShardedLioEngine(base_cfg(scale=8), mesh_mod.make_mesh(8))
        stv, vmv = engv.init_state(), engv.make_map()
        sw8 = build_sweeps(base_cfg(scale=8), tile=8)
        overflow_real_mesh = []
        for fid, s in enumerate(sw8, start=1):
            o = engv.step(stv, vmv, s, fid)
            stv, vmv = o.state, o.voxel_map
            overflow_real_mesh.append(int(o.route_overflow))
        print(f"[scaling] real-mesh (8-dev) weak-8 route_overflow/sweep: "
              f"{overflow_real_mesh}", file=sys.stderr)

    # 3b. per-stage per-shard timings (VERDICT r4 #2/#6 'where each ms
    #     went'): prefix programs of the weak-8 and strong-8 per-shard
    #     steps via ShardedLioEngine.make_profile_step (stage diffs of
    #     jit'd prefixes — no jit boundaries inside the real program).
    def stage_profile(cfgp, ov, sweeps_p):
        import jax
        eng = ShardedLioEngine(cfgp, mesh1, budget_override=ov)
        st, vmp = eng.init_state(), eng.make_map()
        for fid, sw_ in enumerate(sweeps_p, start=1):
            o = eng.step(st, vmp, sw_, fid)
            st, vmp = o.state, o.voxel_map
        jax.block_until_ready(st.p)
        stages = ["deskew", "frame_sub", "kp_sub", "route_q", "iekf",
                  "ins_route", "ins_gate", "insert", "rep_pack",
                  "rep_sort", "replay", "out"]
        sw_ = sweeps_p[-1]
        times, prev = {}, 0.0
        for stg in stages:
            f = eng.make_profile_step(stg)
            jax.block_until_ready(f(st, vmp, sw_))
            best = np.inf
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(f(st, vmp, sw_))
                best = min(best, time.perf_counter() - t0)
            times[stg] = round((best - prev) * 1e3, 2)
            prev = best
        times["prefix_total_ms"] = round(prev * 1e3, 2)
        return times

    cfg_w8 = base_cfg(scale=8)
    bw8 = pershard_budgets(cfg_w8, 8)
    ovw8 = dict(bw8)
    for k in ("B2", "B3", "B4", "B5", "B6"):
        ovw8[k] = bw8[k] * 8
    stage_weak8 = stage_profile(cfg_w8, ovw8, build_sweeps(cfg_w8, tile=8))
    b_s8 = pershard_budgets(cfg, 8)
    ov_s8 = dict(b_s8)
    for k in ("B2", "B3", "B4", "B5", "B6"):
        ov_s8[k] = b_s8[k] * 8
    stage_strong8 = stage_profile(cfg, ov_s8, sweeps)
    print(f"[scaling] weak-8 stage profile: {stage_weak8}", file=sys.stderr)
    print(f"[scaling] strong-8 stage profile: {stage_strong8}",
          file=sys.stderr)

    # 4b. SATURATING weak point: per-chip workload large enough that
    #     the step is compute-bound rather than dispatch/latency-bound
    #     (8x base per chip; global workload = 64x at n=8)
    cfg8 = base_cfg(scale=8)
    sweeps8 = build_sweeps(cfg8, tile=8)
    t_single8 = time_engine(lambda: LioEngine(cfg8), sweeps8)
    print(f"[scaling] single-chip at 8x workload: {t_single8*1e3:.2f} ms",
          file=sys.stderr)
    cfg64 = base_cfg(scale=64)
    b64 = pershard_budgets(cfg64, 8)
    ov64 = dict(b64)
    for k in ("B2", "B3", "B4", "B5", "B6"):
        ov64[k] = b64[k] * 8
    sweeps64 = build_sweeps(cfg64, n=4, tile=64)
    t_weak64 = time_engine(
        lambda: ShardedLioEngine(cfg64, mesh1, budget_override=ov64),
        sweeps64, repeats=2)
    print(f"[scaling] weak per-shard (n=8, 64x global = 8x/chip): "
          f"{t_weak64*1e3:.2f} ms", file=sys.stderr)
    comm64 = comm_model(b64, 8)
    eff_weak_sat = t_single8 / (t_weak64 + comm64)

    eff_strong = {}
    for n in (2, 4, 8):
        comm = comm_model(pershard_budgets(cfg, n), n)
        eff_strong[n] = t_single / (n * (t_pershard[n] + comm))
    eff_weak = {}
    for n in (2, 4, 8):
        comm = comm_model(pershard_budgets(base_cfg(scale=n), n), n)
        eff_weak[n] = t_single / (t_weak[n] + comm)

    out = {
        "backend": ("tpu" if args.tpu else "cpu")
                   + " (1-device mesh per-shard programs; "
                     "collectives modeled analytically)",
        "physical_cores": os.cpu_count(),
        "step_ms_single_chip": round(t_single * 1e3, 3),
        "step_ms_pershard": {n: round(t * 1e3, 3)
                             for n, t in t_pershard.items()},
        "step_ms_pershard_weak": {n: round(t * 1e3, 3)
                                  for n, t in t_weak.items()},
        "step_ms_virtual_wall": {n: round(t * 1e3, 3)
                                 for n, t in t_virtual.items()},
        "route_overflow_real_mesh_weak8": overflow_real_mesh,
        "replicated_ms": round(t_repl * 1e3, 3),
        "replicated_fraction": round(t_repl / t_single, 4),
        "comm_model": {"ici_bw_gbs": ICI_BW / 1e9,
                       "latency_per_collective_us": COLL_LAT * 1e6,
                       "comm_ms_strong_8": round(
                           comm_model(pershard_budgets(cfg, 8), 8) * 1e3,
                           3)},
        "efficiency_strong": {n: round(e, 3) for n, e in eff_strong.items()},
        "efficiency_weak": {n: round(e, 3) for n, e in eff_weak.items()},
        "stage_profile_weak8_ms": stage_weak8,
        "stage_profile_strong8_ms": stage_strong8,
        "saturating_weak_8": {
            "per_chip_workload": "8x base (global 64x over 8 chips)",
            "step_ms_single_chip_8x": round(t_single8 * 1e3, 3),
            "step_ms_pershard": round(t_weak64 * 1e3, 3),
            "comm_ms": round(comm64 * 1e3, 3),
            "efficiency": round(eff_weak_sat, 3)},
        "note": "t_pershard(n) is the EXACT per-shard program of an "
                "n-shard run (budget_override on a 1-device mesh, where "
                "collectives are identities) — real compute, no "
                "emulation serialization.  Strong = same workload split "
                "n ways (static-shape slack bounds it); weak = n x "
                "workload (sweep density, frame/keypoint budgets, map "
                "capacity all x n) at constant per-shard budgets — the "
                "deployment regime map sharding exists for.  Virtual "
                "walls serialize all shards onto the 2 physical cores "
                "and are floors, not estimates.",
    }
    fname = "SCALING_r05_tpu.json" if args.tpu else "SCALING_r05.json"
    with open(os.path.join(ROOT, fname), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

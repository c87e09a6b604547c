"""Multi-chip LIO: spatial map blocks sharded across the device mesh.

The distributed dimension the reference lacks (SURVEY §2 checklist).
Round-3 redesign — the round-2 engine replicated the entire sweep front
half on every shard and merged kNN candidates with an
all_gather-everything + replicated top-k; this version shards the O(N)
work and owner-routes the rest:

  * **Front half sharded, SORT-FREE.**  Each shard de-skews an N/n
    index slice of the raw sweep (distortFrameByConstant/Imu are
    per-point — no communication).  The voxel-grid subsamples
    (buildFrame:843-848, optimize.cpp:428-431) run as EXACT
    distributed dedups with no sorting anywhere: local winners
    (bucket_dedup_min claim rounds) are routed to hash-range owners
    (one all_to_all), each owner re-elects winners the same way, and
    one winner-histogram psum + exclusive cumsum reproduces the
    single-chip STREAM-ORDER row ranks bit-for-bit — including the
    max_out truncation and the residual cap's keypoint order
    (optimize.cpp:107).
  * **Block-owner map with voxel halos.**  Voxels are grouped into
    (2^map_block_bits)^3 spatial blocks; a block's owner stores it plus
    every voxel within `map_halo_voxels` of its blocks.  A keypoint
    routed to its center-block owner finds its whole 27/125-voxel kNN
    neighborhood (searchNeighbors, optimize.cpp:365-426) in that
    shard's LOCAL table — no candidate exchange, no merge.
  * **Owner-insert + accepted-replay** (round 4).  Each frame row is
    routed ONCE to its primary owner, which runs the gate, the global
    insert-budget prefix, and the insert; only the ACCEPTED rows are
    replayed to the other corner-block owners, which apply them in
    frame-rank order — reproducing the owner's per-voxel outcome
    bit-for-bit while the heavy probe work runs once per point instead
    of once per storing replica (~2.2x at block_bits=4).
  * **Compute follows actual load, not static budgets.**  The IEKF
    association (models.lio.chunked_assoc) and the insert gate phase
    (ops.voxel_map gate_chunk) process only the valid prefix of their
    padded buffers in dynamic-trip-count chunks, so the spatial
    imbalance slack in K4/W_ins/C_rep costs buffer memory, not
    per-sweep probe work.
  * **Per-iteration collectives: one packed psum.**  Each IEKF
    iteration reduces [H^T H | H^T h | num] as a single 43-float psum;
    the global residual-cap prefix rides one small bool all_gather
    (ranks are gathered once per sweep).  The 17x17 solve is replicated
    (trivial).

Routing buffers are static-shape with `shard_route_slack` headroom;
overflow is dropped deterministically and COUNTED
(SweepOutput.route_overflow — asserted zero in the parity tests).
Halo copies roughly double map storage; `map_size()` counts owned
voxels only and matches the single-chip map exactly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sr_livo_tpu.config import (MOTION_COMP_CONSTANT_VELOCITY,
                                MOTION_COMP_IMU, LivoConfig)
from sr_livo_tpu.models import eskf as eskf_mod
from sr_livo_tpu.models import lio as lio_mod
from sr_livo_tpu.models.eskf import EskfState
from sr_livo_tpu.models.odometry import (SweepInput, SweepOutput,
                                         pack_record)
from sr_livo_tpu.ops import frame as frame_ops
from sr_livo_tpu.ops import neighborhood as nb_ops
from sr_livo_tpu.ops import voxel_map as vm
from sr_livo_tpu.parallel import routing
from sr_livo_tpu.parallel.mesh import MAP_AXIS
from sr_livo_tpu.utils import lie

# Block hash primes (independent of the in-table slot hash so block
# ownership is uncorrelated with slot indices).  HOST int32 scalars —
# see the ops.voxel_map._P1 note on device-scalar multiplies.
_B1 = np.int32(73856093)
_B2 = np.int32(19349669)
_B3 = np.int32(83492791)


def compute_budgets(cfg: LivoConfig, n: int) -> dict:
    """Static routing budgets of an n-shard engine.

    Hash-range stages are Binomially concentrated (uniform 31-bit hash)
    and get ADDITIVE statistical headroom (routing.headroom) — their
    overhead fraction vanishes as per-shard workloads grow.  Block
    stages (query/insert routing) follow spatial density and get
    `shard_route_slack` multiplicative slack instead.  Overflow beyond
    any budget is dropped deterministically and counted
    (SweepOutput.route_overflow)."""
    head, rup = routing.headroom, routing.rup
    sh = cfg.shapes
    slack = float(sh.shard_route_slack)
    N, F, Q = sh.max_sweep_points, sh.max_frame_points, sh.max_keypoints
    Ns = N // n
    dup = 2.5   # halo-corner duplication bound (measured avg distinct
    #             corner owners ~2.2 at block_bits=4, halo=2)
    # per-shard insert work honors the single-chip insert budget
    # semantics (vm.insert budget=max_insert_points caps candidates)
    I = min(F, sh.max_insert_points) if sh.max_insert_points else F
    return dict(
        Ns=Ns,
        B2=min(Ns, head(Ns / n)),                    # frame route / dest
        # segments hold only POST-CAP survivors (ranks are computed
        # before compaction), Binomial(F, 1/n) per hash-range owner
        F_seg=min(F, head(F / n)),                   # frame segment
        B3=min(F, head(F / n / n)),                  # keypoint route / dest
        K_seg=min(Q, head(Q / n)),                   # keypoint segment
        B4=min(Q, rup(Q / n / n * slack + 32)),      # query route / dest
        # K4 sizes the IEKF's per-shard query batch; with chunked
        # association (ShapeOptions.query_chunk) the imbalance slack
        # costs buffer memory, not per-sweep kNN compute.
        K4=min(Q, rup(Q / n * max(float(sh.shard_query_slack), 1.0) + 32)),
        # owner-insert: each frame row routes ONCE to its primary owner.
        # W_ins carries slack for block-density imbalance (measured
        # ~1.33 max/mean on extent workloads), but vm.insert's chunked
        # gate phase (gate_chunk=query_chunk) probes only the valid
        # prefix, so the slack costs buffer memory, not probe work.
        B5=min(F, rup(F / n / n * slack + 32)),      # insert route / dest
        W_ins=min(F, rup(F / n * max(slack / 2.7, 1.0) + 64)),
        # replay leg: EXTRA copies of accepted rows (<= insert budget I)
        # beyond the primary owner — (dup - 1) of the dup-bounded total
        C_rep=min(8 * I, rup((dup - 1.0) * I / n
                             * max(slack / 2.7, 1.0) + 64)),
        B6=min(F, rup((dup - 1.0) * I / n / n * slack + 32)),
        local_capacity=max(2 * sh.map_capacity // n, 1 << 10),
    )


def shard_of(coords: jnp.ndarray, n_shards: int,
             block_bits: int = 4) -> jnp.ndarray:
    """Owning shard of a voxel: hash of its spatial BLOCK coordinate
    (voxel >> block_bits, arithmetic shift = floor division).  All
    voxels of a block share an owner, so a bounded voxel neighborhood
    touches few owners — the locality the kNN/insert routing needs."""
    b = jnp.right_shift(coords, block_bits)
    h = b[..., 0] * _B1 + b[..., 1] * _B2 + b[..., 2] * _B3
    h2 = (h ^ jax.lax.shift_right_logical(h, 16)) * np.int32(0x45D9F3B)
    return jax.lax.shift_right_logical(h2, 8) % np.int32(n_shards)


class ShardedLioEngine:
    """Per-sweep LIO step with sweep + map sharded over `mesh` (1-D)."""

    def __init__(self, cfg: LivoConfig, mesh: Mesh, dtype=jnp.float32,
                 budget_override: dict = None):
        """`budget_override` force-sets any of the static routing budgets
        (Ns, B2, F_seg, B3, K_seg, B4, K4, B5, W_ins, C_rep, B6,
        local_capacity) —
        used by scripts/scaling_bench.py to reproduce the exact n-shard
        per-shard program shapes on a 1-device mesh (collectives become
        identities there), isolating per-shard compute from collective
        emulation."""
        self.cfg = cfg
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        self.dtype = dtype
        sh = cfg.shapes
        n = self.n_shards
        assert sh.map_capacity % n == 0
        assert sh.max_sweep_points % n == 0
        self.block_bits = sh.map_block_bits
        self.halo = sh.map_halo_voxels
        assert (1 << self.block_bits) >= 2 * self.halo + 1, \
            "block side must cover the halo corner rule"
        if cfg.retry_wider_neighborhood:
            skipped = [ph for ph, nb in
                       (("init", 2), ("steady", cfg.icp.voxel_neighborhood))
                       if nb + 1 > self.halo]
            if skipped:
                import warnings
                warnings.warn(
                    "ShardedLioEngine: retry_wider_neighborhood needs "
                    f"map_halo_voxels >= nb+1; phases {skipped} exceed "
                    f"halo={self.halo} and run WITHOUT the retry "
                    "(raise cfg.shapes.map_halo_voxels to enable)")
        budgets = compute_budgets(cfg, n)
        budgets.update(budget_override or {})
        for k, v in budgets.items():
            setattr(self, k, int(v))

        # HOST numpy constants (a closed-over device array forces a
        # pathological D2H constant fetch at lowering time on this TPU
        # backend — see models.odometry.LioEngine.__init__).
        np_dtype = np.dtype(dtype)
        self.noise = eskf_mod.noise_diag_np(
            cfg.imu_options.acc_cov, cfg.imu_options.gyr_cov,
            cfg.imu_options.b_acc_cov, cfg.imu_options.b_gyr_cov, np_dtype)
        self.r_il = np.asarray(cfg.extrinsics.R_imu_lidar(), np_dtype)
        self.t_il = np.asarray(cfg.extrinsics.t_imu_lidar(), np_dtype)
        # the 8 halo corner offsets (+-halo per dim) in voxel units
        h = self.halo
        self.corner_offs = np.array(
            [[sx, sy, sz] for sx in (-h, h) for sy in (-h, h)
             for sz in (-h, h)], np.int32)

        map_spec = vm.VoxelMap(keys=P(MAP_AXIS), sig=P(MAP_AXIS),
                               points=P(MAP_AXIS),
                               counts=P(MAP_AXIS), point_ids=P(MAP_AXIS))
        rep = jax.tree_util.tree_map(lambda _: P(), SweepInput(
            *([0] * len(SweepInput._fields))))
        state_spec = jax.tree_util.tree_map(
            lambda _: P(), eskf_mod.init_state())
        out_spec = SweepOutput(
            state=state_spec, voxel_map=map_spec,
            summary=lio_mod.IekfSummary(P(), P(), P()),
            frame_pts_world=P(), frame_valid=P(), inserted=P(),
            record=P(), route_overflow=P())

        self._steps = {}
        for phase in ("init", "steady", "steady_dense"):
            fn = functools.partial(self._sweep_core, phase=phase)
            sm = shard_map(fn, mesh=mesh,
                           in_specs=(state_spec, map_spec, rep),
                           out_specs=out_spec, check_vma=False)
            self._steps[phase] = jax.jit(sm, donate_argnums=(1,))
        self._map_size = None
        self._compact = None

    def init_state(self) -> EskfState:
        return eskf_mod.init_state(self.cfg.gravity_acc, self.dtype)

    def make_map(self) -> vm.VoxelMap:
        """Sharded map: n_shards independent block-owner sub-tables
        (each 2x the even capacity split — halo headroom), leading dim
        concatenated with one shard per device."""
        sh = self.cfg.shapes
        m = vm.make_map(self.local_capacity * self.n_shards,
                        sh.map_voxel_points, self.dtype)
        shard = NamedSharding(self.mesh, P(MAP_AXIS))
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, shard), m)

    def map_size(self, vmap: vm.VoxelMap) -> jnp.ndarray:
        """Owned-voxel point count (halo copies excluded) — matches the
        single-chip vm.map_size exactly."""
        if self._map_size is None:
            n, bits = self.n_shards, self.block_bits

            def _ms(m):
                me = jax.lax.axis_index(MAP_AXIS)
                owned = (m.keys[:, 0] != vm.EMPTY) & \
                    (shard_of(m.keys, n, bits) == me)
                return jax.lax.psum(
                    jnp.sum(jnp.where(owned, m.counts, 0)), MAP_AXIS)

            map_spec = vm.VoxelMap(keys=P(MAP_AXIS), sig=P(MAP_AXIS),
                                   points=P(MAP_AXIS), counts=P(MAP_AXIS),
                                   point_ids=P(MAP_AXIS))
            self._map_size = jax.jit(shard_map(
                _ms, mesh=self.mesh, in_specs=(map_spec,), out_specs=P(),
                check_vma=False))
        return self._map_size(vmap)

    def compact(self, vmap: vm.VoxelMap, location) -> Tuple[
            vm.VoxelMap, jnp.ndarray]:
        """Slot-reclaiming far-voxel eviction of the SHARDED map
        (lioOptimization.cpp:556-572 erase semantics; the sharded
        counterpart of the single-chip pipeline's compact_map call).

        Ownership is static (a voxel's owner/replica set never changes),
        so each shard compacts its local table independently — no
        routing, no exchange: owned voxels and halo replicas evict by
        the same distance rule against the replicated state position,
        which keeps replica tables consistent with their owners (the
        accepted-replay induction invariant).  Returns (new_map, total
        dropped-in-rehash count psum'd over shards — zero short of
        pathological load factors).

        Drive it every `eviction_every_n_frames` when
        `enable_map_eviction` is set, exactly like the single-chip
        pipeline (pipeline.py) — it is off the per-sweep path."""
        if self._compact is None:
            dist = self.cfg.odometry_options.max_distance
            probe = self.cfg.shapes.map_max_probe

            def _c(m, loc):
                m2, dropped = vm.compact_map_impl(
                    m, loc, distance=dist, max_probe=probe)
                return m2, jax.lax.psum(dropped, MAP_AXIS)

            map_spec = vm.VoxelMap(keys=P(MAP_AXIS), sig=P(MAP_AXIS),
                                   points=P(MAP_AXIS), counts=P(MAP_AXIS),
                                   point_ids=P(MAP_AXIS))
            self._compact = jax.jit(shard_map(
                _c, mesh=self.mesh, in_specs=(map_spec, P()),
                out_specs=(map_spec, P()), check_vma=False),
                donate_argnums=(0,))
        return self._compact(vmap, jnp.asarray(location))

    def make_profile_step(self, stop_after: str, phase: str = "steady"):
        """Prefix program of the per-sweep step that stops after the
        named stage and returns one replicated scalar checksum — used by
        scripts/scaling_bench.py to attribute per-shard cost to stages
        (jit boundaries inside the real program would change what XLA
        can fuse; prefix differencing does not).  `stop_after` is one of
        _PROFILE_STAGES."""
        fn = functools.partial(self._sweep_core, phase=phase,
                               stop_after=stop_after)
        map_spec = vm.VoxelMap(keys=P(MAP_AXIS), sig=P(MAP_AXIS),
                               points=P(MAP_AXIS), counts=P(MAP_AXIS),
                               point_ids=P(MAP_AXIS))
        rep = jax.tree_util.tree_map(lambda _: P(), SweepInput(
            *([0] * len(SweepInput._fields))))
        state_spec = jax.tree_util.tree_map(
            lambda _: P(), eskf_mod.init_state())
        sm = shard_map(fn, mesh=self.mesh,
                       in_specs=(state_spec, map_spec, rep),
                       out_specs=P(), check_vma=False)
        return jax.jit(sm)

    # ------------------------------------------------------------------
    def _sweep_core(self, state: EskfState, local_map: vm.VoxelMap,
                    sweep: SweepInput, *, phase: str,
                    stop_after: str = None) -> SweepOutput:
        cfg = self.cfg
        icp = cfg.icp
        odo = cfg.odometry_options
        sh = cfg.shapes
        n = self.n_shards
        me = jax.lax.axis_index(MAP_AXIS)
        is_init = phase == "init"
        # steady_dense: motion-adaptive keypoint density, same semantics
        # as the single-chip variant (models.odometry._sweep_core)
        sample_voxel = (odo.init_sample_voxel_size if is_init
                        else cfg.dense_sample_voxel_size
                        if phase == "steady_dense"
                        else odo.sample_voxel_size)
        sub_voxel = odo.init_voxel_size if is_init else odo.voxel_size
        nb_voxels = 2 if is_init else icp.voxel_neighborhood
        assert nb_voxels <= self.halo, \
            "map_halo_voxels must cover nb_voxels_visited"
        max_iters = (max(15, icp.num_iters_icp) if is_init
                     else icp.num_iters_icp)
        last_trans = state.p
        I32_MAX = routing.I32_MAX
        overflow = jnp.int32(0)

        # 1. Replicated IMU scan (inherently sequential, ~50 samples —
        #    the ONLY replicated compute besides the 17x17 solves).
        pre = state
        state_pred, scan_states = eskf_mod.predict_sweep(
            state, self.noise, sweep.imu_t, sweep.imu_dt, sweep.imu_acc,
            sweep.imu_gyr, sweep.imu_valid)
        _prepend = lambda x0, xs: jnp.concatenate([x0[None], xs], axis=0)
        imu_states = eskf_mod.ImuStates(
            t=_prepend(jnp.zeros((), sweep.imu_t.dtype), sweep.imu_t),
            un_acc=_prepend(lie.quat_to_rot(pre.q) @ (pre.acc_0 - pre.ba),
                            scan_states.un_acc),
            un_gyr=_prepend(pre.gyr_0 - pre.bg, scan_states.un_gyr),
            p=_prepend(pre.p, scan_states.p),
            q=_prepend(pre.q, scan_states.q),
            v=_prepend(pre.v, scan_states.v),
            valid=_prepend(jnp.asarray(True), scan_states.valid))

        # 2. De-skew on my N/n index slice (per-point, no comm).
        Ns = self.Ns
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, me * Ns, Ns, axis=0)
        raw_s, trel_s, pval_s = (sl(sweep.raw_pts), sl(sweep.t_rel),
                                 sl(sweep.pt_valid))
        gidx_s = me * np.int32(Ns) + jnp.arange(Ns, dtype=jnp.int32)
        # shuffle-equivalent ORDER permutation: winners stay the lowest
        # stream-index point per voxel, but output RANKS follow
        # subsample_perm so the residual cap keeps a spatially random
        # subset — bit-matching frame_ops.voxel_subsample(priority=perm)
        # on the single chip (host int32 constant)
        perm = frame_ops.subsample_perm(sh.max_sweep_points)
        if odo.motion_compensation == MOTION_COMP_IMU:
            imu_pts = frame_ops.undistort_imu(
                raw_s, trel_s, imu_states, self.r_il, self.t_il)
        elif odo.motion_compensation == MOTION_COMP_CONSTANT_VELOCITY:
            imu_pts = frame_ops.undistort_constant(
                raw_s, trel_s, imu_states, self.r_il, self.t_il)
        else:
            imu_pts = lie.quat_rotate(
                jnp.broadcast_to(state_pred.q, (Ns, 4)),
                raw_s @ self.r_il.T + self.t_il) + state_pred.p
        deskew_s = frame_ops.to_end_frame(imu_pts, imu_states,
                                          self.r_il, self.t_il)
        if stop_after == "deskew":
            return jax.lax.psum(jnp.sum(deskew_s), MAP_AXIS)

        # 3. Frame voxel subsample — exact distributed dedup, SORT-FREE
        #    (round-4: the lex_sort_dedup argsort pairs here were the
        #    second-largest per-shard cost after the IEKF; bucket claim
        #    rounds + histogram-psum ranks replace every sort, matching
        #    the single-chip voxel_subsample's stream-order semantics).
        #    (a) local pre-dedup on the slice (winner = min gidx per hash)
        fh_s = jnp.where(pval_s, frame_ops._voxel_key(deskew_s, sub_voxel),
                         I32_MAX)
        win1 = frame_ops.bucket_dedup_min(fh_s, gidx_s, pval_s)
        rows1 = routing.pack_cols(deskew_s, fh_s, gidx_s)
        dest1 = routing.hash_range_owner(fh_s, n)
        #    (b) route winners to their hash-range owner
        buf, bval, d = routing.pack_for_exchange(dest1, win1, rows1, n,
                                                 self.B2)
        overflow += d
        rcv, rval = routing.exchange(buf, bval, MAP_AXIS)
        #    (c) exact dedup within my hash range (winner = min gidx)
        fh_r = jnp.where(rval, routing.unpack_col_i32(rcv, 3), I32_MAX)
        gidx_r = routing.unpack_col_i32(rcv, 4)
        win2 = frame_ops.bucket_dedup_min(fh_r, gidx_r, rval)
        #    (d) exact global STREAM-ORDER ranks BEFORE compaction: ONE
        #    winner-histogram psum over the gidx space + an exclusive
        #    cumsum reproduces the single-chip voxel_subsample row ranks
        #    bit-for-bit.  Ranking first means the segment only has to
        #    hold post-cap survivors — Binomial(F, 1/n) per hash-range
        #    owner — so F_seg carries additive headroom instead of the
        #    round-3 1.5x multiplicative slack (every downstream stage,
        #    including the 8-corner insert leg, shrinks with it).
        N_tot = sh.max_sweep_points
        R = rcv.shape[0]
        perm_j = jnp.asarray(perm)
        pg_r = perm_j[jnp.clip(gidx_r, 0, N_tot - 1)]
        oob_f = N_tot + jnp.arange(R, dtype=jnp.int32)
        flags_f = jnp.zeros((N_tot,), jnp.float32).at[
            jnp.where(win2, pg_r, oob_f)
        ].set(1.0, mode="drop", unique_indices=True)
        flags_f = jax.lax.psum(flags_f, MAP_AXIS)
        pref_f = jnp.cumsum(flags_f) - flags_f
        r_f_rcv = pref_f[pg_r].astype(jnp.int32)
        keep2 = win2 & (r_f_rcv < sh.max_frame_points)    # global max_out
        seg_rows, seg_val, d = routing.compact(rcv, keep2, self.F_seg)
        overflow += d
        frame_pt_s = seg_rows[:, 0:3]
        gidx_seg = routing.unpack_col_i32(seg_rows, 4)
        r_f = jnp.where(
            seg_val,
            pref_f[perm_j[jnp.clip(gidx_seg, 0, N_tot - 1)]]
            .astype(jnp.int32),
            I32_MAX)
        if stop_after == "frame_sub":
            return jax.lax.psum(
                jnp.sum(jnp.where(seg_val[:, None], frame_pt_s, 0.0))
                + jnp.sum(jnp.where(seg_val, r_f, 0)), MAP_AXIS)

        # 4. Keypoint grid sample — same machinery at the sample voxel.
        #    Winner per cell = min frame rank (the single-chip stream-
        #    order rule); rows carry r_f as the explicit priority.
        kp_h = jnp.where(seg_val,
                         frame_ops._voxel_key(frame_pt_s, sample_voxel),
                         I32_MAX)
        rows2 = routing.pack_cols(frame_pt_s, kp_h, r_f)
        dest2 = routing.hash_range_owner(kp_h, n)
        buf, bval, d = routing.pack_for_exchange(dest2, seg_val, rows2, n,
                                                 self.B3)
        overflow += d
        rcv2, rval2 = routing.exchange(buf, bval, MAP_AXIS)
        kph_r = jnp.where(rval2, routing.unpack_col_i32(rcv2, 3), I32_MAX)
        rf_r2 = routing.unpack_col_i32(rcv2, 4)
        win3 = frame_ops.bucket_dedup_min(kph_r, rf_r2, rval2)
        #    keypoint ranks pre-compaction too (K_seg = head(Q/n))
        F_cap = sh.max_frame_points
        R2 = rcv2.shape[0]
        oob_k = F_cap + jnp.arange(R2, dtype=jnp.int32)
        flags_k = jnp.zeros((F_cap,), jnp.float32).at[
            jnp.where(win3, jnp.clip(rf_r2, 0, F_cap - 1), oob_k)
        ].set(1.0, mode="drop", unique_indices=True)
        flags_k = jax.lax.psum(flags_k, MAP_AXIS)
        pref_k = jnp.cumsum(flags_k) - flags_k
        r_k_rcv = pref_k[jnp.clip(rf_r2, 0, F_cap - 1)].astype(jnp.int32)
        keep3 = win3 & (r_k_rcv < sh.max_keypoints)
        kseg_rows, kseg_val, d = routing.compact(rcv2, keep3, self.K_seg)
        overflow += d
        kp_rf = routing.unpack_col_i32(kseg_rows, 4)
        r_k = jnp.where(
            kseg_val,
            pref_k[jnp.clip(kp_rf, 0, F_cap - 1)].astype(jnp.int32),
            I32_MAX)
        key_pt_s = kseg_rows[:, 0:3]      # end-frame LiDAR coords
        if stop_after == "kp_sub":
            return jax.lax.psum(
                jnp.sum(jnp.where(kseg_val[:, None], key_pt_s, 0.0))
                + jnp.sum(jnp.where(kseg_val, r_k, 0)), MAP_AXIS)

        # 5. Route keypoints to their center-block owner (one dest each;
        #    the halo makes the whole neighborhood local there).
        loc_seg = key_pt_s @ self.r_il.T + self.t_il
        world0_seg = lie.quat_rotate(
            jnp.broadcast_to(state_pred.q, (self.K_seg, 4)),
            loc_seg) + state_pred.p
        v0 = vm.voxel_coords(world0_seg, icp.size_voxel_map)
        dest3 = shard_of(v0, n, self.block_bits)
        rows3 = routing.pack_cols(key_pt_s, r_k)
        buf, bval, d = routing.pack_for_exchange(dest3, kseg_val, rows3, n,
                                                 self.B4)
        overflow += d
        rcv3, rval3 = routing.exchange(buf, bval, MAP_AXIS)
        qrows, qval, d = routing.compact(rcv3, rval3, self.K4)
        overflow += d
        key_q = qrows[:, 0:3]
        rank_q = jnp.where(qval, routing.unpack_col_i32(qrows, 3), I32_MAX)
        if stop_after == "route_q":
            return jax.lax.psum(
                jnp.sum(jnp.where(qval[:, None], key_q, 0.0)), MAP_AXIS)

        # 6. Distributed ESIKF: local rows, one packed psum per iteration.
        def _run_iekf(nb):
            return self._iekf(
                state_pred, local_map, key_q, qval, rank_q, last_trans,
                sweep.threshold_capacity, icp=icp, nb_voxels=nb,
                max_iters=max_iters, laser_point_cov=cfg.laser_point_cov,
                max_probe=sh.map_max_probe,
                cache_association=cfg.cache_association)

        state_upd, summary = _run_iekf(nb_voxels)
        if cfg.retry_wider_neighborhood and nb_voxels + 1 <= self.halo:
            # weak-solve retry, same semantics as the single-chip engine
            # (models.odometry._sweep_core); `strong` is a psum-derived
            # replicated scalar, so every shard takes the same branch.
            # Phases whose widened neighborhood exceeds the halo (init
            # with the default halo=2) skip the retry — warned at build.
            strong = summary.success & (
                summary.num_residuals >= icp.min_num_residuals)
            state_upd, summary = jax.lax.cond(
                strong,
                lambda _: (state_upd, summary),
                lambda _: _run_iekf(nb_voxels + 1),
                operand=None)
        state_new = jax.tree_util.tree_map(
            lambda a, b: jnp.where(sweep.do_optimize, a, b),
            state_upd, state_pred)
        success = jnp.where(sweep.do_optimize, summary.success, True)
        if stop_after == "iekf":
            return jax.lax.psum(jnp.sum(state_new.p), MAP_AXIS)

        # 7. OWNER-INSERT + ACCEPTED-REPLAY.  Each frame row routes ONCE
        #    to its primary (center-block) owner, which runs the gate,
        #    the global insert-budget prefix, and the actual insert; the
        #    rows it ACCEPTS are then replayed to the <=7 other
        #    corner-block owners storing the voxel as halo.  Replaying
        #    the accepted subset in frame-rank order reproduces the
        #    owner's per-voxel outcome bit-for-bit: vm.insert's phase-5
        #    positions rank GATE-PASSERS only, accepted rows pass the
        #    same gate against the (identical, by induction) halo
        #    replica table, and block appends land at identical slots.
        #    vs the round-3 route-to-every-storing-shard design this
        #    runs the heavy gate/claim probing once per point instead of
        #    ~1.7x (avg distinct corner owners), and the routed volume
        #    drops from dup*F to F + dup*accepted.
        frame_world_s = frame_ops.transform_to_world(
            frame_pt_s, state_new.q, state_new.p, self.r_il, self.t_il)
        ins_ok = seg_val & success
        vi = vm.voxel_coords(frame_world_s, icp.size_voxel_map)
        dest5 = shard_of(vi, n, self.block_bits)
        rows4 = routing.pack_cols(frame_world_s, r_f)
        buf, bval, d = routing.pack_for_exchange(dest5, ins_ok, rows4, n,
                                                 self.B5)
        overflow += d
        rcv4, rval4 = routing.exchange(buf, bval, MAP_AXIS)
        # deterministic candidate order: received rows go to a dense
        # rank-keyed table (each global frame rank has ONE primary
        # owner), then a stable compact reproduces the single-chip
        # batch order without an argsort.
        F = sh.max_frame_points
        rf_r = routing.unpack_col_i32(rcv4, 3)
        oob4 = F + jnp.arange(rcv4.shape[0], dtype=jnp.int32)
        tgt4 = jnp.where(rval4, jnp.clip(rf_r, 0, F - 1), oob4)
        rank_tbl = jnp.zeros((F, rcv4.shape[1]), rcv4.dtype).at[tgt4].set(
            rcv4, mode="drop", unique_indices=True)
        rank_tvl = jnp.zeros((F,), bool).at[tgt4].set(
            True, mode="drop", unique_indices=True)
        ins_rows, ins_val, d = routing.compact(rank_tbl, rank_tvl,
                                               self.W_ins)
        overflow += d
        ins_rf = routing.unpack_col_i32(ins_rows, 3)
        if stop_after == "ins_route":
            return jax.lax.psum(
                jnp.sum(jnp.where(ins_val[:, None], ins_rows, 0.0))
                + jnp.sum(state_new.p), MAP_AXIS)
        # The gate runs ONCE (with aux) and feeds both the global budget
        # prefix and the insert itself via pre_gate — the probe +
        # K-point block-distance gather is the dominant insert cost, and
        # round 4 ran it twice on this leg.
        pre = vm.insert_gate(
            local_map, ins_rows[:, 0:3], ins_val, icp.size_voxel_map,
            odo.min_distance_points, sh.map_max_probe,
            gate_chunk=sh.query_chunk, with_aux=True)
        gate = pre[0]
        if sh.max_insert_points and sh.max_insert_points < F:
            # Exact global insert-budget semantics (single-chip
            # vm.insert(budget=max_insert_points) keeps the first
            # `budget` gate-passing candidates in frame-rank order):
            # gate verdicts are psum'd into a rank-indexed histogram and
            # the exclusive prefix reproduces the single-chip candidate
            # ordering.  Every candidate is at its primary owner here,
            # so the owner's verdict is THE verdict.
            flag_tgt = jnp.where(gate, jnp.clip(ins_rf, 0, F - 1), F)
            flags = jnp.zeros((F + 1,), jnp.float32).at[flag_tgt].set(
                1.0, mode="drop")
            flags = jax.lax.psum(flags, MAP_AXIS)
            prefix = jnp.cumsum(flags[:F]) - flags[:F]    # exclusive
            ins_val = ins_val & (~gate | (
                prefix[jnp.clip(ins_rf, 0, F - 1)]
                < np.float32(sh.max_insert_points)))
        if stop_after == "ins_gate":
            return jax.lax.psum(
                jnp.sum(ins_val.astype(jnp.float32))
                + jnp.sum(state_new.p), MAP_AXIS)
        local_new, accepted = vm.insert(
            local_map, ins_rows[:, 0:3], ins_val, icp.size_voxel_map,
            odo.min_distance_points, sh.map_max_probe, pre_gate=pre)
        if stop_after == "insert":
            return jax.lax.psum(
                jnp.sum(accepted.astype(jnp.float32))
                + jnp.sum(local_new.counts).astype(jnp.float32), MAP_AXIS)

        # 7b. Replay accepted rows to the other storing shards.  The
        #    corner-owner set of a voxel covers exactly the shards whose
        #    halo-extended blocks contain it (a block side >= 2*halo+1
        #    intersecting the [v-h, v+h] cube contains one of its 8
        #    corners), so routing to corner owners != me reaches every
        #    halo replica and nothing else.
        acc = ins_val & accepted
        vi_a = vm.voxel_coords(ins_rows[:, 0:3], icp.size_voxel_map)
        cv = vi_a[:, None, :] + jnp.asarray(self.corner_offs)[None, :, :]
        owners_a = shard_of(cv, n, self.block_bits)          # (W_ins, 8)
        eq = owners_a[:, :, None] == owners_a[:, None, :]
        dupm = jnp.any(eq & np.tril(np.ones((8, 8), bool), -1)[None],
                       axis=-1)
        rep_ok = acc[:, None] & ~dupm & (owners_a != me)
        # compact the (sparse: ~0.7 per accepted row) valid copies, then
        # pack — same O(m) pre-compaction trick as the query legs
        ok_flat = rep_ok.reshape(-1)
        flat_i = jnp.arange(self.W_ins * 8, dtype=jnp.int32)
        crank = jnp.cumsum(ok_flat.astype(jnp.int32)) - 1
        ok2 = ok_flat & (crank < self.C_rep)
        dsti = jnp.where(ok2, crank, self.C_rep)
        sel_row = jnp.zeros((self.C_rep,), jnp.int32).at[dsti].set(
            flat_i // 8, mode="drop", unique_indices=True)
        sel_dest = jnp.zeros((self.C_rep,), jnp.int32).at[dsti].set(
            owners_a.reshape(-1), mode="drop", unique_indices=True)
        val_c = jnp.zeros((self.C_rep,), bool).at[dsti].set(
            True, mode="drop", unique_indices=True)
        overflow += (jnp.sum(ok_flat) - jnp.sum(ok2)).astype(jnp.int32)
        buf6, bval6, d = routing.pack_for_exchange(
            sel_dest, val_c, ins_rows[sel_row], n, self.B6)
        overflow += d
        if stop_after == "rep_pack":
            return jax.lax.psum(
                jnp.sum(buf6) + jnp.sum(local_new.counts)
                .astype(buf6.dtype), MAP_AXIS)
        rcv6, rval6 = routing.exchange(buf6, bval6, MAP_AXIS)
        # order replay rows by global rank with the same rank-keyed
        # table + stable compact as the primary-insert leg (a shard
        # receives each global frame rank AT MOST once — the sender's
        # distinct-corner-owner dedup guarantees it), replacing the
        # round-4 argsort over the receive buffer (~2.4 ms of the
        # weak-8 per-shard step; XLA CPU sorts are slow and the TPU
        # dislikes them more).  compact keeps the C_rep lowest ranks —
        # the same set the sorted slice kept — and counts the rest.
        rf6 = routing.unpack_col_i32(rcv6, 3)
        oob6 = F + jnp.arange(rcv6.shape[0], dtype=jnp.int32)
        tgt6 = jnp.where(rval6, jnp.clip(rf6, 0, F - 1), oob6)
        tbl6 = jnp.zeros((F, rcv6.shape[1]), rcv6.dtype).at[tgt6].set(
            rcv6, mode="drop", unique_indices=True)
        tvl6 = jnp.zeros((F,), bool).at[tgt6].set(
            True, mode="drop", unique_indices=True)
        rep_rows, rep_val, d = routing.compact(tbl6, tvl6, self.C_rep)
        overflow += d
        if stop_after == "rep_sort":
            return jax.lax.psum(
                jnp.sum(jnp.where(rep_val[:, None], rep_rows, 0.0))
                + jnp.sum(local_new.counts).astype(rep_rows.dtype),
                MAP_AXIS)
        # Replayed rows were ACCEPTED at their primary owner, and the
        # replica's voxel blocks are identical by induction — so the
        # replica's min-distance verdict is already known to be "pass".
        # min_distance=0.0 skips the K-point block-distance gather (the
        # dominant insert cost; round-4 this leg re-ran the full gate
        # and was the single largest per-shard stage, ~18 ms of a 52 ms
        # weak-8 step).  Probe/claim/append still run, landing rows at
        # identical slots.
        local_new, _rep_acc = vm.insert(
            local_new, rep_rows[:, 0:3], rep_val,
            icp.size_voxel_map, 0.0, sh.map_max_probe,
            gate_chunk=sh.query_chunk)
        if stop_after == "replay":
            return jax.lax.psum(
                jnp.sum(local_new.counts).astype(jnp.float32), MAP_AXIS)

        # 8. Re-assemble replicated outputs in the exact single-chip
        #    layout: scatter segments by global rank, then ONE psum for
        #    everything (collective launch latency dominates small
        #    reductions).  Frame validity needs no column of its own:
        #    stage-3 ranks are DENSE (0..n_winners-1 by construction of
        #    the exclusive winner prefix), so valid = rank < n_winners,
        #    and n_winners comes free from the already-psum'd flags_f.
        F = sh.max_frame_points
        n_win = jnp.sum(flags_f).astype(jnp.int32)       # replicated
        tgt = jnp.where(seg_val, r_f, F)
        out_pack = jnp.zeros((F, 4), frame_world_s.dtype)
        out_pack = out_pack.at[tgt, 0:3].set(
            frame_world_s, mode="drop", unique_indices=True)
        acc_tgt = jnp.where(ins_val & accepted, ins_rf, F)
        out_pack = out_pack.at[acc_tgt, 3].set(1.0, mode="drop")
        ovf_row = jnp.zeros((1, 4), out_pack.dtype).at[0, 0].set(
            overflow.astype(out_pack.dtype))
        out_pack = jax.lax.psum(
            jnp.concatenate([out_pack, ovf_row], axis=0), MAP_AXIS)
        frame_world_g = out_pack[:F, 0:3]
        frame_valid_g = jnp.arange(F, dtype=jnp.int32) < n_win
        inserted_g = out_pack[:F, 3] > 0.5
        overflow = out_pack[F, 0].astype(jnp.int32)
        if stop_after == "out":
            return jax.lax.psum(
                jnp.sum(frame_world_g) + jnp.sum(local_new.counts)
                .astype(frame_world_g.dtype) + jnp.sum(state_new.p),
                MAP_AXIS)

        summary = summary._replace(success=success)
        return SweepOutput(state=state_new, voxel_map=local_new,
                           summary=summary,
                           frame_pts_world=frame_world_g,
                           frame_valid=frame_valid_g, inserted=inserted_g,
                           record=pack_record(state_new, summary),
                           route_overflow=overflow)

    # ------------------------------------------------------------------
    def _iekf(self, state, local_map, key_q, qval, rank_q, last_trans,
              threshold_capacity, *, icp, nb_voxels, max_iters,
              laser_point_cov, max_probe, cache_association):
        pred = state
        n = self.n_shards
        loc_q = key_q @ self.r_il.T + self.t_il       # IMU frame
        lam_sum = abs(icp.weight_alpha) + abs(icp.weight_neighborhood)
        lam_w = abs(icp.weight_alpha) / lam_sum
        lam_nb = abs(icp.weight_neighborhood) / lam_sum
        cap = icp.max_num_residuals
        Q_tot = self.cfg.shapes.max_keypoints

        chunk = self.cfg.shapes.query_chunk
        n_q = jnp.sum(qval)         # queries are prefix-compacted

        def _assoc(s):
            world = lie.quat_rotate(
                jnp.broadcast_to(s.q, (loc_q.shape[0], 4)), loc_q) + s.p
            if chunk and chunk < loc_q.shape[0]:
                # compute only the occupied prefix of the K4 budget — the
                # spatial-imbalance slack (shard_query_slack) costs
                # buffer memory, not per-sweep kNN work
                return lio_mod.chunked_assoc(
                    local_map, world, n_q, voxel_size=icp.size_voxel_map,
                    max_neighbors=icp.max_number_neighbors,
                    max_probe=max_probe, nb_voxels=nb_voxels,
                    threshold_capacity=threshold_capacity, chunk=chunk)
            neighbors, nb_ok, _ = vm.knn(
                local_map, world, voxel_size=icp.size_voxel_map,
                max_neighbors=icp.max_number_neighbors,
                max_probe=max_probe, nb_voxels=nb_voxels,
                threshold_capacity=threshold_capacity)
            n_found = jnp.sum(nb_ok, axis=1).astype(jnp.int32)
            normal0, a2d, _ = nb_ops.neighborhood_distribution(
                neighbors, n_found)
            return normal0, a2d, neighbors[:, 0, :], n_found

        if cache_association:
            assoc0 = _assoc(state)

        def blocks(s):
            normal0, a2d, closest, n_found = (
                assoc0 if cache_association else _assoc(s))
            world = lie.quat_rotate(
                jnp.broadcast_to(s.q, (loc_q.shape[0], 4)), loc_q) + s.p
            h_x, h, good = lio_mod._plane_rows_from_assoc(
                normal0, a2d, closest, n_found, world, loc_q,
                lie.quat_to_rot(s.q), last_trans, qval,
                lam_w=lam_w, lam_nb=lam_nb,
                power_planarity=icp.power_planarity,
                max_dist=icp.max_dist_to_plane_icp,
                min_neighbors=icp.min_number_neighbors)
            if cap > 0:
                # exact global keypoint-order prefix (optimize.cpp:107):
                # keypoint ranks are globally unique, so the good flags
                # scatter into ONE (Q_tot,) histogram indexed by rank;
                # one psum + an exclusive cumsum gives each row the
                # number of good rows with lower rank.  O(Q) — the
                # round-3 formulation all_gathered (rank, good) pairs and
                # built a (K4, K4*n) comparison matrix per iteration,
                # the dominant per-shard cost at weak n=8 (ablation-
                # profiled: ~40 ms of a 95 ms step).
                # not-good rows get DISTINCT out-of-bounds targets so the
                # unique_indices contract holds (ops.voxel_map pattern)
                oob = Q_tot + jnp.arange(good.shape[0], dtype=jnp.int32)
                flags = jnp.zeros((Q_tot,), h.dtype).at[
                    jnp.where(good, jnp.clip(rank_q, 0, Q_tot - 1), oob)
                ].set(1.0, mode="drop", unique_indices=True)
                flags = jax.lax.psum(flags, MAP_AXIS)
                prefix_ex = jnp.cumsum(flags) - flags
                prefix = prefix_ex[jnp.clip(rank_q, 0, Q_tot - 1)]
                good = good & (prefix + 1 <= cap)
                h_x = jnp.where(good[:, None], h_x, 0.0)
                h = jnp.where(good, h, 0.0)
            # ONE packed psum: [H^T H (36) | H^T h (6) | num (1)]
            packed = jnp.concatenate([
                (h_x.T @ h_x).ravel(), h_x.T @ h,
                jnp.sum(good).astype(h.dtype)[None]])
            packed = jax.lax.psum(packed, MAP_AXIS)
            return (packed[:36].reshape(6, 6), packed[36:42],
                    packed[42].astype(jnp.int32))

        def body(carry):
            s, it, _conv, _ok, _n, cov_final = carry
            hth, hth_h, num = blocks(s)
            enough = num >= icp.min_number_neighbors

            d_x_cur, d_so3, so3_dg, b_x_pred = \
                lio_mod._error_vs_prediction(s, pred)
            j_old = lio_mod._reset_jacobian(d_so3, so3_dg, b_x_pred)
            d_x_new = j_old @ d_x_cur
            cov = j_old @ state.cov @ j_old.T

            temp = jnp.linalg.inv(cov / laser_point_cov)
            temp = temp.at[0:6, 0:6].add(hth)
            temp_inv = jnp.linalg.inv(temp)
            k_h = temp_inv[:, 0:6] @ hth_h
            k_x = jnp.zeros((17, 17), cov.dtype).at[:, 0:6].set(
                temp_inv[:, 0:6] @ hth)
            d_x = -k_h + (k_x - jnp.eye(17, dtype=cov.dtype)) @ d_x_new

            diverged = (jnp.linalg.norm(d_x[0:3]) > 100.0) | (
                lie.angular_distance_deg(d_x[3:6]) > 100.0)
            apply = enough & ~diverged
            g_before = s.g
            s_new = eskf_mod.observe(s, jnp.where(apply, d_x, 0.0))
            converged = ((jnp.linalg.norm(d_x[0:3])
                          < icp.threshold_translation_norm)
                         & (lie.angular_distance_deg(d_x[3:6])
                            < icp.threshold_orientation_norm) & apply)
            b_x_before = lie.s2_bx(g_before)
            j_new = lio_mod._reset_jacobian(
                d_x[3:6], b_x_before @ d_x[15:17], b_x_before)
            cov_final_new = j_new @ (cov - k_x @ cov) @ j_new.T
            return (s_new, it + 1, converged, enough, num,
                    jnp.where(apply, cov_final_new, cov_final))

        def cond(carry):
            _s, it, conv, ok, _n, _cf = carry
            return (it < max_iters + 1) & ~conv & ok

        init = (state, jnp.int32(0), jnp.asarray(False), jnp.asarray(True),
                jnp.int32(0), state.cov)
        s_out, iters, _conv, ok, n_res, cov_final = jax.lax.while_loop(
            cond, body, init)
        s_out = s_out._replace(cov=jnp.where(ok, cov_final, state.cov))
        s_out = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), s_out, state)
        return s_out, lio_mod.IekfSummary(success=ok, num_residuals=n_res,
                                          iterations=iters)

    def step(self, state, voxel_map, sweep: SweepInput, frame_id: int,
             gyr_rate: float = 0.0):
        if frame_id < self.cfg.odometry_options.init_num_frames:
            phase = "init"
        elif (self.cfg.adaptive_keypoint_density
                and gyr_rate > self.cfg.dense_gyr_threshold):
            phase = "steady_dense"
        else:
            phase = "steady"
        return self._steps[phase](state, voxel_map, sweep)

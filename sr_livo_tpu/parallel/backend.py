"""Mapping backend: keyframes, windowed BA, pose graph, loop closures.

Optional subsystem attached to a LivoPipeline (the reference has no
backend — this is the framework's distributed/consistency dimension from
BASELINE.json).  The frontend stays untouched: the backend snapshots
keyframes (pose + subsampled scan) at a fixed spacing, periodically
refines the recent window with windowed BA, accumulates odometry edges
in a pose graph, and folds in verified loop closures.  `optimized_
trajectory()` returns the loop-consistent path alongside the frontend's
odometry.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sr_livo_tpu.parallel import ba as ba_mod
from sr_livo_tpu.parallel import loop_closure as lc
from sr_livo_tpu.parallel import pose_graph as pg
from sr_livo_tpu.utils import lie


@dataclass
class Keyframe:
    time: float
    q: np.ndarray             # (4,) world_from_body
    t: np.ndarray             # (3,)
    points: np.ndarray        # (N, 3) body-frame keypoints (padded)
    valid: np.ndarray         # (N,) bool


@dataclass
class BackendConfig:
    keyframe_interval: float = 0.5       # seconds between keyframes
    window_size: int = 4                 # keyframes per BA window
    ba_every_n_keyframes: int = 4
    ba_voxel_size: float = 0.6
    ba_min_neighbors: int = 8
    loop_radius: float = 2.0
    loop_min_gap: int = 20
    loop_fitness_threshold: float = 0.6
    # min translation observability of a verified closure (ClosureResult
    # .t_observability): rejects plane-sliding alignments that score
    # high fitness at a wrong translation
    loop_min_observability: float = 0.15
    loop_check_every_n: int = 5
    # Loop candidates verified per check.  Round 4 pinned this at 2:
    # every verified closure triggers a feedback event that rigidly
    # re-anchored the world frame while the frontend voxel map stayed
    # where drifted inserts put it (measured then: 2 pairs -> 7 cm,
    # 4 -> 11 cm, 8 -> 56+ cm ATE with individually GOOD closures).
    # With feedback_rebuild_map (round 5) the map is rebuilt from the
    # keyframe payloads at their loop-consistent poses on every
    # feedback event, removing that failure mode — the default returns
    # to the full candidate budget.
    loop_max_pairs: int = 8
    max_keyframe_points: int = 1024
    odometry_rot_w: float = 50.0
    odometry_t_w: float = 50.0
    loop_rot_w: float = 100.0
    loop_t_w: float = 100.0
    # Feed accepted loop closures back into the LIVE filter via
    # eskf.observe_pose (the reference's observePose hook,
    # eskfEstimator.cpp:232-260, unused by its main path).  Off by
    # default: feedback re-anchors the frontend map/trajectory mid-run.
    feedback_to_filter: bool = False
    feedback_trans_noise: float = 1e-3
    feedback_ang_noise: float = 1e-3
    # Rebuild the frontend voxel map from the stored keyframe scans at
    # their loop-consistent poses on every feedback event (map
    # re-anchoring).  A rigid whole-map transform cannot fix the
    # post-correction inconsistency: near a revisit the map holds BOTH
    # old (near-correct) and recent (drifted) inserts of the same
    # geometry, and any rigid move leaves one population disagreeing
    # with the corrected state.  The per-keyframe rebuild places every
    # scan at its optimized pose — the map the frontend WOULD have
    # built had it tracked the loop-consistent trajectory — at the
    # cost of keyframe-subsample density (the next sweeps re-densify).
    feedback_rebuild_map: bool = True
    # Long-run memory bound: keyframes beyond this many keep their pose
    # (pose graph stays complete) but drop their point payload — the
    # dominant per-keyframe memory (max_keyframe_points x 3 f32).
    # Condensed keyframes are skipped as loop-closure candidates.
    # 0 = unbounded (keep all payloads).
    max_keyframe_payloads: int = 0


class MappingBackend:
    def __init__(self, cfg: Optional[BackendConfig] = None):
        self.cfg = cfg or BackendConfig()
        self.keyframes: List[Keyframe] = []
        self.edges: List[dict] = []      # odometry + loop edges
        self.n_loop_closures = 0
        self._last_kf_time = -1e18
        self.ba_runs = 0
        self._pending_feedback = False
        self.n_feedback_applied = 0
        self.n_map_rebuilds = 0

    # ---- called by the pipeline after each processed frame -------------
    def maybe_add_keyframe(self, pipeline, out, meas):
        if meas.time_image - self._last_kf_time < self.cfg.keyframe_interval:
            return
        if not bool(out.summary.success):
            return
        self._last_kf_time = meas.time_image
        q = np.asarray(out.state.q, np.float32)
        t = np.asarray(out.state.p, np.float32)
        # body-frame keypoints from the registered world frame points
        pts_w = np.asarray(out.frame_pts_world)
        valid = np.asarray(out.frame_valid)
        m = self.cfg.max_keyframe_points
        idx = np.nonzero(valid)[0]
        stride = max(len(idx) // m, 1)
        idx = idx[::stride][:m]
        r = np.asarray(lie.quat_to_rot(jnp.asarray(q)))
        body = (pts_w[idx] - t) @ r
        pts = np.zeros((m, 3), np.float32)
        ok = np.zeros(m, bool)
        pts[:len(idx)] = body
        ok[:len(idx)] = True
        kf = Keyframe(time=meas.time_image, q=q, t=t, points=pts, valid=ok)

        if self.keyframes:
            prev = self.keyframes[-1]
            q_rel, t_rel = pg.edge_from_poses(
                jnp.asarray(prev.q), jnp.asarray(prev.t),
                jnp.asarray(q), jnp.asarray(t))
            self.edges.append(dict(
                i=len(self.keyframes) - 1, j=len(self.keyframes),
                q=np.asarray(q_rel), t=np.asarray(t_rel),
                rot_w=self.cfg.odometry_rot_w, t_w=self.cfg.odometry_t_w))
        self.keyframes.append(kf)

        n = len(self.keyframes)
        if (n >= self.cfg.window_size
                and n % self.cfg.ba_every_n_keyframes == 0):
            self._run_window_ba(pipeline.voxel_map)
        if n % self.cfg.loop_check_every_n == 0:
            self._check_loop_closures()
        m = self.cfg.max_keyframe_payloads
        if m > 0 and n > m:
            # condense old keyframes: poses stay (the pose graph is
            # complete), point payloads are freed beyond the newest m
            for f in self.keyframes[:n - m]:
                if f.points.shape[0]:
                    f.points = np.zeros((0, 3), np.float32)
                    f.valid = np.zeros((0,), bool)
        if self._pending_feedback and self.cfg.feedback_to_filter:
            self.apply_pose_correction(pipeline)
            self._pending_feedback = False

    # ---- loop-closure feedback into the live filter ----------------------
    def apply_pose_correction(self, pipeline) -> bool:
        """Re-anchor the LIVE ESKF on the loop-consistent trajectory via
        eskf.observe_pose (observePose, eskfEstimator.cpp:232-260 — the
        reference exposes but never calls this hook; here it closes the
        loop from pose graph back to the filter).

        Solves the pose graph, computes the rigid correction of the
        newest keyframe (optimized_from_odometry), composes it onto the
        pipeline's current state, and applies it as a direct 6-dof pose
        observation.  Returns True when a correction was applied.

        The same world-frame delta is composed onto every STORED
        keyframe pose, so the next odometry edge (between the last
        pre-correction keyframe and the first post-correction one)
        measures actual motion instead of absorbing the correction jump.
        Relative edges are invariant under this rigid re-anchor.

        With feedback_rebuild_map (default) the frontend voxel map is
        rebuilt from the keyframe payloads at their loop-consistent
        poses (see BackendConfig.feedback_rebuild_map) — without it,
        ICP registers new sweeps against geometry inserted at the
        drifted poses until those voxels are naturally re-observed or
        evicted, which caps the usable loop_max_pairs at ~2 (round-4
        measurement at backend.py:44).
        """
        if len(self.keyframes) < 2 or not self.edges:
            return False
        _, t_opt, q_opt = self.optimized_trajectory()
        f = self.keyframes[-1]
        q_old = jnp.asarray(f.q)
        t_old = jnp.asarray(f.t)
        q_new = jnp.asarray(q_opt[-1])
        t_new = jnp.asarray(t_opt[-1])
        # delta = X_new X_old^-1 (world-frame rigid correction)
        q_delta = lie.quat_normalize(lie.quat_mul(q_new, lie.quat_conj(q_old)))
        t_delta = t_new - lie.quat_rotate(q_delta, t_old)
        state = pipeline.state
        q_target = lie.quat_normalize(lie.quat_mul(q_delta, state.q))
        t_target = lie.quat_rotate(q_delta, state.p) + t_delta
        from sr_livo_tpu.models import eskf as eskf_mod
        pipeline.state = eskf_mod.observe_pose(
            state, t_target, q_target,
            trans_noise=self.cfg.feedback_trans_noise,
            ang_noise=self.cfg.feedback_ang_noise)
        # Store the loop-consistent poses back into the keyframes: the
        # newest keyframe's optimized pose IS its delta-composed pose
        # (the delta is defined from it), so the next odometry edge
        # measures actual motion, and older keyframes take their
        # individually optimized poses so later pose-graph solves start
        # at the optimum (a rigid delta would leave the past bent).
        for k, f in enumerate(self.keyframes):
            f.q = np.asarray(q_opt[k], np.float32)
            f.t = np.asarray(t_opt[k], np.float32)
        if self.cfg.feedback_rebuild_map:
            self._rebuild_map(pipeline)
        self.n_feedback_applied += 1
        return True

    def _rebuild_map(self, pipeline):
        """Map re-anchoring (round-5): fresh frontend voxel table filled
        with every retained keyframe payload at its (now
        loop-consistent) stored pose, oldest first — the map the
        frontend would have built along the corrected trajectory.
        Keyframe-subsample density is lower than the live map's; the
        following sweeps re-densify it.  Off the per-sweep path (runs
        only on feedback events)."""
        from sr_livo_tpu.ops import voxel_map as vm
        cfg = pipeline.cfg
        m = vm.make_map(cfg.shapes.map_capacity, cfg.shapes.map_voxel_points)
        icp, odo = cfg.icp, cfg.odometry_options
        # one batched insert per GROUP of keyframes (fixed row count, so
        # one compiled program serves every group of every rebuild —
        # per-keyframe dispatches made the rebuild wall-visible on 100+
        # keyframe runs); within-batch same-voxel rows skip the mutual
        # distance check, the same documented insert() batch semantics
        # the live per-sweep path already has
        group = 16
        rows_per = max((f.points.shape[0] for f in self.keyframes),
                       default=0)
        ws, vs = [], []
        for f in self.keyframes:
            if f.points.shape[0] == 0:
                continue           # condensed payload: region re-observes
            r = np.asarray(lie.quat_to_rot(jnp.asarray(f.q)), np.float32)
            w = np.zeros((rows_per, 3), np.float32)
            v = np.zeros((rows_per,), bool)
            w[:f.points.shape[0]] = f.points @ r.T + f.t
            v[:f.valid.shape[0]] = f.valid
            ws.append(w)
            vs.append(v)
        for g in range(0, len(ws), group):
            chunk = ws[g:g + group]
            pad = group - len(chunk)
            world = np.concatenate(
                chunk + [np.zeros((rows_per, 3), np.float32)] * pad)
            val = np.concatenate(
                vs[g:g + group] + [np.zeros((rows_per,), bool)] * pad)
            m, _ = vm.insert(
                m, jnp.asarray(world), jnp.asarray(val),
                icp.size_voxel_map, odo.min_distance_points,
                cfg.shapes.map_max_probe)
        pipeline.voxel_map = m
        self.n_map_rebuilds += 1

    # ---- windowed BA over the most recent keyframes ---------------------
    def _run_window_ba(self, voxel_map):
        k = self.cfg.window_size
        kfs = self.keyframes[-k:]
        if any(f.points.shape[0] == 0 for f in kfs):
            return             # condensed payloads in window (m < window)
        window = ba_mod.KeyframeWindow(
            q=jnp.asarray(np.stack([f.q for f in kfs])),
            t=jnp.asarray(np.stack([f.t for f in kfs])),
            points=jnp.asarray(np.stack([f.points for f in kfs])),
            pt_valid=jnp.asarray(np.stack([f.valid for f in kfs])),
            kf_valid=jnp.ones(k, bool))
        q_odo, t_odo = [], []
        for a, b in zip(kfs[:-1], kfs[1:]):
            qr, tr = pg.edge_from_poses(
                jnp.asarray(a.q), jnp.asarray(a.t),
                jnp.asarray(b.q), jnp.asarray(b.t))
            q_odo.append(np.asarray(qr))
            t_odo.append(np.asarray(tr))
        q_new, t_new = ba_mod.windowed_ba(
            voxel_map, window,
            jnp.asarray(np.stack(q_odo)), jnp.asarray(np.stack(t_odo)),
            voxel_size=self.cfg.ba_voxel_size,
            min_neighbors=self.cfg.ba_min_neighbors, iters=2)
        for idx, f in enumerate(kfs):
            f.q = np.asarray(q_new[idx])
            f.t = np.asarray(t_new[idx])
        self.ba_runs += 1

    # ---- loop closures ---------------------------------------------------
    def _check_loop_closures(self):
        if len(self.keyframes) < self.cfg.loop_min_gap + 2:
            return
        pos = np.stack([f.t for f in self.keyframes])
        cands = lc.find_candidates(pos, radius=self.cfg.loop_radius,
                                   min_gap=self.cfg.loop_min_gap,
                                   max_pairs=self.cfg.loop_max_pairs)
        existing = {(e["i"], e["j"]) for e in self.edges}
        for (i, j) in cands:
            if (i, j) in existing:
                continue
            fi, fj = self.keyframes[i], self.keyframes[j]
            if fi.points.shape[0] == 0 or fj.points.shape[0] == 0:
                continue       # condensed keyframe: payload retired
            res = lc.verify_closure(
                jnp.asarray(fi.points), jnp.asarray(fi.valid),
                jnp.asarray(fj.points), jnp.asarray(fj.valid),
                jnp.asarray(fi.q), jnp.asarray(fi.t),
                jnp.asarray(fj.q), jnp.asarray(fj.t))
            if (float(res.fitness) >= self.cfg.loop_fitness_threshold
                    and float(res.t_observability)
                    >= self.cfg.loop_min_observability):
                self.edges.append(dict(
                    i=i, j=j, q=np.asarray(res.q_meas),
                    t=np.asarray(res.t_meas),
                    rot_w=self.cfg.loop_rot_w, t_w=self.cfg.loop_t_w))
                self.n_loop_closures += 1
                self._pending_feedback = True

    # ---- global optimization --------------------------------------------
    def optimized_trajectory(self, iters: int = 10
                             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Pose-graph solve over all keyframes; returns (times, t, q)."""
        n = len(self.keyframes)
        times = np.array([f.time for f in self.keyframes])
        if n < 2 or not self.edges:
            return (times, np.stack([f.t for f in self.keyframes]),
                    np.stack([f.q for f in self.keyframes]))
        e = len(self.edges)
        # pad node/edge counts to power-of-two buckets: each distinct
        # shape compiles its own program, and an unpadded growing graph
        # would recompile on EVERY call (a hidden super-linear wall
        # cost); padded edges are masked by edge_valid, padded nodes are
        # identity poses touched only by damping (dx = 0).
        n_pad = 1 << max(int(n - 1).bit_length(), 3)
        e_pad = 1 << max(int(e - 1).bit_length(), 3)
        q_all = np.tile(np.array([1, 0, 0, 0], np.float32), (n_pad, 1))
        t_all = np.zeros((n_pad, 3), np.float32)
        q_all[:n] = np.stack([f.q for f in self.keyframes])
        t_all[:n] = np.stack([f.t for f in self.keyframes])

        def pad1(vals, fill, dtype):
            a = np.full((e_pad,), fill, dtype)
            a[:e] = vals
            return a

        qm = np.tile(np.array([1, 0, 0, 0], np.float32), (e_pad, 1))
        qm[:e] = np.stack([d["q"] for d in self.edges])
        tm = np.zeros((e_pad, 3), np.float32)
        tm[:e] = np.stack([d["t"] for d in self.edges])
        graph = pg.PoseGraph(
            q=jnp.asarray(q_all), t=jnp.asarray(t_all),
            edge_i=jnp.asarray(pad1([d["i"] for d in self.edges], 0,
                                    np.int32)),
            edge_j=jnp.asarray(pad1([d["j"] for d in self.edges], 0,
                                    np.int32)),
            q_meas=jnp.asarray(qm), t_meas=jnp.asarray(tm),
            rot_w=jnp.asarray(pad1([d["rot_w"] for d in self.edges], 0.0,
                                   np.float32)),
            t_w=jnp.asarray(pad1([d["t_w"] for d in self.edges], 0.0,
                                 np.float32)),
            edge_valid=jnp.asarray(np.arange(e_pad) < e))
        q, t = pg.optimize_pose_graph(graph, iters=iters)
        return times, np.asarray(t)[:n], np.asarray(q)[:n]

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
    # Loop candidates verified per check.  With feedback_to_filter, keep
    # this low: every verified closure triggers a feedback event, and
    # each event rigidly re-anchors the world frame mid-run while the
    # frontend voxel map stays where drifted inserts put it (the
    # documented apply_pose_correction limitation) — measured on the
    # 60 s revisit gate: 2 pairs -> 7 cm, 4 -> 11 cm, 8 -> 56+ cm ATE,
    # with individually GOOD closures (cm-consistent edges).  Raising
    # this is safe for offline optimized_trajectory() use; pairing it
    # with live feedback needs map re-anchoring first (round-5 item).
    loop_max_pairs: int = 2
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

        Known limitation: the frontend voxel map is NOT rebuilt — after
        a large correction, ICP registers new sweeps against geometry
        inserted at the drifted poses until those voxels are naturally
        re-observed/evicted.  Keep feedback_to_filter off (default) when
        map self-consistency matters more than live loop consistency.
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
        # Re-anchor the stored keyframes into the corrected world frame
        # so the next odometry edge does not remeasure the jump.
        qd = np.asarray(q_delta, np.float32)
        td = np.asarray(t_delta, np.float32)
        for f in self.keyframes:
            fq = np.asarray(lie.quat_normalize(
                lie.quat_mul(jnp.asarray(qd), jnp.asarray(f.q))), np.float32)
            ft = np.asarray(lie.quat_rotate(jnp.asarray(qd),
                                            jnp.asarray(f.t)), np.float32) + td
            f.q, f.t = fq, ft
        self.n_feedback_applied += 1
        return True

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

"""LIVO pipeline orchestrator: the host-side equivalent of lioOptimization.

Owns the sweep cutter, the IMU initializer, the compiled LIO engine, and
(once the vision module is attached) the camera ESIKFs + RGB map.  The
host only cuts/pads streams and reads back poses; all estimation runs in
jitted device programs.

Reference topology: lioOptimization::run()/process()
(/root/reference/src/lioOptimization.cpp:1428-1584, 1037-1131).
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from sr_livo_tpu.config import LivoConfig
from sr_livo_tpu.models import eskf as eskf_mod
from sr_livo_tpu.models.odometry import LioEngine, SweepInput, WireSweep
from sr_livo_tpu.runtime import measurements as meas_mod
from sr_livo_tpu.runtime import tum
from sr_livo_tpu.utils.profiling import StageTimers


@dataclass
class FrameRecord:
    time: float
    position: np.ndarray
    quat_wxyz: np.ndarray
    velocity: np.ndarray
    ba: np.ndarray
    bg: np.ndarray
    success: bool
    num_residuals: int
    iterations: int
    rendering: bool


class LivoPipeline:
    def __init__(self, cfg: LivoConfig, vision=None, backend=None,
                 stream=None):
        self.cfg = cfg
        self.backend = backend  # optional parallel.backend.MappingBackend
        # optional runtime.streaming.StreamPublisher — live pose/path/
        # color-map files while the run is in flight (L7 parity with the
        # reference publishers, lioOptimization.cpp:1186-1384)
        self.stream = stream
        self.engine = LioEngine(cfg)
        self.cutter = meas_mod.SweepCutter(
            cfg.sweep_interval,
            time_diff_enable=cfg.imu_options.time_diff_enable)
        self.initializer = eskf_mod.ImuInitializer(
            float(np.linalg.norm(cfg.gravity_acc)))
        self.state = self.engine.init_state()
        self.voxel_map = self.engine.make_map()
        self.vision = vision  # attached imaging module (models.vision)
        self.initialized = False
        self.current_time = -1.0
        self._dense_until = -1e18      # adaptive_keypoint_density hold
        self.n_dense_sweeps = 0        # observability: dense-variant picks
        self._trigger_log = []         # (t, gyr_rate, acc_dev) per sweep
        self._init_time = None         # time the filter initialized
        self.index_frame = 1
        # Records are kept as ONE packed device vector per frame and
        # materialized to FrameRecords in a single batched transfer on
        # first read: per-frame np.asarray round trips through the device
        # tunnel would serialize the whole pipeline (RTT >> compute).
        self._records: List[FrameRecord] = []
        self._pending_records: list = []     # (time, rendering, (19,) dev)
        self.n_retired = 0                   # frames retired to disk/stream
        if cfg.retire_frames and stream is None:
            # retirement appends; start the output files fresh
            os.makedirs(cfg.output_path, exist_ok=True)
            for name in ("pose.txt", "velocity.txt", "bias.txt"):
                open(os.path.join(cfg.output_path, name), "w").close()
        self._last_imu_sample = None
        # last two solved poses for the INIT_CONSTANT_VELOCITY seed
        # (stateInitialization, lioOptimization.cpp:895-990); device arrays,
        # never synced to host
        self._pose_hist: list = []
        self.timers = StageTimers(sync=False)

    # ---- ingest -----------------------------------------------------------
    def push_points(self, pts: np.ndarray):
        self.cutter.push_points(pts)

    def push_imu(self, t: float, acc, gyr):
        self.cutter.push_imu(t, acc, gyr)

    def push_image(self, t: float, image: Optional[np.ndarray]):
        self.cutter.push_image(t, image)

    # ---- processing -------------------------------------------------------
    def process_available(self) -> int:
        """Drain the cutter; returns the number of frames processed."""
        n = 0
        while True:
            meas = self.cutter.get()
            if meas is None:
                return n
            self._process_measurement(meas)
            n += 1

    def process_measurements(self, meas_list, pipelined: bool = True,
                             depth: int = 3) -> int:
        """Process a list of pre-cut measurements; with `pipelined`, a
        feeder thread runs the host preparation (numpy sweep padding,
        int16 wire packing, native image remap, upload enqueue) of frame
        k+1..k+depth while the main thread dispatches the device programs
        of frame k — hiding the ~1 ms/frame host prep behind device
        compute.  Frames before filter initialization run serially (the
        init path is stateful on the filter)."""
        i = 0
        while i < len(meas_list) and not (pipelined and self.initialized):
            self._process_measurement(meas_list[i])
            i += 1
        if i >= len(meas_list):
            return i
        q: queue.Queue = queue.Queue(maxsize=depth)
        err: list = []
        start = self.index_frame

        def _feed():
            try:
                for j, m in enumerate(meas_list[i:]):
                    q.put(self._host_prepare_measurement(m, start + j))
            except BaseException as e:  # surface on the main thread
                err.append(e)
            finally:
                q.put(None)

        th = threading.Thread(target=_feed, name="livo-feeder", daemon=True)
        th.start()
        n = i
        while True:
            pf = q.get()
            if pf is None:
                break
            self._dispatch_prepared(pf)
            n += 1
        th.join()
        if err:
            raise err[0]
        return n

    def _process_measurement(self, meas: meas_mod.Measurement):
        if not self._init_or_skip(meas):
            return
        self._dispatch_prepared(
            self._host_prepare_measurement(meas, self.index_frame))

    def _init_or_skip(self, meas: meas_mod.Measurement) -> bool:
        """Static-init bookkeeping; returns True once sweeps should flow
        through the estimation path (run(), lioOptimization.cpp:1438-1486)."""
        if self.current_time < 0:
            self.current_time = meas.time_sweep_begin
        if self.initialized:
            return True
        samples, self.current_time = meas_mod.interpolate_imu(
            meas, self.current_time)
        for (_dt, t, acc, gyr) in samples:
            self.initializer.push(t, acc, gyr)
            self._last_imu_sample = (acc, gyr)
        if self.initializer.ready():
            self.state = self.initializer.build_state(self.state)
            if self._last_imu_sample is not None:
                acc, gyr = self._last_imu_sample
                self.state = self.state._replace(
                    acc_0=jnp.asarray(acc, jnp.float32),
                    gyr_0=jnp.asarray(gyr, jnp.float32))
            self.initialized = True
        return False

    # ---- two-phase per-frame path -----------------------------------------
    # The host work of frame k+1 (numpy sweep padding/packing, native
    # image remap) is independent of the device results of frame k, so a
    # feeder thread can run _host_prepare_measurement one frame ahead
    # while the main thread dispatches device programs — the same overlap
    # the reference gets from its visualization thread
    # (lioOptimization.cpp:1594).  See process_measurements().

    def _host_prepare_measurement(self, meas: meas_mod.Measurement,
                                  frame_index: int, to_device: bool = True):
        """Numpy-only sweep/image preparation (feeder-thread safe: touches
        only the cutter-side state `current_time`, never the filter/map).
        With `to_device`, the padded buffers are uploaded here too —
        transfers enqueue on the device stream and overlap the main
        thread's dispatch work."""
        up = jnp.asarray if to_device else (lambda x: x)
        if self.cfg.wire_quantization:
            # one fused host pass (native C++ when available): window +
            # decimate + int16 quantize + dense (M, 9) IMU pack — 3
            # transfers per sweep instead of 10 (each transfer costs
            # ~0.15 ms of serial device-stream time on the tunnel)
            with self.timers.stage("prepare_sweep"):
                imu_pack, wire, new_time, _n = meas_mod.prepare_sweep_wire(
                    meas, self.current_time, self.cfg)
            self.current_time = new_time
            meta = np.array([
                wire.scale, wire.duration,
                1.0 if frame_index > 1 else 0.0,
                1 if frame_index < self.cfg.icp.init_num_frames
                else self.cfg.icp.threshold_voxel_occupancy], np.float32)
            sweep = WireSweep(pts_q=up(wire.pts_q), imu=up(imu_pack),
                              meta=up(meta))
        else:
            with self.timers.stage("prepare_sweep"):
                prep = meas_mod.prepare_sweep(meas, self.current_time,
                                              self.cfg)
            self.current_time = prep.new_current_time
            sweep = SweepInput(
                raw_pts=up(prep.raw_pts),
                t_rel=up(prep.t_rel),
                pt_valid=up(prep.pt_valid),
                imu_t=up(prep.imu_t),
                imu_dt=up(prep.imu_dt),
                imu_acc=up(prep.imu_acc),
                imu_gyr=up(prep.imu_gyr),
                imu_valid=up(prep.imu_valid),
                do_optimize=up(np.asarray(frame_index > 1)),
                threshold_capacity=up(np.int32(
                    1 if frame_index < self.cfg.icp.init_num_frames
                    else self.cfg.icp.threshold_voxel_occupancy)))
        host_img = None
        if (self.vision is not None and meas.rendering
                and meas.image is not None):
            with self.timers.stage("vis_host_prep"):
                img_u8, remapped = self.vision._host_prepare(meas.image)
                if to_device:
                    img_u8 = jnp.asarray(img_u8)
                host_img = (img_u8, remapped)
        return (meas, frame_index, sweep, host_img)

    def _dispatch_prepared(self, prepared):
        meas, frame_index, sweep, host_img = prepared
        assert frame_index == self.index_frame
        prev_poses = None
        if self.engine.use_cv_init and self._pose_hist:
            prev_poses = (self._pose_hist[-1],
                          self._pose_hist[-2] if len(self._pose_hist) > 1
                          else self._pose_hist[-1])
        gyr_rate = 0.0
        if self.cfg.adaptive_keypoint_density and meas.imu:
            gyr_rate = float(np.mean(
                [np.linalg.norm(g) for (_t, _a, g) in meas.imu]))
            g_norm = float(np.linalg.norm(self.cfg.gravity_acc))
            acc_dev = float(np.mean(
                [abs(float(np.linalg.norm(a)) - g_norm)
                 for (_t, a, _g) in meas.imu]))
            self._trigger_log.append(
                (self.current_time, gyr_rate, acc_dev))
            if self._init_time is None and self.initialized:
                self._init_time = self.current_time
            warm = (self._init_time is not None
                    and self.current_time - self._init_time
                    < self.cfg.dense_warmup_s)
            if warm or acc_dev > self.cfg.dense_acc_threshold:
                gyr_rate = self.cfg.dense_gyr_threshold + 1.0
            if gyr_rate > self.cfg.dense_gyr_threshold:
                # hold the dense variant through the oscillation dips
                self._dense_until = (self.current_time
                                     + self.cfg.dense_hold_s)
            elif self.current_time < self._dense_until:
                gyr_rate = self.cfg.dense_gyr_threshold + 1.0
            if gyr_rate > self.cfg.dense_gyr_threshold:
                self.n_dense_sweeps += 1
        with self.timers.stage("lio_step"):
            out = self.engine.step(self.state, self.voxel_map, sweep,
                                   self.index_frame, prev_poses=prev_poses,
                                   gyr_rate=gyr_rate)
            if self.timers.sync:
                import jax
                jax.block_until_ready(out.state.p)
        self.state = out.state
        self.voxel_map = out.voxel_map
        if self.engine.use_cv_init:
            self._pose_hist = (self._pose_hist + [(out.state.q,
                                                   out.state.p)])[-2:]

        if self.cfg.debug_output:
            # per-frame de-skewed world-frame cloud dump
            # (lioOptimization.cpp:1091-1099)
            from sr_livo_tpu.runtime.pcd import save_xyz_points
            d = os.path.join(self.cfg.output_path, "cloud_frame")
            os.makedirs(d, exist_ok=True)
            save_xyz_points(np.asarray(out.frame_pts_world),
                            np.asarray(out.frame_valid),
                            os.path.join(d, f"{self.index_frame:06d}.pcd"))

        if (self.cfg.enable_map_eviction
                and self.index_frame % self.cfg.eviction_every_n_frames == 0):
            # Slot-RECLAIMING eviction (robin_map erase semantics,
            # lioOptimization.cpp:556-572): rebuild the table keeping only
            # near voxels.  Off the per-sweep path; the dropped counter
            # stays on device (no per-frame D2H).
            from sr_livo_tpu.ops.voxel_map import compact_map
            self.voxel_map, self._evict_dropped = compact_map(
                self.voxel_map, self.state.p,
                distance=self.cfg.odometry_options.max_distance,
                max_probe=self.cfg.shapes.map_max_probe)

        if self.vision is not None:
            if meas.rendering and meas.image is not None:
                # rendered frame: the colored-map insert leg rides inside
                # the fused vision program (ONE dispatch for insert +
                # preprocess + vision step)
                with self.timers.stage("vision_frame"):
                    self.vision.process_frame(self, meas, out,
                                              host_img=host_img)
            else:
                # colored-map leg of addPointsToMap (every sweep,
                # lioOptimization.cpp:538-539)
                with self.timers.stage("color_insert"):
                    self.vision.insert_sweep_points(
                        out.frame_pts_world, out.frame_valid,
                        out.summary.success, meas.time_image)
                    if self.timers.sync:
                        import jax
                        jax.block_until_ready(self.vision.color_map.reg)

        if self.backend is not None:
            with self.timers.stage("backend"):
                self.backend.maybe_add_keyframe(self, out, meas)

        if self.cfg.icp.debug_print:
            # ICP failure diagnostics (optimize.cpp:110-123).  Reads the
            # packed record back synchronously — debug mode only.
            row = np.asarray(out.record, np.float64)
            if row[16] < 0.5:
                print("[Optimization] Error : not enough keypoints "
                      "selected in ct-icp !\n[Optimization] "
                      f"number_of_residuals : {int(row[17])}")

        # per-frame record is packed inside the LIO program (out.record)
        self._pending_records.append(
            (meas.time_image, meas.rendering, out.record))
        if self.stream is not None:
            self.stream.publish_frame(
                meas.time_image, out.record,
                color_map=(self.vision.color_map
                           if self.vision is not None else None))
        if self.cfg.retire_frames:
            self._maybe_retire()
        self.index_frame += 1

    # ---- frame retirement (keep-2 semantics, lioOptimization.cpp:1101) ----
    def _maybe_retire(self):
        """Bound the live record set like the reference's frame loop:
        keep `num_for_initialization` frames before filter init and 2
        afterwards (lioOptimization.cpp:1101-1130), retiring older ones
        through recordSinglePose-equivalent appends.  Retirement runs in
        `retire_batch`-sized batches so the device->host materialization
        is one packed transfer per batch; with a StreamPublisher attached
        the records are already mirrored to odometry_live.txt on the
        publisher thread and retired entries are simply dropped."""
        keep = (2 if self.initialized
                else self.cfg.odometry_options.num_for_initialization)
        if len(self._pending_records) < keep + self.cfg.retire_batch:
            # also bound _records if a mid-run .records access moved
            # pending entries there already
            if len(self._records) > keep + self.cfg.retire_batch:
                n_ret = len(self._records) - keep
                self._append_retired(self._records[:n_ret])
                self._records = self._records[n_ret:]
                self.n_retired += n_ret
            return
        n_ret = len(self._pending_records) - keep
        retired = self._pending_records[:n_ret]
        self._pending_records = self._pending_records[n_ret:]
        if self.stream is None:
            rows = np.asarray(
                jnp.stack([r for (_, _, r) in retired]), np.float64)
            recs = [FrameRecord(
                time=t, position=row[0:3], quat_wxyz=row[3:7],
                velocity=row[7:10], ba=row[10:13], bg=row[13:16],
                success=bool(row[16] > 0.5), num_residuals=int(row[17]),
                iterations=int(row[18]), rendering=rend)
                for (t, rend, _), row in zip(retired, rows)]
            self._append_retired(recs)
        self.n_retired += n_ret

    def _append_retired(self, recs: List[FrameRecord]):
        """recordSinglePose for retired frames (lioOptimization.cpp:
        1133-1172): append TUM pose + velocity + bias lines."""
        out_dir = self.cfg.output_path
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "pose.txt"), "a") as fp, \
                open(os.path.join(out_dir, "velocity.txt"), "a") as fv, \
                open(os.path.join(out_dir, "bias.txt"), "a") as fb:
            for r in recs:
                p, q, v = r.position, r.quat_wxyz, r.velocity
                fp.write(f"{r.time:.9f} {p[0]:.9f} {p[1]:.9f} {p[2]:.9f} "
                         f"{q[1]:.9f} {q[2]:.9f} {q[3]:.9f} {q[0]:.9f}\n")
                fv.write(f"{r.time:.9f} {v[0]:.9f} {v[1]:.9f} {v[2]:.9f}\n")
                fb.write(f"{r.time:.9f} "
                         f"{r.ba[0]:.9f} {r.ba[1]:.9f} {r.ba[2]:.9f} "
                         f"{r.bg[0]:.9f} {r.bg[1]:.9f} {r.bg[2]:.9f}\n")

    # ---- records (lazy batched device->host materialization) --------------
    @property
    def records(self) -> List[FrameRecord]:
        self._materialize_records()
        return self._records

    @records.setter
    def records(self, value):
        self._records = list(value)
        self._pending_records = []

    def _materialize_records(self):
        if not self._pending_records:
            return
        rows = np.asarray(
            jnp.stack([r for (_, _, r) in self._pending_records]),
            np.float64)
        for (t, rend, _), row in zip(self._pending_records, rows):
            self._records.append(FrameRecord(
                time=t, position=row[0:3], quat_wxyz=row[3:7],
                velocity=row[7:10], ba=row[10:13], bg=row[13:16],
                success=bool(row[16] > 0.5), num_residuals=int(row[17]),
                iterations=int(row[18]), rendering=rend))
        self._pending_records = []

    # ---- checkpoint / resume ---------------------------------------------
    def save_checkpoint(self, path: str):
        from sr_livo_tpu.runtime.checkpoint import save_pipeline
        save_pipeline(self, path)

    def load_checkpoint(self, path: str):
        from sr_livo_tpu.runtime.checkpoint import load_pipeline
        return load_pipeline(self, path)

    # ---- output -----------------------------------------------------------
    def trajectory(self):
        ts = np.array([r.time for r in self.records])
        ps = np.stack([r.position for r in self.records]) if self.records \
            else np.zeros((0, 3))
        qs = np.stack([r.quat_wxyz for r in self.records]) if self.records \
            else np.zeros((0, 4))
        return ts, ps, qs

    def record_parameters(self, out_dir: Optional[str] = None):
        """parameter_list.txt dump (recordParameters, parameters.cpp:73-164)."""
        import dataclasses
        out_dir = out_dir or self.cfg.output_path
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "parameter_list.txt"), "w") as f:
            def dump(name, dc):
                f.write(f"[{name}]\n")
                for fld in dataclasses.fields(dc):
                    f.write(f"{fld.name}: {getattr(dc, fld.name)}\n")
                f.write("\n")
            dump("odometry_options", self.cfg.odometry_options)
            dump("icp_options", self.cfg.icp)
            dump("map_options", self.cfg.map_options)
            dump("imu_parameter", self.cfg.imu_options)
            dump("lidar_parameter", self.cfg.lidar_options)
            dump("shapes", self.cfg.shapes)

    def write_outputs(self, out_dir: Optional[str] = None):
        """pose.txt / velocity.txt / bias.txt (recordSinglePose,
        lioOptimization.cpp:1133-1172).  With retire_frames on, retired
        frames were appended at retirement time; this flushes only the
        still-live tail (append into the same files)."""
        out_dir = out_dir or self.cfg.output_path
        os.makedirs(out_dir, exist_ok=True)
        if self.cfg.retire_frames and self.n_retired and self.stream is None \
                and out_dir == self.cfg.output_path:
            self._append_retired(self.records)
            self._records = []
            return
        ts, ps, qs = self.trajectory()
        tum.write_tum(os.path.join(out_dir, "pose.txt"), ts, ps, qs)
        with open(os.path.join(out_dir, "velocity.txt"), "w") as f:
            for r in self.records:
                v = r.velocity
                f.write(f"{r.time:.9f} {v[0]:.9f} {v[1]:.9f} {v[2]:.9f}\n")
        with open(os.path.join(out_dir, "bias.txt"), "w") as f:
            for r in self.records:
                f.write(f"{r.time:.9f} "
                        f"{r.ba[0]:.9f} {r.ba[1]:.9f} {r.ba[2]:.9f} "
                        f"{r.bg[0]:.9f} {r.bg[1]:.9f} {r.bg[2]:.9f}\n")


def run_streams(pipeline: LivoPipeline, stream, chunk_seconds: float = 0.25
                ) -> LivoPipeline:
    """Feed a SimStream (or equivalent) through the pipeline in time order,
    interleaving sensor queues like live ROS ingest would."""
    events = []
    for (t, acc, gyr) in stream.imu:
        events.append((t, "imu", (t, acc, gyr)))
    for chunk in stream.lidar_chunks:
        if chunk.shape[0]:
            events.append((chunk[-1, 3], "pts", chunk))
    for (t, img) in stream.images:
        events.append((t, "img", (t, img)))
    events.sort(key=lambda e: (e[0], e[1]))

    next_drain = chunk_seconds
    for (t, kind, payload) in events:
        if kind == "imu":
            pipeline.push_imu(*payload)
        elif kind == "pts":
            pipeline.push_points(payload)
        else:
            pipeline.push_image(*payload)
        if t >= next_drain:
            pipeline.process_available()
            next_drain = t + chunk_seconds
    pipeline.process_available()
    return pipeline

"""Host-side sweep reconstruction: the measurement cutter.

Port of the reference scheduler getMeasurements()
(/root/reference/src/lioOptimization.cpp:666-784): cuts the continuous
point/IMU/image streams into sweeps whose end timestamps align with
camera images (the SR-LIVO novelty), emitting gap-fill sweeps at the
nominal interval when images lag.  Also prepares the padded device
tensors (SweepInput) with the exact boundary IMU interpolation of run()
(lioOptimization.cpp:1503-1570).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from sr_livo_tpu.config import LivoConfig


@dataclass
class Measurement:
    """One reconstructed sweep (reference Measurements, lioOptimization.h:65)."""
    time_image: float                  # sweep end time
    time_sweep_begin: float
    duration: float
    rendering: bool                    # True: real image attached
    imu: List[Tuple[float, np.ndarray, np.ndarray]]  # (t, acc, gyr)
    points: np.ndarray                 # (N, 4): x, y, z, t_abs
    image: Optional[np.ndarray] = None


class _PointBuffer:
    """FIFO over chunked (N, 4) point arrays with absolute timestamps."""

    def __init__(self):
        self._chunks: deque = deque()
        self._offset = 0  # consumed rows of the first chunk
        self.size = 0

    def push(self, pts: np.ndarray):
        if pts.shape[0]:
            self._chunks.append(np.asarray(pts, np.float64))
            self.size += pts.shape[0]

    @property
    def empty(self) -> bool:
        return self.size == 0

    def front_time(self) -> float:
        return self._chunks[0][self._offset, 3]

    def back_time(self) -> float:
        return self._chunks[-1][-1, 3]

    def pop_until(self, t: float) -> np.ndarray:
        """Pop and return all points with timestamp < t (stream order)."""
        out = []
        while self._chunks:
            chunk = self._chunks[0]
            view = chunk[self._offset:]
            n = int(np.searchsorted(view[:, 3], t, side="left"))
            if n > 0:
                out.append(view[:n])
                self._offset += n
                self.size -= n
            if self._offset >= chunk.shape[0]:
                self._chunks.popleft()
                self._offset = 0
                continue
            if n < view.shape[0]:
                break
        if out:
            return np.concatenate(out, axis=0)
        return np.zeros((0, 4))


class SweepCutter:
    """Image-timestamp-aligned sweep reconstruction (getMeasurements port)."""

    def __init__(self, sweep_interval: float,
                 time_diff_enable: bool = False, time_diff: float = 0.0):
        self.sweep_interval = float(sweep_interval)
        self.points = _PointBuffer()
        self.imu: deque = deque()      # (t, acc, gyr)
        self.images: deque = deque()   # (t, image)
        self.last_get_measurement = -1.0
        self.last_time_imu = -1.0
        self.last_time_lidar = -1.0
        self.last_time_img = -1.0
        # IMU re-stamping when the IMU clock diverges from the LiDAR clock
        # (imuHandler, lioOptimization.cpp:609-611): IMU stamps are shifted
        # by `time_diff` when enabled and |time_diff| > 0.1 s.  NOTE: the
        # reference never assigns its global `time_diff` (it stays 0.0,
        # utility.cpp:7), so the branch is latent there too; here the
        # offset is a real input for drivers that measure it.
        self.time_diff_enable = bool(time_diff_enable)
        self.time_diff = float(time_diff)

    # -- ingest (the ROS handler equivalents, with monotonicity asserts) ----
    def push_points(self, pts: np.ndarray):
        if pts.shape[0] == 0:
            return
        assert pts[-1, 3] >= self.last_time_lidar, "non-monotonic lidar time"
        self.last_time_lidar = float(pts[-1, 3])
        self.points.push(pts)

    def push_imu(self, t: float, acc: np.ndarray, gyr: np.ndarray):
        if self.time_diff_enable and abs(self.time_diff) > 0.1:
            t = t + self.time_diff
        assert t > self.last_time_imu, "non-monotonic IMU time"
        self.imu.append((float(t), np.asarray(acc, np.float64),
                         np.asarray(gyr, np.float64)))
        self.last_time_imu = float(t)
        if self.last_get_measurement < 0:
            self.last_get_measurement = float(t)

    def push_image(self, t: float, image: Optional[np.ndarray]):
        assert t > self.last_time_img, "non-monotonic image time"
        self.images.append((float(t), image))
        self.last_time_img = float(t)

    # -- sweep extraction ---------------------------------------------------
    def get(self) -> Optional[Measurement]:
        """Produce at most one sweep (one iteration of getMeasurements)."""
        while True:
            if not self.imu or not self.images or self.points.empty:
                return None
            img_t = self.images[0][0]
            if not (self.points.back_time() > img_t):
                return None
            if not (self.points.front_time() < img_t):
                self.images.popleft()
                continue
            if not (self.imu[-1][0] > img_t):
                return None
            if not (self.imu[0][0] < img_t):
                self.images.popleft()
                continue

            interval = self.sweep_interval
            if self.last_get_measurement + interval < img_t - 0.5 * interval:
                # Gap-fill sweep: images are lagging; cut one nominal
                # interval without an image (lioOptimization.cpp:707-740).
                cut_t = self.last_get_measurement + interval
                imu_meas = self._cut_imu(cut_t)
                pts = self.points.pop_until(cut_t)
                meas = Measurement(
                    time_image=cut_t,
                    time_sweep_begin=self.last_get_measurement,
                    duration=interval, rendering=False,
                    imu=imu_meas, points=pts)
                self.last_get_measurement = cut_t
                return meas if pts.shape[0] > 0 else self.get()
            else:
                # Image-aligned sweep (lioOptimization.cpp:741-780).
                img_t, image = self.images.popleft()
                imu_meas = self._cut_imu(img_t)
                pts = self.points.pop_until(img_t)
                meas = Measurement(
                    time_image=img_t,
                    time_sweep_begin=self.last_get_measurement,
                    duration=img_t - self.last_get_measurement,
                    rendering=True, imu=imu_meas, points=pts, image=image)
                self.last_get_measurement = img_t
                return meas if pts.shape[0] > 0 else self.get()

    def _cut_imu(self, t: float):
        out = []
        while self.imu and self.imu[0][0] < t:
            out.append(self.imu.popleft())
        if self.imu:
            out.append(self.imu[0])  # boundary sample stays queued
        return out


@dataclass
class PreparedSweep:
    """Numpy-side padded arrays ready to become a SweepInput."""
    raw_pts: np.ndarray
    t_rel: np.ndarray
    pt_valid: np.ndarray
    imu_t: np.ndarray
    imu_dt: np.ndarray
    imu_acc: np.ndarray
    imu_gyr: np.ndarray
    imu_valid: np.ndarray
    new_current_time: float
    n_points: int
    n_imu: int


def interpolate_imu(meas: Measurement, current_time: float
                    ) -> List[Tuple[float, float, np.ndarray, np.ndarray]]:
    """Per-sample (dt, t, acc, gyr) with the boundary sample interpolated to
    the exact sweep end (run(), lioOptimization.cpp:1503-1570)."""
    time_frame = meas.time_image
    out = []
    prev_acc = prev_gyr = None
    for (t, acc, gyr) in meas.imu:
        if t <= time_frame:
            dt = t - current_time
            if dt < -1e-6:
                continue
            current_time = t
            out.append((max(dt, 0.0), t, acc, gyr))
            prev_acc, prev_gyr = acc, gyr
        else:
            dt_1 = time_frame - current_time
            dt_2 = t - time_frame
            if dt_1 + dt_2 <= 0:
                continue
            w1 = dt_2 / (dt_1 + dt_2)
            w2 = dt_1 / (dt_1 + dt_2)
            if prev_acc is None:
                prev_acc, prev_gyr = acc, gyr
            acc_i = w1 * prev_acc + w2 * acc
            gyr_i = w1 * prev_gyr + w2 * gyr
            current_time = time_frame
            out.append((max(dt_1, 0.0), time_frame, acc_i, gyr_i))
            prev_acc, prev_gyr = acc_i, gyr_i
    return out, current_time


def _prepare_imu_pack(meas: Measurement, current_time: float, sh
                      ) -> Tuple[np.ndarray, float, int]:
    """Padded (max_imu_samples, 9) float32 IMU pack
    [t_rel, dt, acc(3), gyr(3), valid] + (new_current_time, n_imu)."""
    samples, new_time = interpolate_imu(meas, current_time)
    n_imu = len(samples)
    if n_imu > sh.max_imu_samples:
        raise ValueError(
            f"sweep has {n_imu} IMU samples > max_imu_samples="
            f"{sh.max_imu_samples}; raise ShapeOptions.max_imu_samples")
    begin = meas.time_sweep_begin
    pack = np.zeros((sh.max_imu_samples, 9), np.float32)
    for i, (dt, t, acc, gyr) in enumerate(samples):
        row = pack[i]
        row[0] = t - begin
        row[1] = dt
        row[2:5] = acc
        row[5:8] = gyr
        row[8] = 1.0
    return pack, new_time, n_imu


def prepare_sweep(meas: Measurement, current_time: float,
                  cfg: LivoConfig) -> PreparedSweep:
    sh = cfg.shapes
    begin = meas.time_sweep_begin

    pack, new_time, n_imu = _prepare_imu_pack(meas, current_time, sh)
    imu_t = pack[:, 0].copy()
    imu_dt = pack[:, 1].copy()
    imu_acc = pack[:, 2:5].copy()
    imu_gyr = pack[:, 5:8].copy()
    imu_valid = pack[:, 8] > 0.5

    pts = meas.points
    # Keep points inside [begin, end] (makePointTimestamp drop semantics).
    sel = (pts[:, 3] >= begin) & (pts[:, 3] <= meas.time_image)
    pts = pts[sel]
    n = pts.shape[0]
    if n > sh.max_sweep_points:
        # Deterministic stride decimation on overflow.
        stride_idx = np.linspace(0, n - 1, sh.max_sweep_points).astype(int)
        pts = pts[stride_idx]
        n = pts.shape[0]
    raw = np.zeros((sh.max_sweep_points, 3), np.float32)
    t_rel = np.zeros(sh.max_sweep_points, np.float32)
    valid = np.zeros(sh.max_sweep_points, bool)
    raw[:n] = pts[:, :3]
    t_rel[:n] = pts[:, 3] - begin
    valid[:n] = True

    return PreparedSweep(raw_pts=raw, t_rel=t_rel, pt_valid=valid,
                         imu_t=imu_t, imu_dt=imu_dt, imu_acc=imu_acc,
                         imu_gyr=imu_gyr, imu_valid=imu_valid,
                         new_current_time=new_time, n_points=n, n_imu=n_imu)


# Wire quantization: host->device bandwidth is the scarce resource on a
# tunneled TPU, so the point payload crosses the link as int16.  xyz are
# scaled by a per-sweep dynamic scale (range/32000 — ~3 mm at 100 m, an
# order of magnitude below LiDAR ranging noise); per-point time becomes a
# [0, 32000] fraction of the sweep duration (~3 us resolution).  alpha=-1
# marks padding, so the separate validity mask disappears from the wire.
WIRE_QMAX = 32000.0


@dataclass
class PackedSweepWire:
    """int16 wire payload for one sweep (see odometry.WireSweep)."""
    pts_q: np.ndarray      # (N, 4) int16: x, y, z (x scale), alpha; -1 pad
    scale: float           # meters per quantum
    duration: float        # seconds (alpha -> t_rel factor)


def pack_sweep(prep: PreparedSweep, duration: float) -> PackedSweepWire:
    n = prep.n_points
    duration = max(float(duration), 1e-6)
    # Robust scale: one spurious long-range return must not coarsen the
    # quanta for the whole sweep, so use the 99.9th percentile of |xyz|
    # and saturate the (rare) points beyond it at the int16 edge.
    if n:
        abs_xyz = np.abs(prep.raw_pts[:n])
        max_abs = float(np.percentile(abs_xyz, 99.9))
        if max_abs <= 0.0:
            max_abs = float(np.max(abs_xyz))
    else:
        max_abs = 1.0
    scale = max(max_abs, 1e-6) / WIRE_QMAX
    pts_q = np.full((prep.raw_pts.shape[0], 4), -1, np.int16)
    pts_q[:n, :3] = np.clip(np.round(prep.raw_pts[:n] / scale),
                            -32767, 32767)
    pts_q[:n, 3] = np.clip(
        np.round(prep.t_rel[:n] / duration * WIRE_QMAX), 0, WIRE_QMAX)
    return PackedSweepWire(pts_q=pts_q, scale=scale, duration=duration)


def prepare_sweep_wire(meas: Measurement, current_time: float,
                       cfg: LivoConfig
                       ) -> Tuple[np.ndarray, PackedSweepWire, float, int]:
    """Wire-mode host prep in one pass: (imu_pack (M, 9) f32, wire,
    new_current_time, n_points).

    The point side (window + stride decimation + robust scale + int16
    quantization) runs in GIL-released native C++ when available
    (native.prepare_pack), skipping the padded float32 intermediate
    `prepare_sweep` builds — the hot host cost of the per-frame path.
    Falls back to prepare_sweep + pack_sweep (same semantics, numpy)."""
    sh = cfg.shapes
    imu_pack, new_time, _n_imu = _prepare_imu_pack(meas, current_time, sh)
    duration = max(float(meas.duration), 1e-6)
    from sr_livo_tpu.runtime import native
    res = native.prepare_pack(meas.points, meas.time_sweep_begin,
                              meas.time_image, duration,
                              sh.max_sweep_points)
    if res is None:
        prep = prepare_sweep(meas, current_time, cfg)
        wire = pack_sweep(prep, meas.duration)
        return imu_pack, wire, new_time, prep.n_points
    pts_q, scale, k = res
    return (imu_pack,
            PackedSweepWire(pts_q=pts_q, scale=scale, duration=duration),
            new_time, k)

"""ctypes binding for the native ingest library (native/livo_native.cpp).

Builds the shared library on demand with g++ (cached next to the source);
all entry points have pure-numpy fallbacks so the engine runs without a
toolchain, just slower on the ingest path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "livo_native.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "liblivo_native.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _SO, _SRC, "-ldl"],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        c = ctypes
        lib.livo_decode_xyzt.restype = c.c_int
        lib.livo_decode_xyzt.argtypes = [
            c.c_char_p, c.c_long, c.c_long, c.c_long, c.c_long, c.c_long,
            c.c_long, c.c_int, c.c_double, c.c_double,
            c.POINTER(c.c_float)]
        lib.livo_decode_ring.restype = c.c_int
        lib.livo_decode_ring.argtypes = [
            c.c_char_p, c.c_long, c.c_long, c.c_long, c.c_int,
            c.POINTER(c.c_int32)]
        lib.livo_process_spinning.restype = c.c_int
        lib.livo_process_spinning.argtypes = [
            c.POINTER(c.c_float), c.POINTER(c.c_int32), c.c_long, c.c_int,
            c.c_int, c.c_int, c.c_double, c.c_double, c.c_int,
            c.POINTER(c.c_double), c.POINTER(c.c_double)]
        lib.livo_process_livox.restype = c.c_int
        lib.livo_process_livox.argtypes = [
            c.POINTER(c.c_float), c.c_char_p, c.c_char_p,
            c.POINTER(c.c_uint32), c.c_long, c.c_int, c.c_int, c.c_double,
            c.c_double, c.POINTER(c.c_double), c.POINTER(c.c_double)]
        lib.livo_remap_u8.restype = c.c_int
        lib.livo_remap_u8.argtypes = [
            c.POINTER(c.c_uint8), c.c_long, c.c_long, c.c_long,
            c.POINTER(c.c_float), c.c_long, c.c_long, c.POINTER(c.c_uint8)]
        lib.livo_prepare_pack.restype = c.c_int
        lib.livo_prepare_pack.argtypes = [
            c.POINTER(c.c_double), c.c_long, c.c_double, c.c_double,
            c.c_double, c.c_long, c.POINTER(c.c_int16),
            c.POINTER(c.c_double)]
        lib.livo_bag_open.restype = c.c_void_p
        lib.livo_bag_open.argtypes = [c.c_char_p]
        lib.livo_bag_next.restype = c.c_int
        lib.livo_bag_next.argtypes = [
            c.c_void_p, c.POINTER(c.c_int32), c.POINTER(c.c_double),
            c.POINTER(c.POINTER(c.c_uint8)), c.POINTER(c.c_long)]
        lib.livo_bag_topic.restype = c.c_char_p
        lib.livo_bag_topic.argtypes = [c.c_void_p, c.c_int32]
        lib.livo_bag_type.restype = c.c_char_p
        lib.livo_bag_type.argtypes = [c.c_void_p, c.c_int32]
        lib.livo_bag_error.restype = c.c_char_p
        lib.livo_bag_error.argtypes = [c.c_void_p]
        lib.livo_bag_close.restype = None
        lib.livo_bag_close.argtypes = [c.c_void_p]
        _LIB = lib
        return _LIB


# ---------------------------------------------------------------------------
# Decoders (native with numpy fallback)
# ---------------------------------------------------------------------------

def remap_u8(src: np.ndarray, map_uv: np.ndarray) -> np.ndarray:
    """Bilinear remap of a uint8 (H, W, C) image by a float32 (dh, dw, 2)
    source-coordinate map — the host-side cv::remap equivalent
    (imageProcessing.cpp:120 with the :118 resize composed in).

    Runs in native C++ when available (the gather pattern is the slowest
    op class on TPU; on the host it overlaps device compute)."""
    src = np.ascontiguousarray(src)
    if src.ndim == 2:
        src = src[..., None]
    sh, sw, ch = src.shape
    dh, dw = map_uv.shape[0], map_uv.shape[1]
    lib = get_lib()
    if lib is not None and src.dtype == np.uint8:
        m32 = np.ascontiguousarray(map_uv, np.float32)
        out = np.empty((dh, dw, ch), np.uint8)
        rc = lib.livo_remap_u8(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            sh, sw, ch,
            m32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dh, dw,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc == 0:
            return out if ch > 1 else out[..., 0]
    # numpy fallback (vectorized)
    u = np.clip(map_uv[..., 0], 0.0, sw - 1.001)
    v = np.clip(map_uv[..., 1], 0.0, sh - 1.001)
    u0 = u.astype(np.int32)
    v0 = v.astype(np.int32)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    p00 = src[v0, u0].astype(np.float32)
    p01 = src[v0, u0 + 1].astype(np.float32)
    p10 = src[v0 + 1, u0].astype(np.float32)
    p11 = src[v0 + 1, u0 + 1].astype(np.float32)
    out = ((1 - fv) * (1 - fu) * p00 + (1 - fv) * fu * p01
           + fv * (1 - fu) * p10 + fv * fu * p11)
    if src.dtype == np.uint8:
        out = np.clip(out + 0.5, 0, 255).astype(np.uint8)
    else:
        out = out.astype(src.dtype)
    return out if ch > 1 else out[..., 0]

def prepare_pack(pts: np.ndarray, begin: float, t_end: float,
                 duration: float, max_points: int):
    """Fused sweep window + decimation + int16 wire pack (the numpy
    prepare_sweep + pack_sweep point path in one GIL-released C++ pass).
    Returns (pts_q (max_points, 4) int16, scale, n_points) or None when
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, np.float64)
    out_q = np.empty((max_points, 4), np.int16)
    scale = ctypes.c_double(0.0)
    k = lib.livo_prepare_pack(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        pts.shape[0], begin, t_end, duration, max_points,
        out_q.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.byref(scale))
    if k < 0:
        return None
    return out_q, scale.value, k


def decode_xyzt(data: bytes, n: int, step: int, off_x: int, off_y: int,
                off_z: int, off_t: int, t_dtype: int,
                time_unit_scale: float, t_base: float = 0.0) -> np.ndarray:
    """PointCloud2 payload -> (n, 4) float32 [x, y, z, t_rel_ms].

    `t_base` is subtracted from the decoded time in FLOAT64 before the
    f32 downcast — absolute epoch-scale stamps (robosense f64
    `timestamp`) quantize to ~0.125 ms if narrowed first (caught by the
    vendor-decode goldens, tests/test_vendor_golden.py)."""
    lib = get_lib()
    if lib is not None:
        out = np.empty((n, 4), np.float32)
        lib.livo_decode_xyzt(
            data, n, step, off_x, off_y, off_z, off_t, t_dtype,
            time_unit_scale, t_base,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    buf = np.frombuffer(data, np.uint8).reshape(n, step)
    out = np.empty((n, 4), np.float32)
    for j, off in enumerate((off_x, off_y, off_z)):
        out[:, j] = buf[:, off:off + 4].copy().view(np.float32)[:, 0]
    if t_dtype == 1:
        t = buf[:, off_t:off_t + 4].copy().view(np.float32)[:, 0]
    elif t_dtype == 2:
        t = buf[:, off_t:off_t + 8].copy().view(np.float64)[:, 0]
    elif t_dtype == 3:
        t = buf[:, off_t:off_t + 4].copy().view(np.uint32)[:, 0]
    else:
        t = np.zeros(n)
    out[:, 3] = (t - t_base) * time_unit_scale
    return out


def decode_ring(data: bytes, n: int, step: int, off_ring: int,
                ring_dtype: int) -> np.ndarray:
    lib = get_lib()
    if lib is not None:
        out = np.empty(n, np.int32)
        lib.livo_decode_ring(data, n, step, off_ring, ring_dtype,
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out
    buf = np.frombuffer(data, np.uint8).reshape(n, step)
    if ring_dtype == 1:
        return buf[:, off_ring].astype(np.int32)
    return buf[:, off_ring:off_ring + 2].copy().view(np.uint16)[:, 0] \
        .astype(np.int32)


def process_spinning(xyzt: np.ndarray, ring: Optional[np.ndarray],
                     n_scans: int, scan_rate: int, point_filter_num: int,
                     blind: float, header_time: float,
                     given_offset_time: bool, last_end_time: float
                     ) -> tuple:
    """Spinning-driver stream filter; returns (out (m,4) f64 abs-time,
    new_last_end_time)."""
    n = xyzt.shape[0]
    lib = get_lib()
    if lib is not None and n > 0:
        xyzt32 = np.ascontiguousarray(xyzt, np.float32)
        ring32 = (np.ascontiguousarray(ring, np.int32) if ring is not None
                  else None)
        out = np.empty((n, 4), np.float64)
        let = ctypes.c_double(last_end_time)
        m = lib.livo_process_spinning(
            xyzt32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ring32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            if ring32 is not None else None,
            n, n_scans, scan_rate, point_filter_num, blind, header_time,
            int(given_offset_time), ctypes.byref(let),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out[:m], let.value
    # numpy fallback
    t_rel = xyzt[:, 3].astype(np.float64)
    if not given_offset_time:
        omega = 0.361 * scan_rate
        yaw = np.degrees(np.arctan2(xyzt[:, 1], xyzt[:, 0]))
        t_rel = np.zeros(n)
        r = ring if ring is not None else np.zeros(n, np.int32)
        for layer in range(n_scans):
            sel = np.nonzero(r == layer)[0]
            if len(sel) == 0:
                continue
            y0 = yaw[sel[0]]
            d = np.where(yaw[sel] <= y0, y0 - yaw[sel], y0 - yaw[sel] + 360.0)
            d[0] = 0.0
            t_rel[sel] = d / omega
    order = np.argsort(t_rel, kind="stable")
    dt_last = t_rel[order[-1]] if n else 0.0
    keep = np.zeros(n, bool)
    keep[order[::max(point_filter_num, 1)]] = True
    rr = np.einsum("ij,ij->i", xyzt[:, :3], xyzt[:, :3])
    ts = header_time + t_rel / 1000.0
    keep &= (rr > blind * blind) & (ts > last_end_time)
    sel = order[keep[order]]
    out = np.concatenate([xyzt[sel, :3].astype(np.float64),
                          ts[sel, None]], axis=1)
    return out, header_time + dt_last / 1000.0


def process_livox(xyz: np.ndarray, tag: np.ndarray, line: np.ndarray,
                  offset_ns: np.ndarray, n_scans: int, point_filter_num: int,
                  blind: float, header_time: float, last_end_time: float
                  ) -> tuple:
    n = xyz.shape[0]
    lib = get_lib()
    if lib is not None and n > 0:
        xyz32 = np.ascontiguousarray(xyz, np.float32)
        out = np.empty((n, 4), np.float64)
        let = ctypes.c_double(last_end_time)
        m = lib.livo_process_livox(
            xyz32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            np.ascontiguousarray(tag, np.uint8).tobytes(),
            np.ascontiguousarray(line, np.uint8).tobytes(),
            np.ascontiguousarray(offset_ns, np.uint32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint32)),
            n, n_scans, point_filter_num, blind, header_time,
            ctypes.byref(let),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out[:m], let.value
    # numpy fallback mirroring livoxHandler (cloudProcessing.cpp:125-214)
    if n == 0:
        return np.zeros((0, 4)), last_end_time
    i = np.arange(1, n)
    ok = (line[i] < n_scans) & (np.abs(xyz[i]) <= 1e8).all(axis=-1) \
        & (xyz[i, 0] > 0.7)
    bad_tag = ((tag[i] & 0x03) != 0) | ((tag[i] & 0x0C) != 0)
    ok &= ~((xyz[i, 0] > 2.0) & bad_tag)
    dup = np.all(np.abs(xyz[i] - xyz[i - 1]) <= 1e-7, axis=-1)
    ok &= ~dup
    sel = i[ok]
    t_ms = offset_ns[sel].astype(np.float64) * 1e-6
    order = np.argsort(t_ms, kind="stable")
    sel, t_ms = sel[order], t_ms[order]
    dt_last = t_ms[-1] if len(t_ms) else 0.0
    num_valid = np.arange(1, len(sel) + 1)
    keep = (num_valid % max(point_filter_num, 1)) == 0 \
        if point_filter_num > 1 else np.ones(len(sel), bool)
    rr = np.einsum("ij,ij->i", xyz[sel], xyz[sel])
    keep &= rr > blind * blind
    out = np.concatenate([
        xyz[sel[keep]].astype(np.float64),
        (header_time + t_ms[keep] / 1000.0)[:, None]], axis=1)
    return out, header_time + dt_last / 1000.0


class BagReader:
    """Minimal ROS1 v2.0 bag reader over the native library."""

    def __init__(self, path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable (g++ build failed)")
        self._lib = lib
        self._h = lib.livo_bag_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open bag: {path}")

    def __iter__(self):
        c = ctypes
        conn = c.c_int32()
        t = c.c_double()
        data = c.POINTER(c.c_uint8)()
        ln = c.c_long()
        while True:
            rc = self._lib.livo_bag_next(self._h, c.byref(conn), c.byref(t),
                                         c.byref(data), c.byref(ln))
            if rc == 0:
                return
            if rc < 0:
                raise IOError("bag read error: "
                              + self._lib.livo_bag_error(self._h).decode())
            topic = self._lib.livo_bag_topic(self._h, conn.value).decode()
            msg_type = self._lib.livo_bag_type(self._h, conn.value).decode()
            payload = ctypes.string_at(data, ln.value)
            yield topic, msg_type, t.value, payload

    def close(self):
        if self._h:
            self._lib.livo_bag_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

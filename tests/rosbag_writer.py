"""Minimal ROS1 bag v2.0 writer — test fixture for the native reader.

Writes structurally-valid bags (bag header record + chunks containing
connection + message-data records) with optional bz2/lz4 chunk
compression, plus serializers for the message types the engine ingests.
"""

from __future__ import annotations

import bz2
import struct
from typing import List, Optional, Tuple

import numpy as np


def _header(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        if isinstance(v, int):
            v = struct.pack("<i", v) if k in ("conn",) else struct.pack("<I", v)
        elif isinstance(v, str):
            v = v.encode()
        field = k.encode() + b"=" + v
        out += struct.pack("<I", len(field)) + field
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _op(code: int) -> bytes:
    return struct.pack("<B", code)


def ros_time(t: float) -> bytes:
    sec = int(t)
    nsec = int(round((t - sec) * 1e9))
    return struct.pack("<II", sec, nsec)


class BagWriter:
    def __init__(self, path: str, compression: str = "none"):
        self.path = path
        self.compression = compression
        self.connections = {}     # topic -> (conn_id, type, conn_record)
        self.messages = []        # (conn_id, time, payload)

    def add_connection(self, topic: str, msg_type: str) -> int:
        if topic in self.connections:
            return self.connections[topic][0]
        cid = len(self.connections)
        conn_header = _header({"topic": topic, "type": msg_type,
                               "md5sum": "0" * 32,
                               "message_definition": ""})
        rec = _record({"op": _op(0x07), "conn": cid, "topic": topic},
                      conn_header)
        self.connections[topic] = (cid, msg_type, rec)
        return cid

    def write_message(self, topic: str, msg_type: str, t: float,
                      payload: bytes):
        cid = self.add_connection(topic, msg_type)
        self.messages.append((cid, t, payload))

    # Real rosbags chunk at ~768 KB-4 MB; a single giant chunk would also
    # trip the reader's fuzz-hardening record-size cap on long sequences
    # (native MAX_RECORD_LEN) — and hour-scale bags would not fit in RAM
    # as one bytes object anyway.
    CHUNK_TARGET = 8 << 20

    def close(self):
        chunks = []
        chunk = b"".join(c[2] for c in self.connections.values())
        for (cid, t, payload) in self.messages:
            sec = int(t)
            nsec = int(round((t - sec) * 1e9))
            time64 = struct.pack("<Q", (nsec << 32) | sec)
            chunk += _record({"op": _op(0x02), "conn": cid, "time": time64},
                             payload)
            if len(chunk) >= self.CHUNK_TARGET:
                chunks.append(chunk)
                chunk = b""
        if chunk:
            chunks.append(chunk)

        with open(self.path, "wb") as f:
            f.write(b"#ROSBAG V2.0\n")
            # bag header record (op 0x03), padded like real bags
            bh = _record({"op": _op(0x03),
                          "index_pos": struct.pack("<Q", 0),
                          "conn_count": len(self.connections),
                          "chunk_count": len(chunks)},
                         b" " * 4096)
            f.write(bh)
            for chunk in chunks:
                if self.compression == "bz2":
                    comp_data = bz2.compress(chunk)
                elif self.compression == "none":
                    comp_data = chunk
                else:
                    raise ValueError(self.compression)
                f.write(_record(
                    {"op": _op(0x05), "compression": self.compression,
                     "size": len(chunk)}, comp_data))


# ---- message serializers (inverse of runtime.drivers parsers) ----------

def ser_header(stamp: float, frame_id: str = "f") -> bytes:
    sec = int(stamp)
    nsec = int(round((stamp - sec) * 1e9))
    fid = frame_id.encode()
    return struct.pack("<III", 0, sec, nsec) + struct.pack("<I", len(fid)) + fid


def ser_imu(stamp: float, acc, gyr) -> bytes:
    out = ser_header(stamp)
    out += struct.pack("<4d", 0, 0, 0, 1) + struct.pack("<9d", *([0] * 9))
    out += struct.pack("<3d", *gyr) + struct.pack("<9d", *([0] * 9))
    out += struct.pack("<3d", *acc) + struct.pack("<9d", *([0] * 9))
    return out


def ser_pointcloud2_velodyne(stamp: float, xyz: np.ndarray,
                             time_s: np.ndarray, ring: np.ndarray) -> bytes:
    """velodyne_ros::Point layout: x, y, z, intensity f32 @0,4,8,12;
    ring u16 @16; time f32 @18 (packed)."""
    n = xyz.shape[0]
    step = 22
    data = np.zeros((n, step), np.uint8)
    data[:, 0:12] = xyz.astype(np.float32).view(np.uint8).reshape(n, 12)
    data[:, 12:16] = np.zeros((n, 4), np.uint8)
    data[:, 16:18] = ring.astype(np.uint16).view(np.uint8).reshape(n, 2)
    data[:, 18:22] = time_s.astype(np.float32).view(np.uint8).reshape(n, 4)
    payload = data.tobytes()

    out = ser_header(stamp)
    out += struct.pack("<II", 1, n)
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1),
              ("intensity", 12, 7, 1), ("ring", 16, 4, 1), ("time", 18, 7, 1)]
    out += struct.pack("<I", len(fields))
    for (name, off, dt, cnt) in fields:
        nm = name.encode()
        out += struct.pack("<I", len(nm)) + nm
        out += struct.pack("<IBI", off, dt, cnt)
    out += struct.pack("<B", 0)
    out += struct.pack("<II", step, step * n)
    out += struct.pack("<I", len(payload)) + payload
    out += struct.pack("<B", 1)
    return out


def _ser_pointcloud2(stamp: float, step: int, fields, data: np.ndarray
                     ) -> bytes:
    """Generic PointCloud2 serializer from a packed (n, step) uint8 array.
    `fields` = [(name, offset, datatype, count), ...] (PointField codes:
    2=u8, 4=u16, 6=u32, 7=f32, 8=f64)."""
    n = data.shape[0]
    payload = data.tobytes()
    out = ser_header(stamp)
    out += struct.pack("<II", 1, n)
    out += struct.pack("<I", len(fields))
    for (name, off, dt, cnt) in fields:
        nm = name.encode()
        out += struct.pack("<I", len(nm)) + nm
        out += struct.pack("<IBI", off, dt, cnt)
    out += struct.pack("<B", 0)
    out += struct.pack("<II", step, step * n)
    out += struct.pack("<I", len(payload)) + payload
    out += struct.pack("<B", 1)
    return out


def ser_pointcloud2_ouster(stamp: float, xyz: np.ndarray,
                           t_ns: np.ndarray, ring: np.ndarray) -> bytes:
    """ouster_ros::Point layout (cloudProcessing.h Ouster struct): x, y, z,
    intensity f32 @0,4,8,12; t u32 ns @16; reflectivity u16 @20;
    ring u8 @22 (packed)."""
    n = xyz.shape[0]
    step = 23
    data = np.zeros((n, step), np.uint8)
    data[:, 0:12] = xyz.astype(np.float32).view(np.uint8).reshape(n, 12)
    data[:, 16:20] = t_ns.astype(np.uint32).view(np.uint8).reshape(n, 4)
    data[:, 22] = ring.astype(np.uint8)
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1),
              ("intensity", 12, 7, 1), ("t", 16, 6, 1),
              ("reflectivity", 20, 4, 1), ("ring", 22, 2, 1)]
    return _ser_pointcloud2(stamp, step, fields, data)


def ser_pointcloud2_robosense(stamp: float, xyz: np.ndarray,
                              timestamp_abs_s: np.ndarray,
                              ring: np.ndarray) -> bytes:
    """robosense_ros::Point layout (cloudProcessing.h Robosense struct):
    x, y, z, intensity f32 @0,4,8,12; ring u16 @16; timestamp f64 absolute
    seconds @18 (packed)."""
    n = xyz.shape[0]
    step = 26
    data = np.zeros((n, step), np.uint8)
    data[:, 0:12] = xyz.astype(np.float32).view(np.uint8).reshape(n, 12)
    data[:, 16:18] = ring.astype(np.uint16).view(np.uint8).reshape(n, 2)
    data[:, 18:26] = (timestamp_abs_s.astype(np.float64)
                      .view(np.uint8).reshape(n, 8))
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1),
              ("intensity", 12, 7, 1), ("ring", 16, 4, 1),
              ("timestamp", 18, 8, 1)]
    return _ser_pointcloud2(stamp, step, fields, data)


def ser_livox_custom(stamp: float, xyz: np.ndarray, tag: np.ndarray,
                     line: np.ndarray, offset_ns: np.ndarray) -> bytes:
    n = xyz.shape[0]
    out = ser_header(stamp)
    out += struct.pack("<Q", int(stamp * 1e9))
    out += struct.pack("<I", n)
    out += struct.pack("<B", 0) + b"\x00" * 3
    out += struct.pack("<I", n)
    rec = np.zeros((n, 19), np.uint8)
    rec[:, 0:4] = offset_ns.astype(np.uint32).view(np.uint8).reshape(n, 4)
    rec[:, 4:16] = xyz.astype(np.float32).view(np.uint8).reshape(n, 12)
    rec[:, 16] = 100
    rec[:, 17] = tag
    rec[:, 18] = line
    return out + rec.tobytes()


def ser_image_rgb8(stamp: float, img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    out = ser_header(stamp)
    out += struct.pack("<II", h, w)
    enc = b"rgb8"
    out += struct.pack("<I", len(enc)) + enc
    out += struct.pack("<B", 0)
    out += struct.pack("<I", w * 3)
    payload = img.astype(np.uint8).tobytes()
    out += struct.pack("<I", len(payload)) + payload
    return out


def ser_compressed_image(stamp: float, img: np.ndarray,
                         fmt: str = "jpeg", quality: int = 92) -> bytes:
    """sensor_msgs/CompressedImage with a real JPEG/PNG payload (the
    r3live_compressed profile's image transport,
    lioOptimization.cpp:583-664 compressedImageHandler)."""
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(img.astype(np.uint8)).save(
        buf, format=fmt.upper(), **({"quality": quality}
                                    if fmt.lower() == "jpeg" else {}))
    payload = buf.getvalue()
    out = ser_header(stamp)
    enc = fmt.encode()
    out += struct.pack("<I", len(enc)) + enc
    out += struct.pack("<I", len(payload)) + payload
    return out

"""Generate tests/fixtures/vendor_decode_golden.npz — frozen vendor
message payloads + decoder outputs (VERDICT r4 #10).

Run ONCE; the fixture is committed.  The payload bytes are frozen so
any change to serialization OR decoding that alters bit-level behavior
fails the golden test; tests/test_vendor_golden.py additionally
hand-verifies spec-derived values so the golden is not self-referential.
"""
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from sr_livo_tpu.config import (LIDAR_LIVOX, LIDAR_OUSTER, LIDAR_ROBOSENSE,
                                LIDAR_VELODYNE, LivoConfig)
from sr_livo_tpu.runtime import drivers
from tests import rosbag_writer as rbw

rng = np.random.RandomState(0xF1C)
N = 96
STAMP = 1234.5


def _cfg(lidar_type, time_unit, filter_num=2, blind=0.5, n_scans=6,
         scan_rate=10):
    cfg = LivoConfig()
    lo = cfg.lidar_options
    lo.lidar_type = lidar_type
    lo.time_unit = time_unit
    lo.point_filter_num = filter_num
    lo.blind = blind
    lo.n_scans = n_scans
    lo.scan_rate = scan_rate
    return cfg


def _xyz():
    # points 1-8 m forward with a couple inside the blind radius
    xyz = np.c_[rng.uniform(1.0, 8.0, N), rng.uniform(-3, 3, N),
                rng.uniform(-1, 1, N)].astype(np.float32)
    xyz[7] = [0.2, 0.1, 0.0]        # inside blind
    xyz[23] = [0.3, -0.1, 0.1]      # inside blind
    return xyz


out = {}

# ---- Livox CustomMsg ------------------------------------------------
xyz = _xyz()
tag = np.zeros(N, np.uint8)
tag[5] = 0x01                       # bad tag -> dropped beyond 2 m
line = (np.arange(N) % 6).astype(np.uint8)
line[11] = 9                        # invalid line -> dropped
off_ns = (np.arange(N, dtype=np.uint64) * 100000).astype(np.uint32)
payload = rbw.ser_livox_custom(STAMP, xyz, tag, line, off_ns)
cfg = _cfg(LIDAR_LIVOX, 3, filter_num=1)
cp = drivers.CloudProcessing(cfg)
dec = cp.process_livox(drivers.parse_livox_custom(payload))
out.update(livox_payload=np.frombuffer(payload, np.uint8),
           livox_xyz=xyz, livox_tag=tag, livox_line=line,
           livox_off_ns=off_ns, livox_expected=dec,
           livox_last_end=np.float64(cp.last_end_time))

# ---- Ouster (uint32 t ns + ring) ------------------------------------
xyz = _xyz()
t_ns = (np.arange(N, dtype=np.uint64) * 1000000).astype(np.uint32)
ring = (np.arange(N) % 16).astype(np.uint8)
payload = rbw.ser_pointcloud2_ouster(STAMP, xyz, t_ns, ring)
cfg = _cfg(LIDAR_OUSTER, 3, filter_num=2, n_scans=16, scan_rate=20)
cp = drivers.CloudProcessing(cfg)
dec = cp.process_cloud(drivers.parse_pointcloud2(payload))
out.update(ouster_payload=np.frombuffer(payload, np.uint8),
           ouster_xyz=xyz, ouster_t_ns=t_ns, ouster_ring=ring,
           ouster_expected=dec,
           ouster_last_end=np.float64(cp.last_end_time))

# ---- Velodyne (float32 time s + ring) -------------------------------
xyz = _xyz()
t_s = (np.arange(N, dtype=np.float64) * 1e-4).astype(np.float32)
ring = (np.arange(N) % 16).astype(np.uint16)
payload = rbw.ser_pointcloud2_velodyne(STAMP, xyz, t_s, ring)
cfg = _cfg(LIDAR_VELODYNE, 0, filter_num=2, n_scans=16)
cp = drivers.CloudProcessing(cfg)
dec = cp.process_cloud(drivers.parse_pointcloud2(payload))
out.update(velodyne_payload=np.frombuffer(payload, np.uint8),
           velodyne_xyz=xyz, velodyne_t_s=t_s,
           velodyne_expected=dec,
           velodyne_last_end=np.float64(cp.last_end_time))

# ---- Robosense (float64 absolute timestamp) -------------------------
xyz = _xyz()
t_abs = STAMP + np.arange(N, dtype=np.float64) * 1e-4
ring = (np.arange(N) % 16).astype(np.uint16)
payload = rbw.ser_pointcloud2_robosense(STAMP, xyz, t_abs, ring)
cfg = _cfg(LIDAR_ROBOSENSE, 0, filter_num=2, n_scans=16)
cp = drivers.CloudProcessing(cfg)
dec = cp.process_cloud(drivers.parse_pointcloud2(payload))
out.update(robosense_payload=np.frombuffer(payload, np.uint8),
           robosense_xyz=xyz, robosense_t_abs=t_abs,
           robosense_expected=dec,
           robosense_last_end=np.float64(cp.last_end_time))

dst = os.path.join(ROOT, "tests", "fixtures")
os.makedirs(dst, exist_ok=True)
np.savez(os.path.join(dst, "vendor_decode_golden.npz"), **out)
for k in ("livox", "ouster", "velodyne", "robosense"):
    print(k, out[f"{k}_expected"].shape, out[f"{k}_expected"][:2])
print("written", os.path.join(dst, "vendor_decode_golden.npz"))

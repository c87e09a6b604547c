"""Golden vendor-decode fixtures (VERDICT r4 #10).

Frozen message payload bytes + frozen decoder outputs for each vendor
driver (Livox CustomMsg, Ouster, Velodyne, Robosense — reference
decoders at cloudProcessing.cpp:125-541).  The native C++ path and the
numpy fallback must both reproduce the goldens BIT-EXACTLY, and a set
of spec-derived hand checks keeps the goldens from being merely
self-referential (generator: dev/make_vendor_goldens.py)."""
import os

import numpy as np
import pytest

from sr_livo_tpu.config import (LIDAR_LIVOX, LIDAR_OUSTER, LIDAR_ROBOSENSE,
                                LIDAR_VELODYNE, LivoConfig)
from sr_livo_tpu.runtime import drivers, native

FIX = os.path.join(os.path.dirname(__file__), "fixtures",
                   "vendor_decode_golden.npz")
STAMP = 1234.5


@pytest.fixture(scope="module")
def gold():
    return np.load(FIX)


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


def _decode(gold, vendor, force_numpy):
    cfgs = {
        "livox": _cfg(LIDAR_LIVOX, 3, filter_num=1),
        "ouster": _cfg(LIDAR_OUSTER, 3, filter_num=2, n_scans=16,
                       scan_rate=20),
        "velodyne": _cfg(LIDAR_VELODYNE, 0, filter_num=2, n_scans=16),
        "robosense": _cfg(LIDAR_ROBOSENSE, 0, filter_num=2, n_scans=16),
    }
    payload = gold[f"{vendor}_payload"].tobytes()
    cp = drivers.CloudProcessing(cfgs[vendor])
    saved = (native._LIB, native._TRIED)
    try:
        if force_numpy:
            native._LIB, native._TRIED = None, True
        if vendor == "livox":
            out = cp.process_livox(drivers.parse_livox_custom(payload))
        else:
            out = cp.process_cloud(drivers.parse_pointcloud2(payload))
    finally:
        native._LIB, native._TRIED = saved
    return out, cp.last_end_time


@pytest.mark.parametrize("vendor", ["livox", "ouster", "velodyne",
                                    "robosense"])
@pytest.mark.parametrize("path", ["native", "numpy"])
def test_decoder_matches_golden(gold, vendor, path):
    if path == "native" and native.get_lib() is None:
        pytest.skip("native library unavailable")
    out, last_end = _decode(gold, vendor, force_numpy=(path == "numpy"))
    exp = gold[f"{vendor}_expected"]
    np.testing.assert_array_equal(out, exp)
    assert last_end == float(gold[f"{vendor}_last_end"])


def test_livox_spec_hand_checks(gold):
    """Spec-derived checks (livoxHandler, cloudProcessing.cpp:125-214):
    every output row must be an input point with t = stamp + offset_ns
    * 1e-9; blind-radius points, invalid lines, and bad-tag points
    beyond 2 m are absent; the first input point is always skipped
    (the reference loop starts at i=1)."""
    xyz = gold["livox_xyz"].astype(np.float64)
    off = gold["livox_off_ns"].astype(np.float64)
    exp = gold["livox_expected"]
    # map each output row back to its source index by matching xyz
    src = []
    for row in exp:
        d = np.linalg.norm(xyz - row[:3], axis=1)
        k = int(np.argmin(d))
        assert d[k] < 1e-6
        src.append(k)
    src = np.array(src)
    assert 0 not in src                       # loop starts at i=1
    assert 7 not in src and 23 not in src     # blind radius
    assert 11 not in src                      # invalid line
    assert 5 not in src                       # bad tag beyond 2 m
    np.testing.assert_allclose(exp[:, 3], STAMP + off[src] * 1e-9,
                               rtol=0, atol=1e-9)


def test_ouster_spec_hand_checks(gold):
    """Ouster rows carry t = stamp + t_ns*1e-9 (TIME_UNIT ns) and honor
    the stream-order point_filter_num=2 decimation + blind filter
    (ousterHandler, cloudProcessing.cpp:216-323)."""
    xyz = gold["ouster_xyz"].astype(np.float64)
    t_ns = gold["ouster_t_ns"].astype(np.float64)
    exp = gold["ouster_expected"]
    src = []
    for row in exp:
        d = np.linalg.norm(xyz - row[:3], axis=1)
        k = int(np.argmin(d))
        assert d[k] < 1e-6
        src.append(k)
    src = np.array(src)
    np.testing.assert_allclose(exp[:, 3], STAMP + t_ns[src] * 1e-9,
                               rtol=0, atol=1e-9)
    assert 7 not in src and 23 not in src     # blind radius
    r2 = np.einsum("ij,ij->i", xyz, xyz)
    assert np.all(r2[src] > 0.5 * 0.5)


def test_robosense_relative_stamps(gold):
    """Robosense carries absolute f64 stamps; decode makes them relative
    to the first point then absolute against the header
    (cloudProcessing.cpp:477)."""
    exp = gold["robosense_expected"]
    t_abs = gold["robosense_t_abs"]
    # output times = header + (t_abs - t_abs[0]), a subset in order
    rel = exp[:, 3] - STAMP
    assert np.all(np.diff(rel) > 0)
    allowed = np.round((t_abs - t_abs[0]) * 1e6)
    got = np.round(rel * 1e6)
    assert np.all(np.isin(got, allowed))

"""Tests for the native ingest layer: bag reader, decoders, drivers."""
import numpy as np
import pytest

from sr_livo_tpu.config import (LIDAR_LIVOX, LIDAR_VELODYNE, LivoConfig)
from sr_livo_tpu.runtime import drivers, native
from tests import rosbag_writer as rbw

RNG = np.random.RandomState(21)


def test_native_library_builds():
    lib = native.get_lib()
    assert lib is not None, "g++ build of native/livo_native.cpp failed"


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_bag_roundtrip(tmp_path, compression):
    path = str(tmp_path / f"test_{compression}.bag")
    w = rbw.BagWriter(path, compression=compression)
    acc = np.array([0.1, 0.2, 9.8])
    gyr = np.array([0.01, -0.02, 0.03])
    w.write_message("/imu", "sensor_msgs/Imu", 10.0,
                    rbw.ser_imu(10.0, acc, gyr))
    img = RNG.randint(0, 255, (8, 12, 3)).astype(np.uint8)
    w.write_message("/cam", "sensor_msgs/Image", 10.01,
                    rbw.ser_image_rgb8(10.01, img))
    w.close()

    msgs = list(native.BagReader(path))
    assert len(msgs) == 2
    (t0, ty0, time0, p0), (t1, ty1, time1, p1) = msgs
    assert t0 == "/imu" and ty0 == "sensor_msgs/Imu"
    assert abs(time0 - 10.0) < 1e-6
    stamp, acc_r, gyr_r = drivers.parse_imu(p0)
    assert abs(stamp - 10.0) < 1e-6
    assert np.allclose(acc_r, acc)
    assert np.allclose(gyr_r, gyr)

    assert t1 == "/cam"
    stamp_i, img_r = drivers.parse_image(p1)
    assert np.array_equal(img_r, img)


def test_pointcloud2_parse_and_velodyne_driver():
    n = 64
    xyz = RNG.uniform(-10, 10, (n, 3)).astype(np.float32)
    # make some points inside the blind radius
    xyz[:5] *= 0.001
    time_s = np.linspace(0, 0.095, n).astype(np.float32)
    ring = (np.arange(n) % 16).astype(np.uint16)
    payload = rbw.ser_pointcloud2_velodyne(100.0, xyz, time_s, ring)
    pc = drivers.parse_pointcloud2(payload)
    assert pc.width == n and pc.point_step == 22
    assert set(pc.fields) == {"x", "y", "z", "intensity", "ring", "time"}

    cfg = LivoConfig()
    cfg.lidar_options.lidar_type = LIDAR_VELODYNE
    cfg.lidar_options.n_scans = 16
    cfg.lidar_options.time_unit = 0   # velodyne 'time' in seconds
    cfg.lidar_options.blind = 0.5
    cfg.lidar_options.point_filter_num = 1
    cp = drivers.CloudProcessing(cfg)
    out = cp.process_cloud(pc)
    # blind-filtered, absolute times, sorted
    assert out.shape[0] == n - 5
    assert np.all(np.diff(out[:, 3]) >= 0)
    assert abs(out[0, 3] - 100.0) < 0.2
    assert np.all(np.linalg.norm(out[:, :3], axis=-1) > 0.5)
    # monotonic gate: replaying an older message yields nothing new
    out2 = cp.process_cloud(pc)
    assert out2.shape[0] == 0


def test_velodyne_ring_time_synthesis():
    """No per-point time -> yaw-based synthesis (cloudProcessing.cpp:260)."""
    n_az, n_rings = 90, 4
    az = np.linspace(0, 2 * np.pi * 0.9, n_az)
    dirs = np.stack([np.cos(az), np.sin(az)], axis=-1)
    xyz = np.concatenate([
        np.c_[5 * dirs, np.full(n_az, ring * 0.1)]
        for ring in range(n_rings)]).astype(np.float32)
    ring = np.concatenate([np.full(n_az, r) for r in range(n_rings)])
    time_s = np.zeros(n_az * n_rings, np.float32)   # absent
    payload = rbw.ser_pointcloud2_velodyne(50.0, xyz, time_s,
                                           ring.astype(np.uint16))
    pc = drivers.parse_pointcloud2(payload)
    cfg = LivoConfig()
    cfg.lidar_options.lidar_type = LIDAR_VELODYNE
    cfg.lidar_options.n_scans = n_rings
    cfg.lidar_options.scan_rate = 10
    cfg.lidar_options.blind = 0.5
    cfg.lidar_options.point_filter_num = 1
    cp = drivers.CloudProcessing(cfg)
    out = cp.process_cloud(pc)
    assert out.shape[0] > 300
    spread = out[:, 3].max() - out[:, 3].min()
    # a 0.9-turn sweep at 10 Hz covers ~0.09 s
    assert 0.05 < spread < 0.12, spread


def test_livox_driver_filters():
    n = 200
    xyz = np.c_[RNG.uniform(1.0, 20.0, n), RNG.uniform(-5, 5, n),
                RNG.uniform(-2, 2, n)].astype(np.float32)
    tag = np.zeros(n, np.uint8)
    line = (np.arange(n) % 6).astype(np.uint8)
    offset_ns = (np.linspace(0, 99e6, n)).astype(np.uint32)
    # inject defects
    xyz[10, 0] = 0.3            # too close in x
    tag[20] = 0x01              # bad tag (x > 2)
    xyz[30] = xyz[29]           # duplicate
    line[40] = 50               # bad line
    payload = rbw.ser_livox_custom(77.0, xyz, tag, line, offset_ns)
    msg = drivers.parse_livox_custom(payload)
    assert msg.xyz.shape == (n, 3)
    assert np.allclose(msg.xyz, xyz)

    cfg = LivoConfig()
    cfg.lidar_options.lidar_type = LIDAR_LIVOX
    cfg.lidar_options.n_scans = 6
    cfg.lidar_options.blind = 0.1
    cfg.lidar_options.point_filter_num = 1
    cp = drivers.CloudProcessing(cfg)
    out = cp.process_livox(msg)
    # index 0 skipped (loop starts at 1) + 4 defects
    assert out.shape[0] == n - 5
    assert np.all(np.diff(out[:, 3]) >= 0)
    assert abs(out[0, 3] - 77.0) < 0.2


def test_decimation():
    n = 100
    xyz = np.c_[np.full(n, 5.0), np.zeros(n), np.zeros(n)].astype(np.float32)
    xyzt = np.c_[xyz, np.linspace(0, 99, n)].astype(np.float32)
    out, _ = native.process_spinning(xyzt, None, 1, 10, 4, 0.1, 0.0, True,
                                     -1.0)
    assert out.shape[0] == 25


def test_bag_replay_end_to_end(tmp_path):
    """Write a synthetic LIO bag, replay through the full pipeline."""
    from sr_livo_tpu.pipeline import LivoPipeline
    from sr_livo_tpu.runtime import synthetic, tum

    sim = synthetic.simulate(duration=6.0, n_azimuth=80, n_rings=8, seed=8)
    path = str(tmp_path / "replay.bag")
    w = rbw.BagWriter(path, compression="bz2")
    for (t, acc, gyr) in sim.imu:
        w.write_message("/imu", "sensor_msgs/Imu", t, rbw.ser_imu(t, acc, gyr))
    for chunk in sim.lidar_chunks:
        if chunk.shape[0] == 0:
            continue
        stamp = chunk[0, 3]
        rel = (chunk[:, 3] - stamp).astype(np.float32)
        ring = (np.arange(chunk.shape[0]) % 8).astype(np.uint16)
        w.write_message("/lidar", "sensor_msgs/PointCloud2", stamp,
                        rbw.ser_pointcloud2_velodyne(
                            stamp, chunk[:, :3].astype(np.float32), rel, ring))
    for (t, _img) in sim.images:
        img = np.zeros((8, 8, 3), np.uint8)
        w.write_message("/cam", "sensor_msgs/Image", t,
                        rbw.ser_image_rgb8(t, img))
    w.close()

    cfg = LivoConfig()
    cfg.lidar_options.lidar_type = LIDAR_VELODYNE
    cfg.lidar_options.n_scans = 8
    cfg.lidar_options.time_unit = 0
    cfg.lidar_options.blind = 0.3
    cfg.lidar_options.point_filter_num = 1
    cfg.odometry_options.voxel_size = 0.2
    cfg.odometry_options.init_voxel_size = 0.2
    cfg.odometry_options.sample_voxel_size = 0.8
    cfg.odometry_options.init_sample_voxel_size = 0.8
    cfg.odometry_options.min_distance_points = 0.05
    cfg.icp.size_voxel_map = 0.6
    cfg.icp.min_number_neighbors = 12
    cfg.shapes.max_sweep_points = 2048
    cfg.shapes.max_frame_points = 2048
    cfg.shapes.max_keypoints = 512
    cfg.shapes.max_imu_samples = 48
    cfg.shapes.map_capacity = 1 << 15

    pipe = LivoPipeline(cfg)
    drivers.replay_bag(pipe, path, cfg, "/lidar", "/imu", "/cam")
    assert pipe.initialized
    assert len(pipe.records) > 20
    ts, ps, _ = pipe.trajectory()
    ate = tum.ate_rmse(ts, ps, sim.gt_times, sim.gt_pos, align=True)
    assert ate < 0.08, f"bag-replay ATE {ate:.3f} m"


def test_ouster_driver_ntu_profile():
    """Ouster-16 ingest (NTU profile: `t` u32 ns per point, 20 Hz sweeps,
    ousterHandler cloudProcessing.cpp:216-325)."""
    from sr_livo_tpu.config import LIDAR_OUSTER
    n = 160
    xyz = RNG.uniform(-12, 12, (n, 3)).astype(np.float32)
    xyz[:6] *= 0.01                       # inside blind radius
    t_ns = np.linspace(0, 45e6, n).astype(np.uint32)   # 45 ms sweep
    ring = (np.arange(n) % 16).astype(np.uint8)
    payload = rbw.ser_pointcloud2_ouster(200.0, xyz, t_ns, ring)
    pc = drivers.parse_pointcloud2(payload)
    assert pc.point_step == 23
    assert set(pc.fields) >= {"x", "y", "z", "t", "ring"}

    cfg = LivoConfig()
    cfg.lidar_options.lidar_type = LIDAR_OUSTER
    cfg.lidar_options.n_scans = 16
    cfg.lidar_options.scan_rate = 20
    cfg.lidar_options.time_unit = 3       # ns (configs/ntu.yaml:14)
    cfg.lidar_options.blind = 1.0
    cfg.lidar_options.point_filter_num = 1
    cp = drivers.CloudProcessing(cfg)
    out = cp.process_cloud(pc)
    assert out.shape[0] == n - 6, out.shape
    # absolute times: header stamp + per-point ns offset, monotone
    assert np.all(np.diff(out[:, 3]) >= 0)
    # first 6 points are blind-filtered, so the earliest survivor is
    # index 6 at its own ns offset past the header stamp
    assert abs(out[0, 3] - (200.0 + t_ns[6] * 1e-9)) < 1e-4
    assert abs(out[-1, 3] - 200.045) < 1e-4
    assert np.all(np.linalg.norm(out[:, :3], axis=-1) > 1.0)
    # monotonic gate: replaying the same message yields nothing
    assert cp.process_cloud(pc).shape[0] == 0


def test_robosense_driver():
    """Robosense ingest (`timestamp` f64 absolute seconds per point,
    robosenseHandler cloudProcessing.cpp:435-541)."""
    from sr_livo_tpu.config import LIDAR_ROBOSENSE
    n = 120
    xyz = RNG.uniform(-10, 10, (n, 3)).astype(np.float32)
    xyz[:4] *= 0.01
    stamp = 321.0
    ts_abs = stamp + np.linspace(0, 0.095, n)          # 95 ms sweep
    ring = (np.arange(n) % 32).astype(np.uint16)
    payload = rbw.ser_pointcloud2_robosense(stamp, xyz, ts_abs, ring)
    pc = drivers.parse_pointcloud2(payload)
    assert set(pc.fields) >= {"x", "y", "z", "timestamp", "ring"}

    cfg = LivoConfig()
    cfg.lidar_options.lidar_type = LIDAR_ROBOSENSE
    cfg.lidar_options.n_scans = 32
    cfg.lidar_options.time_unit = 0       # absolute seconds
    cfg.lidar_options.blind = 0.5
    cfg.lidar_options.point_filter_num = 1
    cp = drivers.CloudProcessing(cfg)
    out = cp.process_cloud(pc)
    assert out.shape[0] == n - 4
    assert np.all(np.diff(out[:, 3]) >= 0)
    # absolute stamps are made relative to the first point, then re-based
    # on the header stamp (cloudProcessing.cpp:477); first 4 points are
    # blind-filtered, so the earliest survivor carries index 4's offset
    assert abs(out[0, 3] - (stamp + (ts_abs[4] - ts_abs[0]))) < 1e-4
    assert abs(out[-1, 3] - (stamp + 0.095)) < 1e-4


def test_ouster_through_sweep_cutter():
    """Ouster stream (20 Hz) + IMU + image through SweepCutter: the
    image-aligned sweep must end exactly at the image stamp."""
    from sr_livo_tpu.config import LIDAR_OUSTER
    from sr_livo_tpu.runtime.measurements import SweepCutter

    cfg = LivoConfig()
    cfg.lidar_options.lidar_type = LIDAR_OUSTER
    cfg.lidar_options.n_scans = 16
    cfg.lidar_options.scan_rate = 20
    cfg.lidar_options.time_unit = 3
    cfg.lidar_options.blind = 1.0
    cfg.lidar_options.point_filter_num = 1
    cp = drivers.CloudProcessing(cfg)

    cutter = SweepCutter(0.05)
    t0 = 500.0
    for k in range(8):                    # 8 sweeps @ 20 Hz
        n = 96
        xyz = RNG.uniform(2, 12, (n, 3)).astype(np.float32)
        t_ns = np.linspace(0, 49.9e6, n).astype(np.uint32)
        ring = (np.arange(n) % 16).astype(np.uint8)
        pc = drivers.parse_pointcloud2(rbw.ser_pointcloud2_ouster(
            t0 + 0.05 * k, xyz, t_ns, ring))
        out = cp.process_cloud(pc)
        assert out.shape[0] == n
        cutter.push_points(out)
    for k in range(81):                   # 200 Hz IMU covering the span
        cutter.push_imu(t0 + 0.005 * k, np.array([0, 0, 9.81]),
                        np.zeros(3))
    img_t = t0 + 0.12                     # image mid-stream
    cutter.push_image(img_t, np.zeros((4, 4, 3), np.uint8))

    meas, aligned = [], []
    while True:
        m = cutter.get()
        if m is None:
            break
        meas.append(m)
        if m.rendering:
            aligned.append(m)
    assert aligned, "no image-aligned sweep produced"
    m = aligned[0]
    assert abs(m.time_image - img_t) < 1e-9
    # every point in the aligned sweep precedes the image stamp
    assert m.points.shape[0] > 0
    assert m.points[:, 3].max() < img_t + 1e-9


def test_compressed_image_roundtrip():
    """parse_compressed_image on a real JPEG and PNG payload (the
    r3live_compressed ingest path, compressedImageHandler,
    lioOptimization.cpp:583-664)."""
    img = RNG.randint(0, 255, (24, 32, 3)).astype(np.uint8)
    stamp, out = drivers.parse_compressed_image(
        rbw.ser_compressed_image(12.345, img, fmt="png"))
    assert abs(stamp - 12.345) < 1e-6
    assert np.array_equal(out, img)            # PNG is lossless
    smooth = np.tile(np.arange(32, dtype=np.uint8)[None, :, None] * 7,
                     (24, 1, 3))
    stamp_j, out_j = drivers.parse_compressed_image(
        rbw.ser_compressed_image(12.345, smooth, fmt="jpeg"))
    assert abs(stamp_j - 12.345) < 1e-6
    assert out_j.shape == smooth.shape
    assert np.mean(np.abs(out_j.astype(float) - smooth.astype(float))) < 8


def test_bag_replay_compressed_images(tmp_path):
    """replay_bag(image_type='COMPRESSED') end-to-end on a tiny bag —
    the r3live_compressed profile's ingest."""
    from sr_livo_tpu.pipeline import LivoPipeline
    from sr_livo_tpu.runtime import synthetic

    sim = synthetic.simulate(duration=6.0, n_azimuth=80, n_rings=8, seed=8)
    path = str(tmp_path / "compressed.bag")
    w = rbw.BagWriter(path)
    for (t, acc, gyr) in sim.imu:
        w.write_message("/imu", "sensor_msgs/Imu", t, rbw.ser_imu(t, acc, gyr))
    for chunk in sim.lidar_chunks:
        if chunk.shape[0] == 0:
            continue
        stamp = chunk[0, 3]
        rel = (chunk[:, 3] - stamp).astype(np.float32)
        ring = (np.arange(chunk.shape[0]) % 8).astype(np.uint16)
        w.write_message("/lidar", "sensor_msgs/PointCloud2", stamp,
                        rbw.ser_pointcloud2_velodyne(
                            stamp, chunk[:, :3].astype(np.float32), rel, ring))
    grad = np.tile(np.arange(16, dtype=np.uint8)[None, :, None] * 15,
                   (12, 1, 3))
    for (t, _img) in sim.images:
        w.write_message("/cam/compressed", "sensor_msgs/CompressedImage", t,
                        rbw.ser_compressed_image(t, grad, fmt="jpeg"))
    w.close()

    cfg = LivoConfig()
    cfg.lidar_options.lidar_type = LIDAR_VELODYNE
    cfg.lidar_options.n_scans = 8
    cfg.lidar_options.time_unit = 0
    cfg.lidar_options.blind = 0.3
    cfg.lidar_options.point_filter_num = 1
    cfg.odometry_options.voxel_size = 0.2
    cfg.odometry_options.sample_voxel_size = 0.8
    cfg.odometry_options.init_sample_voxel_size = 0.8
    cfg.icp.size_voxel_map = 0.6
    cfg.icp.min_number_neighbors = 12
    cfg.shapes.max_sweep_points = 2048
    cfg.shapes.max_frame_points = 2048
    cfg.shapes.max_keypoints = 512
    cfg.shapes.max_imu_samples = 48
    cfg.shapes.map_capacity = 1 << 15

    pipe = LivoPipeline(cfg)
    drivers.replay_bag(pipe, path, cfg, "/lidar", "/imu", "/cam/compressed",
                       image_type=drivers.IMAGE_TYPE_COMPRESSED)
    assert pipe.initialized
    assert len(pipe.records) > 10
    # decoded images actually reached the cutter as image payloads
    assert sum(r.rendering for r in pipe.records) > 5


# ---- adversarial-format hardening (VERDICT r3 #7) -----------------------

def _tiny_bag(path):
    from tests import rosbag_writer as rbw
    w = rbw.BagWriter(str(path))
    for i in range(4):
        w.write_message("/imu", "sensor_msgs/Imu", 0.1 * (i + 1),
                        rbw.ser_imu(0.1 * (i + 1), [0, 0, 9.8], [0, 0, 0]))
    w.close()
    return str(path)


def _drain(bag):
    from sr_livo_tpu.runtime import native
    return list(native.BagReader(bag))


def test_bag_reader_rejects_lying_length_fields(tmp_path):
    """A corrupt/malicious length field must fail CLEANLY (IOError), not
    allocate gigabytes or crash — the reader previously trusted record
    framing (native/livo_native.cpp read_record)."""
    src = _tiny_bag(tmp_path / "ok.bag")
    raw = open(src, "rb").read()
    assert len(_drain(src)) == 4      # sanity: the valid bag reads fine

    import struct
    # the version line is "#ROSBAG V2.0\n" (13 bytes); then hlen (4 LE)
    lie_h = raw[:13] + struct.pack("<I", 0xFFFFFFF0) + raw[17:]
    p = tmp_path / "lie_hlen.bag"
    open(p, "wb").write(lie_h)
    with pytest.raises(IOError):
        _drain(str(p))

    # lying DATA length on the first record: hlen is honest, dlen is not
    (hlen,) = struct.unpack_from("<I", raw, 13)
    dpos = 13 + 4 + hlen
    lie_d = raw[:dpos] + struct.pack("<I", 0xFFFFFFF0) + raw[dpos + 4:]
    p = tmp_path / "lie_dlen.bag"
    open(p, "wb").write(lie_d)
    with pytest.raises(IOError):
        _drain(str(p))


def test_bag_reader_truncated_and_garbage_tail(tmp_path):
    """Truncation mid-record and a garbage trailing record must either
    stop cleanly with the messages read so far or raise IOError — never
    crash the process."""
    src = _tiny_bag(tmp_path / "ok.bag")
    raw = open(src, "rb").read()

    p = tmp_path / "trunc.bag"
    open(p, "wb").write(raw[:-11])
    try:
        msgs = _drain(str(p))
        assert len(msgs) <= 4
    except IOError:
        pass

    # garbage record appended: header with no '=' separator
    import struct
    bad_header = b"nonsense-without-separator"
    tail = struct.pack("<I", len(bad_header)) + bad_header \
        + struct.pack("<I", 0)
    p = tmp_path / "garbage.bag"
    open(p, "wb").write(raw + tail)
    with pytest.raises(IOError):
        _drain(str(p))


def test_bag_reader_bad_compression_and_fuzz(tmp_path):
    """Unknown chunk compression raises; random single-byte corruption
    across the file never crashes (clean error or clean stop)."""
    from tests import rosbag_writer as rbw
    src = _tiny_bag(tmp_path / "ok.bag")
    raw = open(src, "rb").read()

    # craft a chunk record advertising an unsupported compression
    chunk = rbw._record({"op": rbw._op(0x05), "compression": b"zstd",
                         "size": np.uint32(64).tobytes()}, b"\x00" * 32)
    p = tmp_path / "badcomp.bag"
    open(p, "wb").write(raw + chunk)
    with pytest.raises(IOError):
        _drain(str(p))

    # lz4-flagged chunk with garbage payload -> decompress error, not UB
    chunk = rbw._record({"op": rbw._op(0x05), "compression": b"lz4",
                         "size": np.uint32(512).tobytes()}, b"\xde\xad" * 16)
    p = tmp_path / "badlz4.bag"
    open(p, "wb").write(raw + chunk)
    with pytest.raises(IOError):
        _drain(str(p))

    rng = np.random.RandomState(5)
    for trial in range(40):
        buf = bytearray(raw)
        for _ in range(rng.randint(1, 4)):
            buf[rng.randint(13, len(buf))] = rng.randint(0, 256)
        p = tmp_path / f"fuzz{trial}.bag"
        open(p, "wb").write(bytes(buf))
        try:
            msgs = _drain(str(p))
            assert len(msgs) <= 8
        except (IOError, OSError):
            pass

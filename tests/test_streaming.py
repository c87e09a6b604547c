"""Streaming output layer (runtime.streaming): live pose/path/color-map
files growing WHILE the run is in flight — the file-based equivalent of
the reference's /Odometry_after_opt + /path publishers and the
threadPubColorPoints chunked color-map thread
(lioOptimization.cpp:1186-1384)."""
import os

import numpy as np

from sr_livo_tpu.config import LivoConfig
from sr_livo_tpu.models.vision import VisionModule
from sr_livo_tpu.pipeline import LivoPipeline
from sr_livo_tpu.runtime import synthetic
from sr_livo_tpu.runtime.streaming import StreamPublisher, read_live_trajectory

CAM = (130.0, 130.0, 80.0, 60.0)
SIZE = (120, 160)


def _cfg():
    cfg = LivoConfig()
    cfg.odometry_options.voxel_size = 0.2
    cfg.odometry_options.init_voxel_size = 0.2
    cfg.odometry_options.sample_voxel_size = 0.8
    cfg.odometry_options.init_sample_voxel_size = 0.8
    cfg.odometry_options.min_distance_points = 0.05
    cfg.icp.size_voxel_map = 0.6
    cfg.icp.min_number_neighbors = 12
    sh = cfg.shapes
    sh.max_sweep_points = 4096
    sh.max_frame_points = 4096
    sh.max_keypoints = 768
    sh.max_imu_samples = 48
    sh.map_capacity = 1 << 16
    sh.color_capacity = 1 << 16
    sh.color_registry = 1 << 17
    sh.max_render_points = 1 << 13
    co = cfg.camera_options
    co.image_width = SIZE[1]
    co.image_height = SIZE[0]
    co.image_scale = 1.0
    co.camera_intrinsic = [CAM[0], 0, CAM[2], 0, CAM[1], CAM[3], 0, 0, 1]
    co.camera_dist_coeffs = [0, 0, 0, 0, 0]
    cfg.map_options.add_point_step = 1
    cfg.extrinsics.extrinsic_R_imu_camera = [0, 0, 1, -1, 0, 0, 0, -1, 0]
    cfg.extrinsics.extrinsic_t_imu_camera = [0.0, 0.0, 0.0]
    return cfg


def test_stream_files_grow_mid_run(tmp_path):
    out = str(tmp_path / "live")
    cfg = _cfg()
    sim = synthetic.simulate(duration=7.0, n_azimuth=100, n_rings=12,
                             seed=6, image_size=SIZE, camera=CAM)
    pub = StreamPublisher(out, path_stride=5, map_every_n_frames=3,
                          pub_point_minimum_views=1)
    vision = VisionModule(cfg)
    pipe = LivoPipeline(cfg, vision=vision, stream=pub)

    # feed measurement by measurement; check availability MID-RUN
    for (t, a, g) in sim.imu:
        pipe.push_imu(t, a, g)
    for c in sim.lidar_chunks:
        pipe.push_points(c)
    for (t, img) in sim.images:
        pipe.push_image(t, img)

    meas = []
    while True:
        m = pipe.cutter.get()
        if m is None:
            break
        meas.append(m)
    assert len(meas) > 12

    mid = len(meas) - 5                 # leave real work after the check
    for m in meas[:mid]:
        pipe._process_measurement(m)
    pub.flush()
    # live files already populated while frames remain unprocessed
    ts_mid, ps_mid, qs_mid, _ = read_live_trajectory(out)
    n_mid = len(ts_mid)
    assert n_mid > 5, "no live odometry mid-run"
    assert os.path.getsize(os.path.join(out, "path_live.txt")) > 0
    chunks_mid = os.listdir(os.path.join(out, "color_chunks"))
    assert chunks_mid, "no color-map chunk mid-run"

    for m in meas[mid:]:
        pipe._process_measurement(m)
    pub.close()

    ts, ps, qs, vs = read_live_trajectory(out)
    assert len(ts) == len(pipe.records) > n_mid
    # live stream matches the pipeline's own records
    recs = pipe.records
    assert np.allclose(ps[-1], recs[-1].position, atol=1e-6)
    assert np.allclose(qs[-1], recs[-1].quat_wxyz, atol=1e-6)
    # chunks are valid PCDs covering a growing id range
    chunks = sorted(os.listdir(os.path.join(out, "color_chunks")))
    assert len(chunks) >= len(chunks_mid)
    first = open(os.path.join(out, "color_chunks", chunks[0]), "rb").read(200)
    assert first.startswith(b"# .PCD")


def test_chunk_publisher_revisits_late_maturing_rows(tmp_path):
    """A row below pub_point_minimum_views at its first snapshot must be
    published once its n_rgb matures (the reference's
    threadPubColorPoints re-scans the registry every tick,
    lioOptimization.cpp:1305-1334).  Regression test for the mixed-batch
    drop: previously _published_ids advanced past unpublishable rows."""
    from sr_livo_tpu.ops.color_map import C_NRGB, C_POS, C_VALID, REG_WIDTH
    from sr_livo_tpu.runtime.pcd import load_pcd_xyz

    out = str(tmp_path / "pub")
    pub = StreamPublisher(out, pub_point_minimum_views=3)

    def reg_snapshot(n_rgb_by_row):
        reg = np.zeros((64, REG_WIDTH), np.float32)
        for i, nv in n_rgb_by_row.items():
            reg[i, C_POS] = (float(i), 0.0, 0.0)
            reg[i, C_VALID] = 1.0
            reg[i, C_NRGB] = nv
        return reg

    # tick 1: rows 0-9 exist, none mature -> no chunk, all pending
    pub._write_chunk((reg_snapshot({i: 1 for i in range(10)}), 10))
    # tick 2: rows 0-4 matured; rows 10-14 appear (12-14 already mature)
    nv = {i: (4 if i < 5 else 1) for i in range(10)}
    nv.update({i: (5 if i >= 12 else 2) for i in range(10, 15)})
    pub._write_chunk((reg_snapshot(nv), 15))
    # tick 3: everything matured
    pub._write_chunk((reg_snapshot({i: 6 for i in range(15)}), 15))
    pub.close()

    chunks = sorted(os.listdir(os.path.join(out, "color_chunks")))
    assert len(chunks) == 2, chunks
    published = set()
    for c in chunks:
        pts = load_pcd_xyz(os.path.join(out, "color_chunks", c))
        published |= {int(round(x)) for x in pts[:, 0]}
    # every one of the 15 rows is eventually published, exactly once
    assert published == set(range(15))


def test_path_live_written_with_stride_one(tmp_path):
    out = str(tmp_path / "p1")
    pub = StreamPublisher(out, path_stride=1)
    rec = np.zeros(19, np.float32)
    pub._handle(("frame", 1.0, rec, None))
    pub._handle(("frame", 2.0, rec, None))
    pub.close()
    lines = open(os.path.join(out, "path_live.txt")).read().splitlines()
    assert len(lines) == 2


def test_live_viewer_renders_png(tmp_path):
    """scripts/live_viewer.py (the rviz substitute) renders a PNG from a
    streaming directory — synthesized chunks + trajectory, no GUI."""
    import subprocess
    import sys as _sys
    from sr_livo_tpu.runtime.pcd import save_color_rows
    out = str(tmp_path / "stream")
    os.makedirs(os.path.join(out, "color_chunks"))
    rng = np.random.RandomState(0)
    pos = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    rgb = rng.randint(0, 255, (500, 3))
    save_color_rows(pos, rgb, np.ones(500, bool),
                    os.path.join(out, "color_chunks", "chunk_00000.pcd"))
    with open(os.path.join(out, "odometry_live.txt"), "w") as f:
        for i in range(20):
            f.write(f"{i * 0.1:.3f} {i * 0.05:.3f} 0 0 1 0 0 0 0.5 0 0\n")
    png = str(tmp_path / "view.png")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, os.path.join(root, "scripts", "live_viewer.py"),
         out, "--once", "--out", png],
        capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()
    assert os.path.getsize(png) > 10_000

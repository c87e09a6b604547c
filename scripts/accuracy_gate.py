"""Accuracy gate: the real-dataset-shaped validation run (VERDICT r1 #2).

Builds synthetic rosbags with the REAL calibrations of the reference
dataset profiles (configs/r3live.yaml: Livox cone + 1280x1024 camera with
its published distortion/extrinsics; configs/ntu.yaml: Ouster-16 @ 20 Hz
+ 752x480 camera), replays them end-to-end through `drivers.replay_bag`
with the exact YAML profiles, and records ATE RMSE for:

  * r3live profile x {cache_association on/off} x {wire_quantization on/off}
  * ntu profile (default settings)

Writes ACCURACY_r02.json at the repo root.  Pass --quick for a shorter
sim (CI smoke); bags and rendered images are cached under
.accuracy_cache/ so ablations reuse one render.

Reference workflow being reproduced: roslaunch + rosbag play vs TUM GT
(README.md:91-138); profile parameters lioOptimization.cpp:252-350.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def _force_cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")


def _bag_writer():
    sys.path.insert(0, ROOT)
    from tests import rosbag_writer as rbw
    return rbw


def _sim_traj():
    """Gentler trajectory than the default (the real rigs move smoothly),
    still with full 6-dof excitation."""
    from sr_livo_tpu.runtime.synthetic import Trajectory
    return Trajectory(amp=(1.6, 1.6, 0.2), freq=(0.22, 0.15, 0.35),
                      yaw_amp=0.5, rp_amp=0.06, start_still=4.5)


def build_bag_r3live(cache: str, duration: float, image_rate: float) -> str:
    """Livox-Avia-shaped bag with the r3live profile's camera calibration
    (configs/r3live.yaml:26-39), images rendered DISTORTED at the
    processed scale (image_scale 0.5 -> 512x640)."""
    from sr_livo_tpu.runtime import synthetic

    tag = f"r3live_{duration:g}_{image_rate:g}_v3"
    bag = os.path.join(cache, f"{tag}.bag")
    gtf = os.path.join(cache, f"{tag}_gt.npz")
    if os.path.exists(bag) and os.path.exists(gtf):
        return bag

    intr_full = np.array([863.4241, 863.4171, 640.6808, 518.3392])
    dist = [-0.1080, 0.1050, -1.2872e-04, 5.7923e-05, -0.0222]
    r_ic = np.array([-0.00113207, -0.0158688, 0.999873,
                     -0.9999999, -0.000486594, -0.00113994,
                     0.000504622, -0.999874, -0.0158682]).reshape(3, 3)
    t_ic = np.array([0.050166, 0.0474116, -0.0312415])
    size = (512, 640)                       # 1024x1280 at image_scale 0.5
    cam = tuple(intr_full * 0.5)

    t0 = time.time()
    sim = synthetic.simulate(
        duration=duration, image_rate=image_rate, sweep_rate=10.0,
        dirs_phase=synthetic.lidar_directions_livox(110, 76),
        image_size=size, camera=cam, dist_coeffs=dist,
        r_ic=r_ic, t_ic=t_ic, cam_time_offset=0.006,
        seed=11, traj=_sim_traj())
    print(f"[gate] r3live sim rendered in {time.time() - t0:.0f}s "
          f"({len(sim.images)} images)", file=sys.stderr)

    rbw = _bag_writer()
    w = rbw.BagWriter(bag)
    for (t, acc, gyr) in sim.imu:
        w.write_message("/livox/imu", "sensor_msgs/Imu", t,
                        rbw.ser_imu(t, acc, gyr))
    rng = np.random.RandomState(3)
    for chunk in sim.lidar_chunks:
        if chunk.shape[0] == 0:
            continue
        stamp = float(chunk[0, 3])
        off_ns = np.round((chunk[:, 3] - stamp) * 1e9).astype(np.uint32)
        n = chunk.shape[0]
        w.write_message(
            "/livox/lidar", "livox_ros_driver/CustomMsg", stamp,
            rbw.ser_livox_custom(stamp, chunk[:, :3].astype(np.float32),
                                 np.zeros(n, np.uint8),
                                 (np.arange(n) % 6).astype(np.uint8),
                                 off_ns))
    for (t, img) in sim.images:
        u8 = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
        w.write_message("/camera/image_color", "sensor_msgs/Image", t,
                        rbw.ser_image_rgb8(t, u8))
    w.close()
    np.savez(gtf, gt_times=sim.gt_times, gt_pos=sim.gt_pos,
             gt_quat=sim.gt_quat)
    return bag


def build_bag_ntu(cache: str, duration: float, image_rate: float) -> str:
    """Ouster-16 @ 20 Hz bag with the ntu profile's camera calibration
    (configs/ntu.yaml:24-40), images at the processed scale (376x240)."""
    from sr_livo_tpu.runtime import synthetic

    tag = f"ntu_{duration:g}_{image_rate:g}_v3"
    bag = os.path.join(cache, f"{tag}.bag")
    gtf = os.path.join(cache, f"{tag}_gt.npz")
    if os.path.exists(bag) and os.path.exists(gtf):
        return bag

    intr_full = np.array([425.0259, 426.7976, 386.0152, 241.9130])
    dist = [-0.2881, 0.0746, 7.7845e-04, -2.2779e-04, 0.0]
    r_ic = np.array([0.0218308, -0.0131205, 0.999675,
                     0.999759, 0.00230088, -0.0218024,
                     -0.00201407, 0.999912, 0.0131676]).reshape(3, 3)
    t_ic = np.array([0.0555294, -0.124313, -0.0388531])
    size = (240, 376)                      # 480x752 at image_scale 0.5
    cam = tuple(intr_full * 0.5)

    t0 = time.time()
    sim = synthetic.simulate(
        duration=duration, image_rate=image_rate, sweep_rate=20.0,
        n_azimuth=160, n_rings=16,
        image_size=size, camera=cam, dist_coeffs=dist,
        r_ic=r_ic, t_ic=t_ic, cam_time_offset=0.004,
        seed=13, traj=_sim_traj())
    print(f"[gate] ntu sim rendered in {time.time() - t0:.0f}s "
          f"({len(sim.images)} images)", file=sys.stderr)

    rbw = _bag_writer()
    w = rbw.BagWriter(bag)
    for (t, acc, gyr) in sim.imu:
        w.write_message("/imu/imu", "sensor_msgs/Imu", t,
                        rbw.ser_imu(t, acc, gyr))
    for chunk in sim.lidar_chunks:
        if chunk.shape[0] == 0:
            continue
        stamp = float(chunk[0, 3])
        t_ns = np.round((chunk[:, 3] - stamp) * 1e9).astype(np.uint32)
        n = chunk.shape[0]
        ring = (np.arange(n) % 16).astype(np.uint8)
        w.write_message(
            "/os1_cloud_node1/points", "sensor_msgs/PointCloud2", stamp,
            rbw.ser_pointcloud2_ouster(stamp, chunk[:, :3].astype(np.float32),
                                       t_ns, ring))
    for (t, img) in sim.images:
        u8 = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
        w.write_message("/right/image_raw", "sensor_msgs/Image", t,
                        rbw.ser_image_rgb8(t, u8))
    w.close()
    np.savez(gtf, gt_times=sim.gt_times, gt_pos=sim.gt_pos,
             gt_quat=sim.gt_quat)
    return bag


def _shape_overrides(cfg):
    """Device shape budget (NOT reference parameters — sized to the sim)."""
    sh = cfg.shapes
    sh.max_sweep_points = 8192
    sh.max_frame_points = 4096
    sh.max_keypoints = 768
    sh.max_imu_samples = 48
    sh.map_capacity = 1 << 17
    sh.color_capacity = 1 << 17
    sh.color_registry = 1 << 17
    sh.max_render_points = 1 << 13


def run_profile(yaml_path: str, bag: str, topics, image_type: str,
                cache_association: bool, wire_quantization: bool) -> dict:
    from sr_livo_tpu.config import load_config
    from sr_livo_tpu.models.vision import VisionModule
    from sr_livo_tpu.pipeline import LivoPipeline
    from sr_livo_tpu.runtime import drivers, tum

    cfg = load_config(yaml_path)
    _shape_overrides(cfg)
    cfg.cache_association = cache_association
    cfg.wire_quantization = wire_quantization

    vision = VisionModule(cfg)
    pipe = LivoPipeline(cfg, vision=vision)
    t0 = time.time()
    drivers.replay_bag(pipe, bag, cfg, *topics, image_type=image_type)
    wall = time.time() - t0

    gtf = bag.replace(".bag", "_gt.npz")
    gt = np.load(gtf)
    ts, ps, _ = pipe.trajectory()
    ate = tum.ate_rmse(ts, ps, gt["gt_times"], gt["gt_pos"], align=True)
    recs = pipe.records
    n_ok = sum(r.success for r in recs)
    stats = vision.stats
    tracked = float(np.mean([s[1] for s in stats[5:]])) if len(stats) > 5 \
        else 0.0
    return dict(ate_m=round(float(ate), 4), frames=len(recs),
                registered=n_ok, rendered=sum(r.rendering for r in recs),
                mean_tracks=round(tracked, 1), wall_s=round(wall, 1))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(ROOT, "ACCURACY_r02.json"))
    ap.add_argument("--quick", action="store_true",
                    help="shorter sim for smoke runs")
    ap.add_argument("--duration", type=float, default=None)
    ap.add_argument("--strict", action="store_true",
                    help="exit 1 when a bound check fails (CI gating)")
    args = ap.parse_args()
    _force_cpu()

    duration = args.duration or (8.0 if args.quick else 12.0)
    image_rate = 5.0
    cache = os.path.join(ROOT, ".accuracy_cache")
    os.makedirs(cache, exist_ok=True)

    bag_r3 = build_bag_r3live(cache, duration, image_rate)
    bag_ntu = build_bag_ntu(cache, duration, image_rate)

    r3_topics = ("/livox/lidar", "/livox/imu", "/camera/image_color")
    ntu_topics = ("/os1_cloud_node1/points", "/imu/imu", "/right/image_raw")
    r3_yaml = os.path.join(ROOT, "configs", "r3live.yaml")
    ntu_yaml = os.path.join(ROOT, "configs", "ntu.yaml")

    results = {"r3live": {}, "ntu": {}}
    for cache_assoc in (True, False):
        for wire in (True, False):
            key = f"cache{int(cache_assoc)}_wire{int(wire)}"
            print(f"[gate] r3live {key} ...", file=sys.stderr)
            results["r3live"][key] = run_profile(
                r3_yaml, bag_r3, r3_topics, "RGB8", cache_assoc, wire)
            print(f"[gate]   -> {results['r3live'][key]}", file=sys.stderr)
    print("[gate] ntu cache1_wire1 ...", file=sys.stderr)
    results["ntu"]["cache1_wire1"] = run_profile(
        ntu_yaml, bag_ntu, ntu_topics, "RGB8", True, True)
    print(f"[gate]   -> {results['ntu']['cache1_wire1']}", file=sys.stderr)

    bound = 0.05
    r3 = results["r3live"]
    cache_delta = abs(r3["cache1_wire1"]["ate_m"] - r3["cache0_wire1"]["ate_m"])
    wire_delta = abs(r3["cache1_wire1"]["ate_m"] - r3["cache1_wire0"]["ate_m"])
    all_ates = [v["ate_m"] for v in r3.values()] + \
        [results["ntu"]["cache1_wire1"]["ate_m"]]
    out = {
        "duration_s": duration,
        "bound_m": bound,
        "profiles": results,
        "cache_association_delta_m": round(cache_delta, 4),
        "wire_quantization_delta_m": round(wire_delta, 4),
        "all_within_bound": bool(max(all_ates) < bound),
        "cache_delta_within_10pct_of_bound": bool(cache_delta < 0.1 * bound),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    if args.strict and not (out["all_within_bound"]
                            and out["cache_delta_within_10pct_of_bound"]):
        sys.exit(1)


if __name__ == "__main__":
    main()

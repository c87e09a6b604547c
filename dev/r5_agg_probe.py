"""Aggressive-profile ATE experiments: knob overrides via argv.
usage: python dev/r5_agg_probe.py [cap=N] [kp=N] [iters=N] [svox=F] [seed=i]"""
import os, sys, time
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.path.join(ROOT, "scripts"))
import accuracy_gate as ag
from sr_livo_tpu.config import load_config
from sr_livo_tpu.models.vision import VisionModule
from sr_livo_tpu.pipeline import LivoPipeline
from sr_livo_tpu.runtime import drivers, tum
from sr_livo_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
kv = dict(a.split("=") for a in sys.argv[1:])
bag = os.path.join(ROOT, ".accuracy_cache", "r3live_agg_30_10_aggressive_v7.bag")
cfg = load_config(os.path.join(ROOT, "configs", "r3live.yaml"))
ag._shape_overrides(cfg)
cfg.retry_wider_neighborhood = True
if "cap" in kv: cfg.icp.max_num_residuals = int(kv["cap"])
if "kp" in kv: cfg.shapes.max_keypoints = int(kv["kp"])
if "iters" in kv: cfg.icp.num_iters_icp = int(kv["iters"])
if "svox" in kv:
    cfg.odometry_options.sample_voxel_size = float(kv["svox"])
if "adaptive" in kv:
    cfg.adaptive_keypoint_density = True
    cfg.dense_gyr_threshold = float(kv["adaptive"])
if "acc" in kv: cfg.dense_acc_threshold = float(kv["acc"])
if "hold" in kv: cfg.dense_hold_s = float(kv["hold"])
if "warm" in kv: cfg.dense_warmup_s = float(kv["warm"])
vision = VisionModule(cfg)
pipe = LivoPipeline(cfg, vision=vision)
t0 = time.time()
drivers.replay_bag(pipe, bag, cfg, "/livox/lidar", "/livox/imu", "/camera/image_color")
wall = time.time() - t0
gt = np.load(bag.replace(".bag", "_gt.npz"))
ts, ps, _ = pipe.trajectory()
ate = tum.ate_rmse(ts, ps, gt["gt_times"], gt["gt_pos"], align=True)
tl = np.array(pipe._trigger_log) if pipe._trigger_log else np.zeros((1,3))
print("trigger: dense", pipe.n_dense_sweeps, "/", len(pipe._trigger_log),
      "gyr p50/p90", round(float(np.percentile(tl[:,1],50)),2),
      round(float(np.percentile(tl[:,1],90)),2),
      "acc p50/p90", round(float(np.percentile(tl[:,2],50)),2),
      round(float(np.percentile(tl[:,2],90)),2))
recs = pipe.records
nres = [r.num_residuals for r in recs if r.success]
print(f"{kv}: ate={float(ate):.4f} res_mean={np.mean(nres):.0f} "
      f"res_p90={np.percentile(nres,90):.0f} wall={wall:.0f}s")

"""Round-5 probe: single r3live standard-profile replay on a cached bag,
with per-stage track survival breakdown."""
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
bag = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, ".accuracy_cache", "r3live2_60_10_standard_v7.bag")
cfg = load_config(os.path.join(ROOT, "configs", "r3live.yaml"))
ag._shape_overrides(cfg)
cfg.retry_wider_neighborhood = True
vision = VisionModule(cfg)
pipe = LivoPipeline(cfg, vision=vision)
t0 = time.time()
drivers.replay_bag(pipe, bag, cfg, "/livox/lidar", "/livox/imu", "/camera/image_color")
wall = time.time() - t0
gt = np.load(bag.replace(".bag", "_gt.npz"))
ts, ps, _ = pipe.trajectory()
ate = tum.ate_rmse(ts, ps, gt["gt_times"], gt["gt_pos"], align=True)
stats = vision.stats
full = np.array([r[1:] for r in vision._stats_full[5:]], dtype=float)
names = ["status", "keep", "active", "post_lk", "post_fr", "post_fov", "post_pnp", "appended"]
print("ate_m", round(float(ate), 4), "wall_s", round(wall, 1))
eng = [s[1] for s in stats[5:]]
print("mean_tracks", round(float(np.mean(eng)), 1),
      "gate_pct", round(float(np.mean([e >= 30 for e in eng])), 4))
print("stage means:", {n: round(float(m), 1) for n, m in zip(names, full.mean(0))})
print("stage p10:", {n: round(float(m), 1) for n, m in zip(names, np.percentile(full, 10, 0))})

"""Round-5 probe: revisit profile with MappingBackend (feedback ON),
reporting ATE, closures, feedback, rebuilds at a given loop_max_pairs."""
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
from sr_livo_tpu.parallel.backend import BackendConfig, MappingBackend
from sr_livo_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
max_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
rebuild = "--norebuild" not in sys.argv
bag = os.path.join(ROOT, ".accuracy_cache", "r3live_rev_60_10_revisit_v7.bag")
cfg = load_config(os.path.join(ROOT, "configs", "r3live.yaml"))
ag._shape_overrides(cfg)
cfg.retry_wider_neighborhood = True
backend = MappingBackend(BackendConfig(
    keyframe_interval=0.5, loop_min_gap=20, loop_radius=2.0,
    loop_check_every_n=5, feedback_to_filter=True,
    loop_max_pairs=max_pairs, feedback_rebuild_map=rebuild))
vision = VisionModule(cfg)
pipe = LivoPipeline(cfg, vision=vision, backend=backend)
t0 = time.time()
drivers.replay_bag(pipe, bag, cfg, "/livox/lidar", "/livox/imu", "/camera/image_color")
wall = time.time() - t0
gt = np.load(bag.replace(".bag", "_gt.npz"))
ts, ps, _ = pipe.trajectory()
ate = tum.ate_rmse(ts, ps, gt["gt_times"], gt["gt_pos"], align=True)
print(f"max_pairs={max_pairs} rebuild={rebuild}: ate_m={float(ate):.4f} "
      f"closures={backend.n_loop_closures} feedback={backend.n_feedback_applied} "
      f"rebuilds={backend.n_map_rebuilds} ba={backend.ba_runs} wall={wall:.0f}s")

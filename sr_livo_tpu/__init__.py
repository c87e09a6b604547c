"""sr_livo_tpu: TPU-native LiDAR-Inertial-Visual Odometry engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
SR-LIVO (ZikangYuan/sr_livo): sweep reconstruction aligned to image
timestamps, a 17-dim ESIKF LIO core over a device-resident voxel-hash
map, a vision module (pyramidal LK tracking + reprojection/photometric
ESIKFs + Bayesian RGB map), and multi-chip map sharding via
`jax.sharding` meshes.
"""

__version__ = "0.1.0"

from sr_livo_tpu.config import LivoConfig, load_config  # noqa: F401

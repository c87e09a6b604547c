"""Typed configuration for the TPU-native SR-LIVO engine.

Parameter names intentionally mirror the reference YAML profiles
(/root/reference/config/r3live.yaml, ntu.yaml) and option classes
(/root/reference/include/parameters.h:8-109) so runs are directly
comparable.  On top of those, `ShapeOptions` fixes the static tensor
shapes that XLA needs (padded sweep size, map capacity, ...), which
replace the reference's dynamically-sized std::vector / robin_map
structures.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

# Motion-compensation / init modes (utility.h:82-92)
MOTION_COMP_NONE = -1
MOTION_COMP_IMU = 0
MOTION_COMP_CONSTANT_VELOCITY = 1
INIT_IMU = 0
INIT_CONSTANT_VELOCITY = 1

# LiDAR types (cloudProcessing.h:25)
LIDAR_LIVOX = 1
LIDAR_VELODYNE = 2
LIDAR_OUSTER = 3
LIDAR_ROBOSENSE = 4


@dataclass
class IcpOptions:
    """Mirrors icpOptions (parameters.h:8-56)."""
    threshold_voxel_occupancy: int = 1
    init_num_frames: int = 20
    size_voxel_map: float = 1.0
    num_iters_icp: int = 5
    min_number_neighbors: int = 20
    voxel_neighborhood: int = 1
    power_planarity: float = 2.0
    max_number_neighbors: int = 20
    max_dist_to_plane_icp: float = 0.3
    threshold_orientation_norm: float = 0.0001  # degrees
    threshold_translation_norm: float = 0.001   # meters
    max_num_residuals: int = -1
    weight_alpha: float = 0.9
    weight_neighborhood: float = 0.1
    # Print ICP failure diagnostics (num_residuals below
    # min_number_neighbors) like the reference does at optimize.cpp:119.
    debug_print: bool = False
    # --- Reference-parity, intentionally unused fields ------------------
    # Each is read from YAML by readParameters (lioOptimization.cpp:
    # 252-350) and echoed by recordParameters, but never consulted by any
    # reference computation; kept so reference YAMLs load unchanged.
    #   min_num_residuals: parameters.h:42 documents it; no read in
    #     optimize.cpp (the failure gate uses min_number_neighbors,
    #     optimize.cpp:110).
    #   num_closest_neighbors: parameters.h:44; zero reads outside the
    #     parameter dump (parameters.cpp:141).
    #   point_to_plane_with_distortion: parameters.h:38; zero reads
    #     anywhere (grep of src/ finds only the declaration).
    #   estimate_normal_from_neighborhood: only toggles whether
    #     searchNeighbors collects a `voxels` vector (optimize.cpp:76,
    #     :369-419) that no caller ever reads afterwards — behaviorally a
    #     no-op in the reference.
    min_num_residuals: int = 100
    num_closest_neighbors: int = 1
    point_to_plane_with_distortion: bool = True
    estimate_normal_from_neighborhood: bool = True


@dataclass
class OdometryOptions:
    """Mirrors odometryOptions (parameters.h:58-96)."""
    init_voxel_size: float = 0.2
    init_sample_voxel_size: float = 1.0
    init_num_frames: int = 20
    # Frame-retirement bound BEFORE filter init: the pipeline keeps at
    # most this many in-flight frame records pre-init and 2 afterwards
    # (lioOptimization.cpp:1101-1130), streaming retired records out.
    # Consumed by LivoPipeline when retire_frames is enabled.
    num_for_initialization: int = 10
    voxel_size: float = 0.5
    sample_voxel_size: float = 1.5
    max_distance: float = 100.0
    max_num_points_in_voxel: int = 20
    min_distance_points: float = 0.1
    # Reference-parity, intentionally unused: read (lioOptimization.cpp:
    # 312) and echoed (parameters.cpp:88) but never consulted by any
    # reference computation (zero reads in src/ outside those two sites).
    distance_error_threshold: float = 5.0
    motion_compensation: int = MOTION_COMP_CONSTANT_VELOCITY
    # IEKF pose-seed predictor (stateInitialization, lioOptimization.cpp:
    # 895-990).  Reference default INIT_IMU (lioOptimization.cpp:319); all
    # three reference profiles use it.  INIT_CONSTANT_VELOCITY seeds the
    # iterate from a pose extrapolation of the last two solved frames.
    initialization: int = INIT_IMU
    optimize_options: IcpOptions = field(default_factory=IcpOptions)


@dataclass
class MapOptions:
    """Mirrors mapOptions (parameters.h:98-109) — the colored visual map."""
    size_voxel_map: float = 0.1
    max_num_points_in_voxel: int = 20
    min_distance_points: float = 0.01
    add_point_step: int = 4
    pub_point_minimum_views: int = 3


@dataclass
class ImuOptions:
    """IMU noise densities (config/*.yaml imu_parameter)."""
    acc_cov: float = 0.1
    gyr_cov: float = 0.1
    b_acc_cov: float = 0.0001
    b_gyr_cov: float = 0.0001
    time_diff_enable: bool = False


@dataclass
class LidarOptions:
    """LiDAR driver options (config/*.yaml lidar_parameter)."""
    lidar_type: int = LIDAR_LIVOX
    n_scans: int = 6
    scan_rate: int = 10          # Hz — nominal sweep rate
    time_unit: int = 3           # 0 s, 1 ms, 2 us, 3 ns
    blind: float = 0.1           # blind radius [m]
    # Reference-parity, intentionally unused: the reference reads both into
    # member floats (lioOptimization.cpp:279-280) that nothing consumes.
    fov_degree: float = 180.0
    det_range: float = 100.0
    point_filter_num: int = 4    # point decimation


@dataclass
class CameraOptions:
    """Camera intrinsics/distortion (config/*.yaml camera_parameter)."""
    image_width: int = 1280
    image_height: int = 1024
    camera_intrinsic: List[float] = field(
        default_factory=lambda: [863.4241, 0.0, 640.6808,
                                 0.0, 863.4171, 518.3392,
                                 0.0, 0.0, 1.0])
    camera_dist_coeffs: List[float] = field(
        default_factory=lambda: [0.0, 0.0, 0.0, 0.0, 0.0])
    # Processing scale applied to the raw image before tracking
    # (imageProcessing.h m_image_downsample_ratio equivalent).
    image_scale: float = 0.5
    max_tracked_points: int = 300
    track_windows_size: int = 40
    # RANSAC gate thresholds (px).  Reference values are 1.0 / 1.5
    # (opticalFlowTracker.cpp:144, :295) tuned for real camera tracks;
    # LiDAR-built map points carry cm-level position noise that already
    # reprojects to >1 px at close range, so the defaults here leave the
    # gates slightly wider — tightening to reference values is a config
    # change, not a code change.
    fm_ransac_px: float = 2.0
    pnp_ransac_px: float = 2.5


@dataclass
class ExtrinsicOptions:
    """Sensor extrinsics (config/*.yaml extrinsic_parameter), row-major."""
    extrinsic_t_imu_lidar: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    extrinsic_R_imu_lidar: List[float] = field(
        default_factory=lambda: [1, 0, 0, 0, 1, 0, 0, 0, 1])
    extrinsic_t_imu_camera: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    extrinsic_R_imu_camera: List[float] = field(
        default_factory=lambda: [1, 0, 0, 0, 1, 0, 0, 0, 1])

    def R_imu_lidar(self) -> np.ndarray:
        return np.asarray(self.extrinsic_R_imu_lidar, np.float64).reshape(3, 3)

    def t_imu_lidar(self) -> np.ndarray:
        return np.asarray(self.extrinsic_t_imu_lidar, np.float64)

    def R_imu_camera(self) -> np.ndarray:
        return np.asarray(self.extrinsic_R_imu_camera, np.float64).reshape(3, 3)

    def t_imu_camera(self) -> np.ndarray:
        return np.asarray(self.extrinsic_t_imu_camera, np.float64)


@dataclass
class ShapeOptions:
    """Static tensor shapes for the XLA-compiled pipeline.

    These replace the reference's dynamic containers: every sweep is
    padded/masked to fixed sizes so the whole per-sweep step compiles to
    one static program.  Values are per-sweep upper bounds; points
    beyond them are dropped deterministically (densest-first is not
    needed because upstream decimation already bounds the stream).
    """
    max_sweep_points: int = 32768       # raw points entering a sweep
    max_frame_points: int = 8192        # after voxel-grid subsampling
    max_keypoints: int = 1024           # grid-sampled ICP keypoints
    max_imu_samples: int = 64           # IMU samples per sweep (+1 interp)
    # Geometry voxel map (1.0 m voxels)
    map_capacity: int = 1 << 18         # hash slots
    map_voxel_points: int = 20          # == max_num_points_in_voxel
    map_max_probe: int = 8              # linear-probe bound (tables are
                                        # sized for load < ~0.25, where
                                        # chains beyond 8 are vanishing;
                                        # probe gathers are a dominant TPU
                                        # cost so the bound is kept tight)
    max_insert_points: int = 2048       # per-sweep insertion budget
    # Color map registry (0.1 m voxels)
    color_capacity: int = 1 << 19
    color_voxel_points: int = 20
    color_registry: int = 1 << 20       # global rgb point registry bound
    max_render_voxels: int = 2048       # recent voxels rendered per image
    max_render_points: int = 8192       # visible points colored per image
    # Vision
    lk_pyramid_levels: int = 4
    lk_window: int = 21
    lk_iterations: int = 10
    # --- Sharded (multi-chip) engine geometry -----------------------
    # Map blocks: voxels grouped into (2^bits)^3 spatial blocks; a block's
    # owner shard stores it plus a halo of `map_halo_voxels` voxels around
    # its blocks, making the 27/125-voxel kNN fully shard-local.
    map_block_bits: int = 4
    map_halo_voxels: int = 2           # >= max nb_voxels_visited (init: 2)
    # Routing-buffer slack over the balanced per-shard expectation:
    # hash-range exchanges are uniform (slack 4 is >>10 sigma); block
    # exchanges follow spatial density (queries/inserts) and use the same
    # knob.  Overflow is dropped deterministically and counted in
    # SweepOutput.route_overflow.
    shard_route_slack: float = 4.0
    # Separate, tighter slack for the per-shard IEKF query batch (K4):
    # unlike the routing BUFFERS above (cheap memory), K4 multiplies real
    # per-iteration compute (kNN gathers + plane rows) on every shard
    # every sweep, so spatial load imbalance beyond this factor drops
    # keypoints for the sweep (counted in route_overflow) instead of
    # taxing the steady state.  Raise it for worlds where one map block
    # persistently dominates the view.
    shard_query_slack: float = 2.0
    # Chunked association: the IEKF's kNN + plane PCA runs over
    # `query_chunk`-row slices of the prefix-compacted query buffer with
    # a dynamic trip count, so compute follows the ACTUAL query count
    # instead of the static budget (max_keypoints / the sharded K4 with
    # its imbalance slack).  Headroom becomes free; 0 = full-batch.
    query_chunk: int = 512


@dataclass
class LivoConfig:
    """Top-level config = union of all reference YAML sections."""
    odometry_options: OdometryOptions = field(default_factory=OdometryOptions)
    map_options: MapOptions = field(default_factory=MapOptions)
    imu_options: ImuOptions = field(default_factory=ImuOptions)
    lidar_options: LidarOptions = field(default_factory=LidarOptions)
    camera_options: CameraOptions = field(default_factory=CameraOptions)
    extrinsics: ExtrinsicOptions = field(default_factory=ExtrinsicOptions)
    shapes: ShapeOptions = field(default_factory=ShapeOptions)
    gravity_acc: List[float] = field(default_factory=lambda: [0.0, 0.0, 9.81])
    output_path: str = "output"
    debug_output: bool = False
    laser_point_cov: float = 0.001      # lioOptimization.cpp:364
    # None = auto (Pallas kernels on TPU, pure-jnp path on CPU)
    use_pallas: Optional[bool] = None
    # Associate keypoints to map planes ONCE per IEKF update (at the
    # predicted pose) instead of re-searching every iteration like the
    # reference (buildPlaneResiduals inside the i=-1..N loop,
    # optimize.cpp:133-160).  Between iterations the pose moves by
    # millimetres — far less than a map voxel — so the neighbor sets and
    # fitted plane normals are unchanged and only the pose-dependent
    # point-to-plane distances/Jacobians need recomputing.  False restores
    # exact reference semantics.
    cache_association: bool = True
    # Ship sweep point payloads host->device as int16 (dynamic-scale xyz,
    # ~3 mm quanta at 100 m range; per-point time at ~3 us): host->device
    # bandwidth, not device compute, bounds a tunneled-TPU pipeline.
    # False sends float32 tensors (bit-exact ingest).
    wire_quantization: bool = True
    # Far-voxel eviction (removePointsFarFromLocation is disabled in the
    # reference main loop, lioOptimization.cpp:1032 — off by default here too)
    enable_map_eviction: bool = False
    eviction_every_n_frames: int = 20
    # Recovery extension (no reference equivalent — the reference simply
    # skips map insertion on ICP failure, lioOptimization.cpp:1011-1014):
    # when the update fails OR solves on fewer than icp.min_num_residuals
    # rows (degenerate view / freshly-entered territory), retry the IEKF
    # once with the voxel neighborhood widened by one ring (27 -> 125
    # voxels), recovering frames whose keypoints sit in sparsely-
    # populated voxels.  The retry branch only executes when triggered
    # (lax.cond).
    retry_wider_neighborhood: bool = False
    # Motion-adaptive keypoint density (no reference counterpart — its
    # sample grid is a static config): when the sweep's host-computed
    # mean |gyro| exceeds dense_gyr_threshold, the engine runs the
    # steady_dense program variant whose keypoint grid is
    # dense_sample_voxel_size instead of odo.sample_voxel_size.  Under
    # fast rotation the standard grid leaves the point-to-plane solve
    # residual-starved (measured on the aggressive gate profile: ~95
    # residuals vs the reference's ~600-residual operating point,
    # r3live.yaml:69; ATE 8.9 -> 3.4 cm with the dense grid), while
    # slow-motion sweeps keep the cheaper reference grid.
    adaptive_keypoint_density: bool = False
    dense_sample_voxel_size: float = 0.5
    dense_gyr_threshold: float = 1.2       # rad/s, mean |gyro| per sweep
    # ... or fast translation: mean | |acc| - G | over the sweep (the
    # host-side proxy for dynamic acceleration; ~6 m/s^2 on the
    # aggressive profile's 3.4 m/s oscillation vs ~1.3 on standard)
    dense_acc_threshold: float = 2.5       # m/s^2
    # Dense warmup: run the dense variant for this long after filter
    # init regardless of motion — the stationary early sweeps set how
    # tightly gravity/bias converge before motion starts, and their
    # residual count is the lever (measured: sparse warmup costs 3 cm
    # on the aggressive profile even with every moving sweep dense,
    # while stretching the window deep into slow-profile MOTION costs
    # ~1 cm there — 4 s covers the stationary tail only)
    dense_warmup_s: float = 4.0
    # Trigger hold: oscillating hard motion dips below the threshold
    # between peaks; once triggered, the dense variant stays selected
    # for this long (the residual starvation damage accrues during the
    # dips too — measured aggressive ATE 7.7 cm without hold vs 3.5 cm
    # with, threshold 1.2)
    dense_hold_s: float = 2.0
    # Frame retirement (lioOptimization.cpp:1101-1130): bound the live
    # frame-record set to num_for_initialization pre-init / 2 post-init,
    # appending retired poses to output_path pose/velocity/bias files in
    # batches (or dropping them when a StreamPublisher already mirrors
    # every record to odometry_live.txt).  Off by default: short runs
    # keep the full in-memory record list for trajectory()/ATE use.
    retire_frames: bool = False
    retire_batch: int = 64              # frames per batched materialization

    @property
    def sweep_interval(self) -> float:
        return 1.0 / float(self.lidar_options.scan_rate)

    @property
    def icp(self) -> IcpOptions:
        return self.odometry_options.optimize_options


def _apply(dc, mapping: dict, aliases: Optional[dict] = None):
    aliases = aliases or {}
    names = {f.name for f in dataclasses.fields(dc)}
    for k, v in mapping.items():
        k = aliases.get(k, k)
        if k in names:
            setattr(dc, k, v)
    return dc


_MOTION_COMP = {"NONE": MOTION_COMP_NONE, "IMU": MOTION_COMP_IMU,
                "CONSTANT_VELOCITY": MOTION_COMP_CONSTANT_VELOCITY}
_INIT = {"INIT_IMU": INIT_IMU, "INIT_CONSTANT_VELOCITY": INIT_CONSTANT_VELOCITY,
         "INIT_NONE": INIT_CONSTANT_VELOCITY}


def load_config(path_or_dict) -> LivoConfig:
    """Build a LivoConfig from a reference-format YAML file or dict.

    Accepts the exact section/key names of /root/reference/config/*.yaml
    (readParameters, lioOptimization.cpp:252-350).
    """
    if isinstance(path_or_dict, dict):
        raw = path_or_dict
    else:
        import yaml
        with open(path_or_dict) as f:
            raw = yaml.safe_load(f)

    cfg = LivoConfig()
    common = raw.get("common", {})
    if "gravity_acc" in common:
        cfg.gravity_acc = list(common["gravity_acc"])

    lp = dict(raw.get("lidar_parameter", {}))
    lp.update({k: v for k, v in common.items() if k == "point_filter_num"})
    _apply(cfg.lidar_options, lp,
           aliases={"N_SCANS": "n_scans", "SCAN_RATE": "scan_rate"})

    _apply(cfg.imu_options, raw.get("imu_parameter", {}))
    _apply(cfg.camera_options, raw.get("camera_parameter", {}))
    _apply(cfg.extrinsics, raw.get("extrinsic_parameter", {}))

    odo = dict(raw.get("odometry_options", {}))
    if isinstance(odo.get("motion_compensation"), str):
        odo["motion_compensation"] = _MOTION_COMP[odo["motion_compensation"]]
    if isinstance(odo.get("initialization"), str):
        odo["initialization"] = _INIT[odo["initialization"]]
    _apply(cfg.odometry_options, odo)

    _apply(cfg.odometry_options.optimize_options, raw.get("icp_options", {}),
           aliases={"max_dist_to_plane_ct_icp": "max_dist_to_plane_icp"})
    _apply(cfg.map_options, raw.get("map_options", {}))
    return cfg

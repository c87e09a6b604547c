"""Vision module: per-rendering-frame imaging pipeline.

TPU-native equivalent of imageProcessing::process
(/root/reference/src/imageProcessing.cpp:89-164) plus the track
management of opticalFlowTracker (/root/reference/src/opticalFlowTracker.cpp)
and the renderer of rgbMapTracker: image preproc -> pyramidal LK ->
F-matrix RANSAC -> PnP RANSAC -> 11-dof reprojection ESIKF -> 6-dof
photometric ESIKF -> Bayesian map rendering -> track replenishment.
The track table is a fixed-capacity device array (capacity
maximum_tracked_points = 300, imageProcessing.cpp:14).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sr_livo_tpu.config import LivoConfig
from sr_livo_tpu.models import camera as cam_mod
from sr_livo_tpu.ops import color_map as cm
from sr_livo_tpu.ops import image_ops, lk, ransac


class TrackState(NamedTuple):
    reg_id: jnp.ndarray    # (M,) int32 registry id, -1 = free
    px: jnp.ndarray        # (M, 2) pixel in last processed image
    active: jnp.ndarray    # (M,) bool


def make_tracks(m: int) -> TrackState:
    return TrackState(reg_id=jnp.full((m,), -1, jnp.int32),
                      px=jnp.zeros((m, 2), jnp.float32),
                      active=jnp.zeros((m,), bool))


class VisionModule:
    """Host wrapper owning camera state, colored map, tracks, pyramids."""

    def __init__(self, cfg: LivoConfig):
        self.cfg = cfg
        co = cfg.camera_options
        scale = co.image_scale
        self.cols = int(co.image_width * scale)
        self.rows = int(co.image_height * scale)
        intr_mat = np.asarray(co.camera_intrinsic, np.float64).reshape(3, 3)
        self.intr0 = np.array([intr_mat[0, 0] * scale, intr_mat[1, 1] * scale,
                               intr_mat[0, 2] * scale, intr_mat[1, 2] * scale])
        dist = np.asarray(co.camera_dist_coeffs, np.float64)
        k = np.array([[self.intr0[0], 0, self.intr0[2]],
                      [0, self.intr0[1], self.intr0[3]], [0, 0, 1]])
        self.orig_rows, self.orig_cols = int(co.image_height), int(co.image_width)
        if np.any(np.abs(dist) > 1e-12):
            ud = image_ops.make_undistort_map(k, dist, (self.rows, self.cols))
            # host numpy: closed over by the jitted preprocess program —
            # a closed-over device array is a pathological embedded
            # constant on this backend (models.odometry.LioEngine note)
            self.ud_map = np.asarray(ud, np.float32)
            # Composed resize+undistort map in ORIGINAL-image pixels for the
            # host-native remap path (OpenCV pixel-center convention).
            self.host_map = np.empty_like(ud)
            self.host_map[..., 0] = ((ud[..., 0] + 0.5)
                                     * (self.orig_cols / self.cols) - 0.5)
            self.host_map[..., 1] = ((ud[..., 1] + 0.5)
                                     * (self.orig_rows / self.rows) - 0.5)
        else:
            self.ud_map = None
            self.host_map = None
        self.n_tiles = image_ops.clahe_tiles_for_width(self.cols)

        self.camera = cam_mod.init_camera_state(
            cfg.extrinsics.R_imu_camera(), cfg.extrinsics.t_imu_camera(),
            self.intr0)
        sh = cfg.shapes
        self.color_map = cm.make_color_map(
            sh.color_registry, sh.color_capacity, sh.color_voxel_points,
            recent=sh.max_render_voxels)
        self.tracks = make_tracks(co.max_tracked_points)
        # The reference's 40 px spacing assumes ~1280 px images
        # (track_windows_size / image_scale_factor, imageProcessing.cpp:131);
        # scale it with the actual processed width.
        self.track_grid = max(
            int(round(co.track_windows_size * self.cols / 1280.0)), 4)
        self.lk_params = lk.LkParams(window=sh.lk_window,
                                     levels=sh.lk_pyramid_levels - 1,
                                     iters=sh.lk_iterations)
        self.prev_pyr = None
        self.prev_time = None
        self._pre_jit = None
        self._pre_u8_jit = None
        self._pre_pyr_jit = None
        self._pre_pyr_u8_jit = None
        self._fused_jit = {}      # remapped(bool) -> jitted fused frame
        self.first_data = True
        self.n_new_visited = jnp.int32(1)
        self._rng = jax.random.PRNGKey(7)
        # (t, n_tracked, n_inlier) per rendering frame; counts stay on
        # device until first read (per-frame int() readbacks would stall
        # the async dispatch pipeline on the device-tunnel RTT)
        self._stats: list = []
        self._stats_full: list = []      # (t, *per-stage counts) rows
        self._stats_pending: list = []

    # -- called by the pipeline on EVERY sweep (addPointsToMap color leg) --
    def insert_sweep_points(self, pts_world: jnp.ndarray,
                            frame_valid: jnp.ndarray, success: jnp.ndarray,
                            obs_time: float):
        """One jitted dispatch: the success gate, the add_point_step
        stride, and the insert run in a single program.  Eager `&` /
        `[::step]` ops here used to cost ~3 extra device dispatches per
        sweep — each ~0.15-0.5 ms of serial stream time on a tunneled
        TPU, several times the insert program itself."""
        mo = self.cfg.map_options
        # number_of_new_visited_voxel: voxels whose visit time became current
        self.color_map, self.n_new_visited = _gated_color_insert(
            self.color_map, pts_world, frame_valid, success,
            np.float32(obs_time),
            step=mo.add_point_step,
            voxel_size=mo.size_voxel_map,
            min_distance=mo.min_distance_points,
            max_probe=self.cfg.shapes.map_max_probe,
            budget=self.cfg.shapes.max_insert_points)

    # -- preprocessing --------------------------------------------------
    def _preprocess_core(self, img_u8: jnp.ndarray):
        """Jitted tail with device undistortion: uint8 (processed size) ->
        remap + gray CLAHE + YCrCb equalize."""
        img = img_u8.astype(jnp.float32)
        if self.ud_map is not None:
            img = image_ops.remap(img, self.ud_map)
        gray = image_ops.rgb_to_gray(img)
        gray = image_ops.clahe(gray, 3.0, min(self.n_tiles, 32))
        rgb = image_ops.equalize_color_ycrcb(img, min(self.n_tiles, 32))
        return rgb, gray

    def _preprocess_from_u8(self, img_u8: jnp.ndarray):
        """Jitted tail when undistortion already ran on the host: uint8
        (already resized + undistorted) -> gray CLAHE + YCrCb equalize."""
        img = img_u8.astype(jnp.float32)
        gray = image_ops.rgb_to_gray(img)
        gray = image_ops.clahe(gray, 3.0, min(self.n_tiles, 32))
        rgb = image_ops.equalize_color_ycrcb(img, min(self.n_tiles, 32))
        return rgb, gray

    def preprocess(self, image: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """uint8/float image -> (rgb f32 0..255 equalized, gray CLAHE).

        Host handles dtype/scale/resize (numpy, cheap); the device part is
        one jitted program (eager dispatch through the device tunnel costs
        milliseconds per op).  The image ALWAYS crosses the tunnel as uint8:
        host->device bandwidth, not device compute, is the scarce resource,
        and the reference consumes 8-bit camera frames anyway
        (imageProcessing.cpp:120-125).  When the input is a full-resolution
        frame and a distortion model is set, the resize+undistort remap runs
        in native C++ on the host (runtime.native.remap_u8) — the remap
        gather pattern is the slowest op class on TPU and on the host it
        overlaps device compute."""
        img_u8, remapped = self._host_prepare(image)
        if remapped:
            if self._pre_u8_jit is None:
                self._pre_u8_jit = jax.jit(self._preprocess_from_u8)
            return self._pre_u8_jit(jnp.asarray(img_u8))
        if self._pre_jit is None:
            self._pre_jit = jax.jit(self._preprocess_core)
        return self._pre_jit(jnp.asarray(img_u8))

    def preprocess_with_pyramid(self, image: np.ndarray, host_img=None):
        """preprocess + LK pyramid/Scharr precompute fused into ONE
        dispatched program: (rgb, gray, (pyr, dx, dy)).  Separate
        preprocess and pyramid dispatches each pay tunnel dispatch cost.
        `host_img` = (img_u8, remapped) when _host_prepare already ran on
        the pipeline's feeder thread."""
        img_u8, remapped = (host_img if host_img is not None
                            else self._host_prepare(image))
        if remapped:
            if self._pre_pyr_u8_jit is None:
                self._pre_pyr_u8_jit = jax.jit(self._preprocess_pyr_from_u8)
            return self._pre_pyr_u8_jit(jnp.asarray(img_u8))
        if self._pre_pyr_jit is None:
            self._pre_pyr_jit = jax.jit(self._preprocess_pyr_core)
        return self._pre_pyr_jit(jnp.asarray(img_u8))

    def _preprocess_pyr_core(self, img_u8):
        rgb, gray = self._preprocess_core(img_u8)
        return rgb, gray, lk.precompute_frame(gray, self.lk_params.levels)

    def _preprocess_pyr_from_u8(self, img_u8):
        rgb, gray = self._preprocess_from_u8(img_u8)
        return rgb, gray, lk.precompute_frame(gray, self.lk_params.levels)

    def _host_prepare(self, image: np.ndarray):
        """Host-side dtype/scale/resize (+ native undistort remap when a
        distortion model is set); returns (uint8 image at processed
        size, whether the native remap path ran)."""
        img_in = np.asarray(image)
        if img_in.ndim == 2:
            img_in = np.repeat(img_in[..., None], 3, axis=-1)
        if img_in.dtype != np.uint8:
            img = img_in.astype(np.float32)
            mx = img.max(initial=0.0)
            if mx <= 1.5:
                img = img * 255.0
            elif mx > 255.0:
                # >8-bit sources (e.g. 16-bit cameras): normalize by the
                # dtype max (integer inputs) or the observed max (float)
                # instead of saturating everything at 255.
                if np.issubdtype(img_in.dtype, np.integer):
                    full = float(np.iinfo(img_in.dtype).max)
                else:
                    full = mx
                img = img * (255.0 / full)
            img_in = np.clip(np.round(img), 0, 255).astype(np.uint8)
        if (self.host_map is not None
                and img_in.shape[:2] == (self.orig_rows, self.orig_cols)):
            from sr_livo_tpu.runtime import native
            und = native.remap_u8(np.ascontiguousarray(img_in), self.host_map)
            return und, True
        if img_in.shape[:2] != (self.rows, self.cols):
            ys = np.clip(np.round(np.linspace(0, img_in.shape[0] - 1,
                                              self.rows))
                         .astype(int), 0, img_in.shape[0] - 1)
            xs = np.clip(np.round(np.linspace(0, img_in.shape[1] - 1,
                                              self.cols))
                         .astype(int), 0, img_in.shape[1] - 1)
            img_in = img_in[np.ix_(ys, xs)]
        return img_in, False

    # -- main per-rendering-frame entry ----------------------------------
    def process_frame(self, pipeline, meas, sweep_out, host_img=None):
        """Whole rendered frame — colored-map insert (the addPointsToMap
        color leg of THIS sweep) + image preprocess/pyramid + the full
        vision step — as ONE dispatched device program.  On a tunneled
        TPU each dispatch costs ~0.2-0.6 ms of serial host time, so
        fusing the former 3 dispatches is a direct wall win.  The first
        rendered frame (track seeding, no previous pyramid) keeps the
        unfused path."""
        state = sweep_out.state
        q_wi, t_wi = state.q, state.p
        obs_time = meas.time_image
        timers = pipeline.timers

        if self.first_data:
            self.insert_sweep_points(
                sweep_out.frame_pts_world, sweep_out.frame_valid,
                sweep_out.summary.success, obs_time)
            _rgb, _gray, cur_pyr = self.preprocess_with_pyramid(
                meas.image, host_img=host_img)
            self._init_tracks(q_wi, t_wi, obs_time)
            self.prev_pyr = cur_pyr
            self.prev_time = obs_time
            self.first_data = False
            return

        dt = obs_time - self.prev_time
        img_u8, remapped = (host_img if host_img is not None
                            else self._host_prepare(meas.image))
        if self._fused_jit.get(remapped) is None:
            self._fused_jit[remapped] = jax.jit(
                functools.partial(self._fused_frame_core, remapped=remapped),
                donate_argnums=(1, 2, 3))
        with timers.stage("vis_step"):
            (self.camera, self.color_map, self.tracks, stats_vec,
             self._rng, cur_pyr) = self._fused_jit[remapped](
                self.camera, self.color_map, self.tracks, self.prev_pyr,
                jnp.asarray(img_u8), sweep_out.frame_pts_world,
                sweep_out.frame_valid, sweep_out.summary.success,
                q_wi, t_wi, np.array([dt, obs_time], np.float32),
                self._rng)
            if timers.sync:
                jax.block_until_ready(self.camera.intr)
        self._stats_pending.append((float(obs_time), stats_vec))
        self.prev_pyr = cur_pyr
        self.prev_time = obs_time

    def _fused_frame_core(self, camera, color_map, tracks, prev_pyr, img_u8,
                          frame_pts, frame_valid, success, q_wi, t_wi,
                          scal, key, *, remapped):
        """Traced body of the fused rendered-frame program: gated color
        insert -> preprocess + pyramid -> vision step.  `scal` packs
        [dt, obs_time]; the insert's n_new_visited feeds the ESIKFs
        without a host round trip."""
        mo = self.cfg.map_options
        color_map, n_new_visited = _gated_color_insert_core(
            color_map, frame_pts, frame_valid, success, scal[1],
            step=mo.add_point_step, voxel_size=mo.size_voxel_map,
            min_distance=mo.min_distance_points,
            max_probe=self.cfg.shapes.map_max_probe,
            budget=self.cfg.shapes.max_insert_points)
        rgb, gray = (self._preprocess_from_u8(img_u8) if remapped
                     else self._preprocess_core(img_u8))
        cur_pyr = lk.precompute_frame(gray, self.lk_params.levels)
        camera, color_map, tracks, stats_vec, key = _vision_step_core(
            camera, color_map, tracks, prev_pyr, cur_pyr, rgb, q_wi, t_wi,
            scal, n_new_visited, key,
            lk_params=self.lk_params, cols=self.cols, rows=self.rows,
            track_grid=self.track_grid,
            max_render_points=self.cfg.shapes.max_render_points,
            estimate_intrinsic=True, estimate_extrinsic=True,
            fm_px=self.cfg.camera_options.fm_ransac_px,
            pnp_px=self.cfg.camera_options.pnp_ransac_px)
        return camera, color_map, tracks, stats_vec, key, cur_pyr

    @property
    def stats(self):
        if self._stats_pending:
            arr = np.asarray(jnp.stack(
                [d for (_, d) in self._stats_pending]))
            self._stats.extend(
                (t, int(a[0]), int(a[1]))
                for (t, _), a in zip(self._stats_pending, arr))
            self._stats_full.extend(
                (t,) + tuple(int(v) for v in a)
                for (t, _), a in zip(self._stats_pending, arr))
            self._stats_pending = []
        return self._stats

    @stats.setter
    def stats(self, value):
        self._stats = list(value)
        self._stats_full = []
        self._stats_pending = []

    def _init_tracks(self, q_wi, t_wi, obs_time):
        """First-frame track seeding (imageProcessing.cpp:127-135)."""
        _, t_wc, q_cw, t_cw = cam_mod.world_camera_pose(
            self.camera, q_wi, t_wi)
        m = self.tracks.reg_id.shape[0]
        ids, uv, ok = cm.select_points_for_projection(
            self.color_map, q_cw, t_cw, t_wc, self.camera.intr, obs_time,
            max_out=m, cols=self.cols, rows=self.rows,
            grid_px=self.track_grid)
        self.tracks = TrackState(
            reg_id=jnp.where(ok, ids, -1),
            px=jnp.where(ok[:, None], uv, 0.0),
            active=ok)


def _gated_color_insert_core(cmap, pts_world, frame_valid, success, obs_time,
                             *, step, voxel_size, min_distance, max_probe,
                             budget):
    """success-gate + add_point_step stride + color_insert as ONE program
    (static stride: a 4x smaller batch means 4x fewer probe gathers, the
    dominant insert cost on TPU, vs masking)."""
    valid = frame_valid & success
    if step > 1:
        pts_world = pts_world[::step]
        valid = valid[::step]
    return cm.color_insert(cmap, pts_world, valid, obs_time,
                           voxel_size=voxel_size, min_distance=min_distance,
                           max_probe=max_probe, budget=budget)


_gated_color_insert = functools.partial(
    jax.jit, donate_argnums=(0,), static_argnames=(
        "step", "voxel_size", "min_distance", "max_probe", "budget")
)(_gated_color_insert_core)


def _vision_step_core(camera, color_map, tracks, prev_pyr, cur_pyr, rgb_img,
                 q_wi, t_wi, scal, n_new_visited, key, *,
                 lk_params, cols, rows, track_grid,
                 max_render_points, estimate_intrinsic, estimate_extrinsic,
                 fm_px=2.0, pnp_px=2.5):
    """One fused device program for the whole vision frame.

    `scal` packs the host scalars [dt, obs_time] into ONE transfer, and
    the PRNG key is split in-program (returning the successor key) — per
    -frame eager `random.split`/scalar uploads are ~0.15-0.5 ms of
    serial stream time each on a tunneled TPU."""
    dt, obs_time = scal[0], scal[1]
    key_next, key_f, key_pnp = jax.random.split(key, 3)
    m = tracks.reg_id.shape[0]
    registry = color_map.reg.shape[0]
    prev_imgs, prev_dx, prev_dy = prev_pyr
    cur_imgs, _, _ = cur_pyr

    # ---- 1. LK tracking (trackImage, opticalFlowTracker.cpp:111-186) ----
    n_active = jnp.sum(tracks.active)
    track_ok_gate = n_active >= 30
    ids_c = jnp.clip(tracks.reg_id, 0, registry - 1)
    # one packed-row gather serves the whole step (pos/rgb/cov/n/vel/out)
    reg_rows = color_map.reg[ids_c]                         # (M, 16)
    # GEOMETRIC LK seed: every track is a map point with a known world
    # position, and the sweep-reconstruction design means the LIO state
    # at the image instant is already solved when vision runs (the
    # reference's core idea, README.md:36-38).  Projecting the point
    # with that pose predicts its pixel in THIS image almost exactly —
    # under fast yaw (the r3live cone-panning profile, ~1.1 rad/s) the
    # inter-frame flow is ~50 px, beyond what a 4-level pyramid absorbs
    # from a zero or constant-velocity seed, while the projection seed
    # leaves LK only the small LIO/map residual to solve.  Falls back to
    # the stored per-track image velocity (OPTFLOW_USE_INITIAL_FLOW)
    # when the projection is invalid, then to a zero seed.
    _, t_wc0, q_cw0, t_cw0 = cam_mod.world_camera_pose(camera, q_wi, t_wi)
    pts_world = reg_rows[:, cm.C_POS]
    proj0, z_ok0, _ = cm.project_points(pts_world, q_cw0, t_cw0, camera.intr)
    seed_geo = proj0 - tracks.px
    geo_ok = z_ok0 & cm.in_fov(proj0, cols, rows, 0.02)
    seed_vel = reg_rows[:, cm.C_VEL] * dt
    vel_ok = (jnp.abs(seed_vel[:, 0]) < cols / 8.0) \
        & (jnp.abs(seed_vel[:, 1]) < rows / 8.0)
    seed = jnp.where(geo_ok[:, None], seed_geo,
                     jnp.where(vel_ok[:, None], seed_vel, 0.0))
    cur_px, status = lk.track_pyramidal(
        prev_imgs, cur_imgs, prev_dx, prev_dy, tracks.px, tracks.active,
        lk_params, init_flow=seed)
    status = status & tracks.active & track_ok_gate
    lk_ok = status

    # ---- 2. fundamental RANSAC gate (:144) ----
    f_inl = ransac.fundamental_ransac(tracks.px, cur_px, status, key_f,
                                      threshold=fm_px)
    status = status & f_inl
    fr_ok = status

    # ---- 3. FoV gate + image velocity (:155-171) ----
    uv_ok = cm.in_fov(cur_px, cols, rows, 0.05)
    status = status & uv_ok
    fov_ok = status
    vel = (cur_px - tracks.px) / jnp.maximum(dt, 1e-5)
    vel = jnp.where(dt < 1e-5, jnp.full_like(vel, 1e-3), vel)
    reg_rows = reg_rows.at[:, cm.C_VEL].set(
        jnp.where(status[:, None], vel, reg_rows[:, cm.C_VEL]))
    oob = registry + jnp.arange(m, dtype=jnp.int32)
    color_map = color_map._replace(
        reg=color_map.reg.at[jnp.where(status, ids_c, oob)].set(
            reg_rows, mode="drop", unique_indices=True))

    # ---- 4. PnP RANSAC outlier gate (removeOutlierUsingRansacPnp) ----
    pnp_inl, _q, _t = ransac.pnp_ransac(
        pts_world, cur_px, status, q_cw0, t_cw0, camera.intr, key_pnp,
        threshold=pnp_px)
    status = status & pnp_inl
    enough = jnp.sum(status) >= cam_mod.MIN_ITERATION_POINTS

    # ---- 5. 11-dof reprojection ESIKF ----
    img_vel_pts = reg_rows[:, cm.C_VEL]
    camera, _ok1 = cam_mod.vio_esikf(
        camera, q_wi, t_wi, pts_world, cur_px, img_vel_pts,
        status & enough, n_new_visited,
        estimate_intrinsic=estimate_intrinsic,
        estimate_extrinsic=estimate_extrinsic)

    # ---- 6. 6-dof photometric ESIKF ----
    camera, _ok2 = cam_mod.vio_photometric(
        camera, q_wi, t_wi, rgb_img, pts_world,
        reg_rows[:, cm.C_RGB], reg_rows[:, cm.C_COV],
        reg_rows[:, cm.C_NRGB], img_vel_pts, status & enough,
        n_new_visited)

    # ---- 7. render recent voxels with the refined pose ----
    _, t_wc, q_cw, t_cw = cam_mod.world_camera_pose(camera, q_wi, t_wi)
    color_map = cm.render_recent(
        color_map, rgb_img, q_cw, t_cw, t_wc, camera.intr, obs_time,
        cols=cols, rows=rows, max_render_points=max_render_points)

    # ---- 8. track maintenance (updateAndAppendTrackPoints, :13-102) ----
    proj_uv, z_ok, _pc = cm.project_points(pts_world, q_cw, t_cw, camera.intr)
    reproj_err = jnp.linalg.norm(proj_uv - cur_px, axis=-1)
    max_err = 2.0 * cols / 320.0
    oc = reg_rows[:, cm.C_OUT]                # unchanged by steps 3-7
    bad = status & (reproj_err > max_err)
    drop = bad & ((oc > 0) | (reproj_err > 2 * max_err))
    oc_new = jnp.where(bad & ~drop, oc + 1, jnp.where(status, 0.0, oc))
    # re-gather post-render rows so the outlier-column write does not
    # clobber the renderer's rgb/cov updates for tracked ids
    rows_post = color_map.reg[ids_c].at[:, cm.C_OUT].set(oc_new)
    color_map = color_map._replace(
        reg=color_map.reg.at[jnp.where(tracks.active, ids_c, oob)].set(
            rows_post, mode="drop", unique_indices=True))
    keep = status & ~drop

    # occupancy grid of surviving tracks
    ncx, ncy = cols // track_grid + 2, rows // track_grid + 2
    cell = (jnp.clip(jnp.round(cur_px[:, 1] / track_grid), 0, ncy - 1)
            .astype(jnp.int32) * ncx
            + jnp.clip(jnp.round(cur_px[:, 0] / track_grid), 0, ncx - 1)
            .astype(jnp.int32))
    occ = jnp.zeros((ncx * ncy,), bool).at[
        jnp.where(keep, cell, ncx * ncy)].set(True, mode="drop")

    # candidates from the map (selectPointsForProjection via refresh)
    cand_ids, cand_uv, cand_ok = cm.select_points_for_projection(
        color_map, q_cw, t_cw, t_wc, camera.intr, obs_time,
        max_out=m, cols=cols, rows=rows, grid_px=track_grid)
    # exclude already-tracked ids and occupied cells
    tracked_ids = jnp.where(keep, tracks.reg_id, -2)
    already = jnp.any(cand_ids[:, None] == tracked_ids[None, :], axis=1)
    c_cell = (jnp.clip(jnp.round(cand_uv[:, 1] / track_grid), 0, ncy - 1)
              .astype(jnp.int32) * ncx
              + jnp.clip(jnp.round(cand_uv[:, 0] / track_grid), 0, ncx - 1)
              .astype(jnp.int32))
    cand_ok = cand_ok & ~already & ~occ[c_cell]
    # within-batch cell dedup (keep lowest-index candidate per cell)
    cell_min = jnp.full((ncx * ncy,), m, jnp.int32).at[
        jnp.where(cand_ok, c_cell, ncx * ncy)].min(
            jnp.arange(m, dtype=jnp.int32), mode="drop")
    cand_ok = cand_ok & (cell_min[c_cell] == jnp.arange(m))

    # fill free slots with candidates
    free_rank = jnp.cumsum((~keep).astype(jnp.int32)) - 1   # rank of free slot
    cand_rank = jnp.cumsum(cand_ok.astype(jnp.int32)) - 1   # rank of candidate
    # map: for each slot, if free, take candidate with rank == free_rank
    cand_order = jnp.argsort(~cand_ok, stable=True)         # cands first
    n_cand = jnp.sum(cand_ok)
    take = jnp.clip(free_rank, 0, m - 1)
    use_cand = (~keep) & (free_rank < n_cand)
    new_ids = jnp.where(use_cand, cand_ids[cand_order][take], -1)
    new_px = jnp.where(use_cand[:, None], cand_uv[cand_order][take], 0.0)

    tracks_new = TrackState(
        reg_id=jnp.where(keep, tracks.reg_id, new_ids),
        px=jnp.where(keep[:, None], cur_px, new_px),
        active=keep | use_cand)

    # per-frame stats packed in-program: one device vector for the host
    # stats list instead of eager scalars.  [0]=LK+gates survivors,
    # [1]=kept tracks; [2:] per-stage survivor counts for observability
    # (active-in, post-LK, post-F-RANSAC, post-FoV, post-PnP, appended).
    return (camera, color_map, tracks_new,
            jnp.stack([jnp.sum(status), jnp.sum(keep),
                       n_active, jnp.sum(lk_ok), jnp.sum(fr_ok),
                       jnp.sum(fov_ok), jnp.sum(status),
                       jnp.sum(use_cand)]), key_next)



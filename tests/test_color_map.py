"""Tests for the colored map registry / render ops (ops.color_map)."""
import jax.numpy as jnp
import numpy as np

from sr_livo_tpu.ops import color_map as cm
from sr_livo_tpu.utils import lie

RNG = np.random.RandomState(9)


def _fresh(reg=4096, cap=1 << 12):
    return cm.make_color_map(reg, cap, 20)


def test_insert_allocates_registry():
    m = _fresh()
    pts = jnp.asarray(RNG.uniform(-5, 5, (200, 3)), jnp.float32)
    m, _ = cm.color_insert(m, pts, jnp.ones(200, bool), 1.0,
                        voxel_size=0.1, min_distance=0.01, max_probe=16)
    n = int(jnp.sum(m.reg_valid))
    assert n > 190  # nearly all distinct at this density
    assert int(m.count) >= n
    # registered positions match inputs
    ids = np.nonzero(np.asarray(m.reg_valid))[0]
    pos = np.asarray(m.pos[ids])
    d = np.min(np.linalg.norm(pos[:, None, :] - np.asarray(pts)[None], axis=-1),
               axis=1)
    assert d.max() < 1e-5


def test_insert_dedup_blocks_duplicates():
    m = _fresh()
    pts = jnp.asarray(RNG.uniform(0, 1, (50, 3)), jnp.float32)
    m, _ = cm.color_insert(m, pts, jnp.ones(50, bool), 1.0,
                        voxel_size=0.1, min_distance=0.01, max_probe=16)
    n1 = int(jnp.sum(m.reg_valid))
    # same points again: nothing new
    m, _ = cm.color_insert(m, pts + 1e-4, jnp.ones(50, bool), 2.0,
                        voxel_size=0.1, min_distance=0.01, max_probe=16)
    n2 = int(jnp.sum(m.reg_valid))
    assert n2 == n1


def test_recent_visit_tracking():
    m = _fresh()
    pts = jnp.asarray(RNG.uniform(-2, 2, (100, 3)), jnp.float32)
    m, _ = cm.color_insert(m, pts, jnp.ones(100, bool), 5.0,
                        voxel_size=0.1, min_distance=0.01, max_probe=16)
    n_recent = int(jnp.sum(m.vox_last_visit == 5.0))
    assert n_recent > 50
    # next sweep in a different area: old voxels not recent anymore
    m, _ = cm.color_insert(m, pts + 10.0, jnp.ones(100, bool), 6.0,
                        voxel_size=0.1, min_distance=0.01, max_probe=16)
    assert int(jnp.sum(m.vox_last_visit == 6.0)) > 50
    assert int(jnp.sum(m.vox_last_visit == 5.0)) > 0


def test_update_rgb_first_and_fusion():
    m = _fresh()
    ids = jnp.asarray([3, 7], jnp.int32)
    obs = jnp.asarray([[100.0, 150.0, 200.0], [50.0, 60.0, 70.0]])
    dist = jnp.asarray([5.0, 8.0])
    mask = jnp.asarray([True, True])
    m = cm.update_rgb(m, ids, obs, dist, 1.0, mask)
    assert np.allclose(m.rgb[3], [100, 150, 200])
    assert np.allclose(m.cov_rgb[3], cm.IMAGE_OBS_COV)
    assert int(m.n_rgb[3]) == 1
    assert float(m.obs_dist[7]) == 8.0

    # second observation fuses toward the new color, cov shrinks
    obs2 = jnp.asarray([[120.0, 150.0, 200.0], [50.0, 60.0, 70.0]])
    m2 = cm.update_rgb(m, ids, obs2, dist, 1.1, mask)
    assert 100.0 < float(m2.rgb[3, 0]) < 120.0
    assert float(m2.cov_rgb[3, 0]) < float(m.cov_rgb[3, 0])
    assert int(m2.n_rgb[3]) == 2


def test_update_rgb_occlusion_gate():
    m = _fresh()
    ids = jnp.asarray([0], jnp.int32)
    m = cm.update_rgb(m, ids, jnp.asarray([[100.0, 100.0, 100.0]]),
                      jnp.asarray([5.0]), 1.0, jnp.asarray([True]))
    # far observation (> 1.2x) rejected
    m2 = cm.update_rgb(m, ids, jnp.asarray([[200.0, 200.0, 200.0]]),
                       jnp.asarray([7.0]), 2.0, jnp.asarray([True]))
    assert np.allclose(m2.rgb[0], m.rgb[0])
    assert int(m2.n_rgb[0]) == 1
    # nearer observation accepted, obs_dist shrinks
    m3 = cm.update_rgb(m, ids, jnp.asarray([[200.0, 200.0, 200.0]]),
                       jnp.asarray([4.0]), 2.0, jnp.asarray([True]))
    assert int(m3.n_rgb[0]) == 2
    assert float(m3.obs_dist[0]) == 4.0


def test_render_recent_colors_points():
    m = _fresh()
    # points on the z=5 plane in front of a camera at origin looking +z
    xy = RNG.uniform(-1.5, 1.5, (100, 2))
    pts = np.c_[xy, np.full(100, 5.0)].astype(np.float32)
    m, _ = cm.color_insert(m, jnp.asarray(pts), jnp.ones(100, bool), 3.0,
                        voxel_size=0.1, min_distance=0.01, max_probe=16)
    # camera: identity orientation (camera frame == world frame)
    intr = jnp.asarray([100.0, 100.0, 80.0, 60.0], jnp.float32)
    q_cw = lie.quat_identity()
    t_cw = jnp.zeros(3, jnp.float32)
    t_wc = jnp.zeros(3, jnp.float32)
    # image: horizontal gradient
    us = np.arange(160, dtype=np.float32)
    img = np.tile(us[None, :, None], (120, 1, 3))
    m = cm.render_recent(m, jnp.asarray(img), q_cw, t_cw, t_wc, intr, 3.0,
                         cols=160, rows=120)
    ids = np.nonzero(np.asarray(m.reg_valid) & (np.asarray(m.n_rgb) > 0))[0]
    assert len(ids) > 60
    # rendered color equals the projected u coordinate
    pos = np.asarray(m.pos[ids])
    u = pos[:, 0] * 100.0 / pos[:, 2] + 80.0
    got = np.asarray(m.rgb[ids, 0])
    assert np.allclose(got, np.round(u), atol=1.0)


def test_select_points_for_projection_grid():
    m = _fresh()
    xy = RNG.uniform(-1.5, 1.5, (300, 2))
    pts = np.c_[xy, np.full(300, 5.0)].astype(np.float32)
    m, _ = cm.color_insert(m, jnp.asarray(pts), jnp.ones(300, bool), 3.0,
                        voxel_size=0.1, min_distance=0.01, max_probe=16)
    intr = jnp.asarray([100.0, 100.0, 80.0, 60.0], jnp.float32)
    ids, uv, ok = cm.select_points_for_projection(
        m, lie.quat_identity(), jnp.zeros(3, jnp.float32),
        jnp.zeros(3, jnp.float32), intr, 3.0,
        max_out=256, cols=160, rows=120, grid_px=10)
    n = int(ok.sum())
    assert n > 20
    uv_ok = np.asarray(uv)[np.asarray(ok)]
    # grid spacing respected: no two candidates in the same 10px cell
    cells = {(int(round(u / 10)), int(round(v / 10))) for u, v in uv_ok}
    assert len(cells) == n


def test_registry_exhaustion_degrades_gracefully():
    """Driving the registry past capacity must stop allocating (holes
    included) without crashing, and the existing map must stay usable
    (render + projection selection)."""
    reg_cap = 256
    m = cm.make_color_map(reg_cap, 1 << 10, 20)
    total_new = 0
    first_batch = None
    for k in range(6):
        # all points inside the small test camera's frustum (+z)
        pts = jnp.asarray(np.c_[RNG.uniform(-1.5, 1.5, (128, 2)),
                                RNG.uniform(2.0, 8.0, 128)], jnp.float32)
        if first_batch is None:
            first_batch = pts
        m, _ = cm.color_insert(m, pts, jnp.ones(128, bool), float(k),
                               voxel_size=0.1, min_distance=0.01,
                               max_probe=16)
        total_new += 128
    assert total_new > reg_cap          # we really oversubscribed
    # count saturates at/near capacity and never exceeds it by a batch
    assert int(m.count) >= reg_cap - 1
    n_valid = int(jnp.sum(m.reg_valid))
    assert n_valid <= reg_cap
    # further inserts are clean no-ops for the registry
    before = int(jnp.sum(m.reg_valid))
    pts = jnp.asarray(np.c_[RNG.uniform(-1.5, 1.5, (64, 2)),
                            RNG.uniform(2.0, 8.0, 64)], jnp.float32)
    m, _ = cm.color_insert(m, pts, jnp.ones(64, bool), 9.0,
                           voxel_size=0.1, min_distance=0.01, max_probe=16)
    assert int(jnp.sum(m.reg_valid)) == before
    # the saturated map still renders and still yields projection points:
    # re-observe the first (registered) batch so its voxels are recent
    m, _ = cm.color_insert(m, first_batch, jnp.ones(128, bool), 10.0,
                           voxel_size=0.1, min_distance=0.01, max_probe=16)
    q_cw = jnp.asarray([1.0, 0, 0, 0])
    t_cw = jnp.zeros(3)
    t_wc = jnp.zeros(3)
    intr = jnp.asarray([80.0, 80.0, 32.0, 32.0])
    img = jnp.full((64, 64, 3), 128.0)
    m = cm.render_recent(m, img, q_cw, t_cw, t_wc, intr, 10.0,
                         cols=64, rows=64, max_render_points=512)
    ids, uv, ok = cm.select_points_for_projection(
        m, q_cw, t_cw, t_wc, intr, 10.0, max_out=64, cols=64, rows=64,
        grid_px=8)
    assert int(jnp.sum(ok)) > 0


def test_dedup_grid_saturation_no_crash():
    """A dedup set driven to full occupancy must stop admitting points
    (probe failure) without corrupting earlier entries."""
    m = cm.make_color_map(64, 1 << 5, 4)   # dedup set = 64 cells
    kept = []
    for k in range(8):
        pts = jnp.asarray(RNG.uniform(-4, 4, (64, 3)), jnp.float32)
        m, _ = cm.color_insert(m, pts, jnp.ones(64, bool), float(k),
                               voxel_size=0.5, min_distance=0.05,
                               max_probe=8)
        kept.append(int(jnp.sum(m.reg_valid)))
    # monotone non-decreasing, bounded by the registry, no crash
    assert all(b >= a for a, b in zip(kept, kept[1:]))
    assert kept[-1] <= 64


def test_recent_slots_overflow_truncates():
    """More touched voxels in one insert than recent_slots capacity: the
    list fills completely with valid slots and drops the rest."""
    recent = 16
    m = cm.make_color_map(4096, 1 << 12, 8, recent=recent)
    # 200 points, all in distinct 0.1 m voxels -> >> recent touched slots
    g = np.stack(np.meshgrid(np.arange(20), np.arange(10)),
                 -1).reshape(-1, 2) * 0.5
    pts = jnp.asarray(np.c_[g, np.zeros(len(g))], jnp.float32)
    m, _ = cm.color_insert(m, pts, jnp.ones(len(g), bool), 1.0,
                           voxel_size=0.1, min_distance=0.01, max_probe=16)
    rs = np.asarray(m.recent_slots)
    assert (rs >= 0).all()               # list saturated
    assert len(np.unique(rs)) == recent  # all distinct slots

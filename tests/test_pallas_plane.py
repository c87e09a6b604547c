"""Pallas plane-residual kernel vs the pure-jnp reference path."""
import jax
import jax.numpy as jnp
import numpy as np

from sr_livo_tpu.models.lio import _plane_rows_jnp
from sr_livo_tpu.ops.pallas.plane_fit import plane_residuals_pallas
from sr_livo_tpu.utils import lie

RNG = np.random.RandomState(23)


def _inputs(q=300, m=20):
    # planar-ish neighborhoods with varying counts, sorted by distance
    world = RNG.uniform(-5, 5, (q, 3)).astype(np.float32)
    normal = RNG.randn(q, 3)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    t1 = np.cross(normal, [0.1, 0.7, 0.2])
    t1 /= np.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = np.cross(normal, t1)
    uv = RNG.uniform(-0.5, 0.5, (q, m, 2))
    nb = (world[:, None, :] + uv[..., :1] * t1[:, None, :]
          + uv[..., 1:] * t2[:, None, :]
          + RNG.randn(q, m, 3) * 0.01
          + normal[:, None, :] * RNG.uniform(-0.1, 0.1, (q, 1, 1)))
    d = np.linalg.norm(nb - world[:, None, :], axis=-1)
    order = np.argsort(d, axis=-1)
    nb = np.take_along_axis(nb, order[..., None], axis=1).astype(np.float32)
    n_found = RNG.randint(0, m + 1, q).astype(np.int32)
    location = RNG.uniform(-5, 5, (q, 3)).astype(np.float32)
    r_world = np.asarray(lie.exp_so3(jnp.asarray([0.2, -0.1, 0.4],
                                                 jnp.float32)))
    last_trans = np.array([0.3, -0.2, 1.0], np.float32)
    valid = RNG.rand(q) < 0.9
    return (jnp.asarray(nb), jnp.asarray(n_found), jnp.asarray(world),
            jnp.asarray(location), jnp.asarray(r_world),
            jnp.asarray(last_trans), jnp.asarray(valid))


def test_pallas_matches_jnp():
    args = _inputs()
    kw = dict(lam_w=0.9, lam_nb=0.1, power_planarity=2.0, max_dist=0.3,
              min_neighbors=12)
    hx_j, h_j, good_j = _plane_rows_jnp(*args, **kw)
    hx_p, h_p, good_p = plane_residuals_pallas(*args, **kw, interpret=True)
    good_j = np.asarray(good_j)
    good_p = np.asarray(good_p)
    assert (good_j == good_p).mean() > 0.995, (good_j.sum(), good_p.sum())
    both = good_j & good_p
    assert np.allclose(np.asarray(h_j)[both], np.asarray(h_p)[both],
                       atol=2e-4), np.abs(
                           np.asarray(h_j)[both] - np.asarray(h_p)[both]).max()
    assert np.allclose(np.asarray(hx_j)[both], np.asarray(hx_p)[both],
                       atol=2e-3)


def test_pallas_non_power2_planarity():
    args = _inputs(q=100)
    kw = dict(lam_w=0.9, lam_nb=0.1, power_planarity=1.5, max_dist=0.3,
              min_neighbors=8)
    hx_j, h_j, good_j = _plane_rows_jnp(*args, **kw)
    hx_p, h_p, good_p = plane_residuals_pallas(*args, **kw, interpret=True)
    both = np.asarray(good_j) & np.asarray(good_p)
    assert both.sum() > 10
    assert np.allclose(np.asarray(h_j)[both], np.asarray(h_p)[both],
                       atol=2e-4)


def test_iekf_with_pallas_interpret():
    """Full IEKF with the pallas residual path (interpret mode on CPU)."""
    from sr_livo_tpu.models import eskf, lio
    from sr_livo_tpu.ops import voxel_map as vm
    u = RNG.uniform(-6, 6, (4000, 2))
    world = np.concatenate([
        np.c_[u[:, 0], u[:, 1], np.zeros(4000)],
        np.c_[np.full(4000, 6.0), u[:, 0], u[:, 1] * 0.5 + 3],
        np.c_[u[:, 0], np.full(4000, 6.0), u[:, 1] * 0.5 + 3],
    ]).astype(np.float32)
    m = vm.make_map(1 << 14, 20)
    for i in range(0, world.shape[0], 4096):
        c = world[i:i + 4096]
        m, _ = vm.insert(m, jnp.asarray(c), jnp.ones(len(c), bool),
                         1.0, 0.05, 16)
    keypts = world[RNG.choice(len(world), 400, replace=False)]
    st = eskf.init_state()._replace(
        p=jnp.asarray([0.15, -0.1, 0.08], jnp.float32),
        q=lie.exp_so3_quat(jnp.asarray([0.02, -0.02, 0.02], jnp.float32)))
    import sr_livo_tpu.ops.pallas.plane_fit as pf
    import functools
    orig = pf.plane_residuals_pallas
    pf.plane_residuals_pallas = functools.partial(orig, interpret=True)
    try:
        out, summary = lio.iekf_update(
            st, m, jnp.asarray(keypts), jnp.ones(400, bool),
            jnp.zeros(3, jnp.float32), jnp.eye(3, dtype=jnp.float32),
            jnp.zeros(3, jnp.float32), jnp.int32(1),
            size_voxel_map=1.0, nb_voxels_visited=1, max_number_neighbors=20,
            min_number_neighbors=12, power_planarity=2.0,
            max_dist_to_plane=0.3, weight_alpha=0.9, weight_neighborhood=0.1,
            max_num_residuals=600, max_probe=16, max_iters=8,
            threshold_translation_norm=1e-3, threshold_orientation_norm=1e-2,
            laser_point_cov=0.001, use_pallas=True)
    finally:
        pf.plane_residuals_pallas = orig
    assert bool(summary.success)
    assert float(jnp.linalg.norm(out.p)) < 0.02

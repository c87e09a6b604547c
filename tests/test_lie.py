"""Property tests for the SO(3)/S2 math layer (sr_livo_tpu.utils.lie)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr_livo_tpu.utils import lie

RNG = np.random.RandomState(0)


def rand_w(n=64, scale=2.0):
    """Random rotation vectors with norm < pi (log is only a left inverse of
    exp inside the injectivity radius)."""
    v = RNG.randn(n, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    mags = RNG.uniform(0, min(scale, 3.0), size=(n, 1))
    return jnp.asarray(v * mags, jnp.float32)


def test_skew_vee_roundtrip():
    v = rand_w()
    assert np.allclose(lie.vee(lie.skew(v)), v, atol=1e-6)


def test_exp_log_roundtrip():
    w = rand_w(scale=1.0)
    r = lie.exp_so3(w)
    w2 = lie.log_so3(r)
    assert np.allclose(w, w2, atol=2e-4)


def test_exp_small_angle():
    w = rand_w(scale=1e-6)
    r = lie.exp_so3(w)
    assert np.allclose(r, np.eye(3) + np.asarray(lie.skew(w)), atol=1e-9)


def test_quat_rot_consistency():
    w = rand_w(scale=1.5)
    q = lie.exp_so3_quat(w)
    r = lie.exp_so3(w)
    assert np.allclose(lie.quat_to_rot(q), r, atol=1e-5)
    v = rand_w(scale=3.0)
    assert np.allclose(lie.quat_rotate(q, v),
                       jnp.einsum("nij,nj->ni", r, v), atol=1e-4)


def test_rot_to_quat_roundtrip():
    w = rand_w(scale=2.5)
    r = lie.exp_so3(w)
    q = lie.rot_to_quat(r)
    assert np.allclose(lie.quat_to_rot(q), r, atol=1e-5)


def test_quat_mul_matches_rot_mul():
    w1, w2 = rand_w(), rand_w()
    q = lie.quat_mul(lie.exp_so3_quat(w1), lie.exp_so3_quat(w2))
    r = jnp.einsum("nij,njk->nik", lie.exp_so3(w1), lie.exp_so3(w2))
    assert np.allclose(lie.quat_to_rot(q), r, atol=1e-5)


def test_jacobian_inverses():
    w = rand_w(scale=1.5)
    for j, jinv in [(lie.jl_so3, lie.inv_jl_so3), (lie.jr_so3, lie.inv_jr_so3)]:
        prod = jnp.einsum("nij,njk->nik", j(w), jinv(w))
        assert np.allclose(prod, np.broadcast_to(np.eye(3), prod.shape),
                           atol=1e-4)


def test_jl_jr_relation():
    # Jl(w) = Jr(-w)
    w = rand_w(scale=1.0)
    assert np.allclose(lie.jl_so3(w), lie.jr_so3(-w), atol=1e-5)


def test_jr_derivative_property():
    # exp(w + dw) ≈ exp(w) exp(Jr(w) dw)
    w = np.array([0.3, -0.5, 0.8], np.float32)
    dw = np.array([1e-3, -2e-3, 1.5e-3], np.float32)
    lhs = lie.exp_so3(jnp.asarray(w + dw))
    rhs = lie.exp_so3(jnp.asarray(w)) @ lie.exp_so3(
        lie.jr_so3(jnp.asarray(w)) @ jnp.asarray(dw))
    assert np.allclose(lhs, rhs, atol=1e-5)


def test_s2_bx_tangency():
    # Columns of B_x are orthogonal to g and unit norm (for normalized g).
    g = jnp.asarray(RNG.randn(32, 3) * 3 + np.array([0, 0, 5.0]), jnp.float32)
    bx = lie.s2_bx(g)
    gn = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    dots = jnp.einsum("ni,nij->nj", gn, bx)
    assert np.allclose(dots, 0.0, atol=1e-5)
    norms = jnp.linalg.norm(bx, axis=-2)
    assert np.allclose(norms, 1.0, atol=1e-5)


def test_s2_bx_matches_reference_formula():
    g = jnp.asarray([0.1, -0.2, 9.8], jnp.float32)
    bx = np.asarray(lie.s2_bx(g))
    gn = np.asarray(g) / np.linalg.norm(g)
    expect = np.array([
        [1 - gn[0] ** 2 / (1 + gn[2]), -gn[0] * gn[1] / (1 + gn[2])],
        [-gn[0] * gn[1] / (1 + gn[2]), 1 - gn[1] ** 2 / (1 + gn[2])],
        [-gn[0], -gn[1]],
    ])
    assert np.allclose(bx, expect, atol=1e-6)


def test_rot_from_v1_to_v2():
    v1 = jnp.asarray(RNG.randn(16, 3), jnp.float32)
    v2 = jnp.asarray(RNG.randn(16, 3), jnp.float32)
    r = lie.rot_from_v1_to_v2(v1, v2)
    got = jnp.einsum("nij,nj->ni", r, v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True))
    want = v2 / jnp.linalg.norm(v2, axis=-1, keepdims=True)
    assert np.allclose(got, want, atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    w = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    q0 = lie.quat_identity((1,))
    q1 = lie.exp_so3_quat(w)
    assert np.allclose(lie.slerp(q0, q1, 0.0), q0, atol=1e-6)
    assert np.allclose(np.abs(np.sum(np.asarray(lie.slerp(q0, q1, 1.0)) *
                                     np.asarray(q1), axis=-1)), 1.0, atol=1e-6)
    qm = lie.slerp(q0, q1, 0.5)
    assert np.allclose(lie.quat_to_rot(qm), lie.exp_so3(0.5 * w), atol=1e-5)


def test_angular_distance():
    w = jnp.asarray([[0.0, 0.0, np.pi / 6]], jnp.float32)
    assert np.allclose(lie.angular_distance_deg(w), 30.0, atol=1e-3)


def test_jit_compat():
    f = jax.jit(lambda w: lie.log_so3(lie.exp_so3(w)))
    w = rand_w(8)
    assert np.allclose(f(w), w, atol=2e-4)

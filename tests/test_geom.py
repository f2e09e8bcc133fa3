"""Tests for argus_tpu.geom (mirrors reference tests/test_utils.py:18-87 plus
exp/log/group-op property tests against scipy ground truth)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from argus_tpu import geom


def test_xyzwxyz_to_xyzxyzw_SE3():
    xyzwxyz = jnp.array([1, 2, 3, 0.5, 0.6, 0.7, 0.8])
    expected = jnp.array([1, 2, 3, 0.6, 0.7, 0.8, 0.5])
    assert jnp.allclose(geom.xyzwxyz_to_xyzxyzw_SE3(xyzwxyz), expected)

    xyzwxyz = jnp.array([[1, 2, 3, 0.5, 0.6, 0.7, 0.8], [4, 5, 6, 0.1, 0.2, 0.3, 0.4]])
    expected = jnp.array([[1, 2, 3, 0.6, 0.7, 0.8, 0.5], [4, 5, 6, 0.2, 0.3, 0.4, 0.1]])
    assert jnp.allclose(geom.xyzwxyz_to_xyzxyzw_SE3(xyzwxyz), expected)

    # numpy passthrough
    out = geom.xyzwxyz_to_xyzxyzw_SE3(np.asarray(xyzwxyz))
    assert isinstance(out, np.ndarray)
    assert np.allclose(out, np.asarray(expected))


def test_xyzxyzw_to_xyzwxyz_SE3():
    xyzxyzw = jnp.array([1, 2, 3, 0.6, 0.7, 0.8, 0.5])
    expected = jnp.array([1, 2, 3, 0.5, 0.6, 0.7, 0.8])
    assert jnp.allclose(geom.xyzxyzw_to_xyzwxyz_SE3(xyzxyzw), expected)

    # round trip on random SE3
    key = jax.random.PRNGKey(0)
    poses = geom.random_SE3(key, (2,))
    assert jnp.allclose(geom.xyzxyzw_to_xyzwxyz_SE3(geom.xyzwxyz_to_xyzxyzw_SE3(poses)), poses)


def test_convert_pose_mjpc_to_unity():
    """Exact-value tests against hand-computed 45-degree rotations
    (reference: tests/test_utils.py:52-76)."""
    pose_mjpc = np.array([[0.1, 0.2, 0.3, 0.92387953, 0.38268343, 0.0, 0.0]])
    pose_unity = geom.convert_pose_mjpc_to_unity(pose_mjpc)
    euler = geom.convert_unity_quat_to_euler(pose_unity[0, 3:])
    assert np.allclose(pose_unity, np.array([[-0.2, 0.3, 0.1, 0.0, 0.0, -0.38268343, 0.92387953]]))
    assert np.allclose(euler, np.array([0.0, 0.0, -45.0]))

    pose_mjpc = np.array([[0.1, 0.2, 0.3, 0.92387953, 0.0, 0.38268343, 0.0]])
    pose_unity = geom.convert_pose_mjpc_to_unity(pose_mjpc)
    euler = geom.convert_unity_quat_to_euler(pose_unity[0, 3:])
    assert np.allclose(pose_unity, np.array([[-0.2, 0.3, 0.1, 0.38268343, 0.0, 0.0, 0.92387953]]))
    assert np.allclose(euler, np.array([45.0, 0.0, 0.0]))

    pose_mjpc = np.array([[0.1, 0.2, 0.3, 0.92387953, 0.0, 0.0, 0.38268343]])
    pose_unity = geom.convert_pose_mjpc_to_unity(pose_mjpc)
    euler = geom.convert_unity_quat_to_euler(pose_unity[0, 3:])
    assert np.allclose(pose_unity, np.array([[-0.2, 0.3, 0.1, 0.0, -0.38268343, 0.0, 0.92387953]]))
    assert np.allclose(euler, np.array([0.0, -45.0, 0.0]))


def test_convert_pose_unity_to_mjpc_roundtrip():
    rng = np.random.default_rng(0)
    pose_mjpc = rng.random((2, 7))
    pose_mjpc[..., 3:] /= np.linalg.norm(pose_mjpc[..., 3:], axis=-1, keepdims=True)
    assert np.allclose(pose_mjpc, geom.convert_pose_unity_to_mjpc(geom.convert_pose_mjpc_to_unity(pose_mjpc)))


# ───────────────────────── SE(3)/so(3) core math ─────────────────────────


def _bounded_tangent(key, shape, max_angle=0.95 * np.pi):
    """Random rotation tangents with |phi| < pi (log is only injective there)."""
    phi = jax.random.normal(key, shape)
    norm = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    return phi / norm * (max_angle * jax.random.uniform(key, norm.shape))


def test_so3_exp_log_roundtrip():
    key = jax.random.PRNGKey(1)
    phi = _bounded_tangent(key, (64, 3))
    q = geom.so3_exp(phi)
    assert jnp.allclose(jnp.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    phi_back = geom.so3_log(q)
    assert jnp.allclose(phi, phi_back, atol=1e-4)


def test_so3_exp_matches_scipy():
    rng = np.random.default_rng(2)
    phi = rng.normal(size=(32, 3))
    q_ours = np.asarray(geom.so3_exp(jnp.asarray(phi)))
    q_scipy = R.from_rotvec(phi).as_quat()  # scipy returns xyzw
    # quaternions are sign-ambiguous
    sign = np.sign(np.sum(q_ours * q_scipy, axis=-1, keepdims=True))
    assert np.allclose(q_ours, sign * q_scipy, atol=1e-5)


def test_so3_small_angle():
    phi = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    q = geom.so3_exp(phi)
    assert jnp.allclose(q, jnp.array([[5e-10, 0, 0, 1.0], [0, 0, 0, 1.0]]), atol=1e-7)
    assert jnp.allclose(geom.so3_log(q), phi, atol=1e-7)
    # gradients stay finite through the small-angle branch
    g = jax.grad(lambda p: jnp.sum(geom.so3_exp(p)))(jnp.zeros(3))
    assert jnp.all(jnp.isfinite(g))
    g2 = jax.grad(lambda p: jnp.sum(geom.se3_log(geom.se3_exp(p)) ** 2))(jnp.zeros(6) + 1e-8)
    assert jnp.all(jnp.isfinite(g2))


def test_se3_exp_log_roundtrip():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    rho = jax.random.normal(k1, (64, 3))
    phi = _bounded_tangent(k2, (64, 3))
    tau = jnp.concatenate([rho, phi], axis=-1)
    pose = geom.se3_exp(tau)
    tau_back = geom.se3_log(pose)
    assert jnp.allclose(tau, tau_back, atol=2e-4)


def test_se3_exp_uses_left_jacobian():
    """The SE(3) exponential couples rotation and translation: for phi != 0 the
    translation is J_l(phi) @ rho, not rho itself (pypose semantics)."""
    tau = jnp.array([1.0, 0.0, 0.0, 0.0, 0.0, jnp.pi / 2])
    pose = geom.se3_exp(tau)
    # rotating pi/2 about z while translating along x traces a quarter circle:
    # closed form J_l @ rho = [sin(t)/t, (1-cos(t))/t, 0] * |rho| at t=pi/2
    t = jnp.pi / 2
    expected_t = jnp.array([jnp.sin(t) / t, (1 - jnp.cos(t)) / t, 0.0])
    assert jnp.allclose(pose[:3], expected_t, atol=1e-5)


def test_se3_group_ops():
    key1, key2 = jax.random.split(jax.random.PRNGKey(4))
    a = geom.random_SE3(key1, (8,))
    b = geom.random_SE3(key2, (8,))
    ident = jnp.array([0.0, 0, 0, 0, 0, 0, 1.0])
    # a . a^-1 = identity
    prod = geom.se3_multiply(a, geom.se3_inverse(a))
    assert jnp.allclose(prod[..., :3], 0.0, atol=1e-5)
    assert jnp.allclose(jnp.abs(prod[..., 6]), 1.0, atol=1e-5)
    # associativity vs matrix representation
    m_ab = np.asarray(geom.se3_matrix(geom.se3_multiply(a, b)))
    m_a = np.asarray(geom.se3_matrix(a))
    m_b = np.asarray(geom.se3_matrix(b))
    assert np.allclose(m_ab, m_a @ m_b, atol=1e-5)
    # identity composition
    assert jnp.allclose(geom.se3_multiply(jnp.broadcast_to(ident, a.shape), a), a, atol=1e-6)


def test_se3_matrix_matches_scipy():
    key = jax.random.PRNGKey(5)
    pose = geom.random_SE3(key, (16,))
    m = np.asarray(geom.se3_matrix(pose))
    R_scipy = R.from_quat(np.asarray(pose[..., 3:7])).as_matrix()
    assert np.allclose(m[..., :3, :3], R_scipy, atol=1e-5)
    assert np.allclose(m[..., :3, 3], np.asarray(pose[..., :3]), atol=1e-6)


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(6)
    pose = geom.random_SE3(key, (16,))
    v = jax.random.normal(jax.random.PRNGKey(7), (16, 3))
    rotated = geom.quat_rotate(pose[..., 3:7], v)
    m = geom.se3_matrix(pose)[..., :3, :3]
    assert jnp.allclose(rotated, jnp.einsum("...ij,...j->...i", m, v), atol=1e-5)


def test_geom_is_jittable():
    f = jax.jit(lambda tau, pose: geom.se3_log(geom.se3_multiply(geom.se3_exp(tau), geom.se3_inverse(pose))))
    tau = jnp.zeros((4, 6))
    pose = geom.random_SE3(jax.random.PRNGKey(8), (4,))
    out = f(tau, pose)
    assert out.shape == (4, 6)
    assert jnp.all(jnp.isfinite(out))

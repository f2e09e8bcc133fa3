"""Keypoint+PnP variant tests: matrix->quat, triangulation, Procrustes, the full
images->pose fit, and the network forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from argus_tpu import geom
from argus_tpu.models import keypoint_net as K


def _toy_cameras():
    """Two synthetic calibrated cameras looking at the origin from +/- 30 deg."""
    cams = []
    f, cx, cy = 300.0, 128.0, 128.0
    Kmat = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])
    for angle in (-0.5, 0.5):
        Rwc = R.from_euler("y", angle).as_matrix()
        cam_pos = Rwc @ np.array([0.0, 0.0, 0.6])
        R_cam = Rwc.T
        t = -R_cam @ cam_pos
        cams.append(Kmat @ np.concatenate([R_cam, t[:, None]], axis=1))
    return jnp.asarray(np.stack(cams))  # (2, 3, 4)


def test_matrix_to_quat_matches_scipy():
    rng = np.random.default_rng(0)
    quats = R.random(32, random_state=np.random.RandomState(0)).as_quat()  # xyzw
    mats = R.from_quat(quats).as_matrix()
    ours = np.asarray(geom.matrix_to_quat(jnp.asarray(mats)))
    sign = np.sign(np.sum(ours * quats, axis=-1, keepdims=True))
    assert np.allclose(ours, sign * quats, atol=1e-5)
    # near-identity and 180-degree cases
    for rv in ([0, 0, 0], [np.pi, 0, 0], [0, np.pi, 0], [0, 0, np.pi]):
        m = R.from_rotvec(rv).as_matrix()
        q = np.asarray(geom.matrix_to_quat(jnp.asarray(m)))
        expect = R.from_rotvec(rv).as_quat()
        sign = np.sign(np.sum(q * expect) + 1e-12)
        assert np.allclose(q, sign * expect, atol=1e-5), rv


def test_project_triangulate_roundtrip():
    P = _toy_cameras()
    key = jax.random.PRNGKey(0)
    pts = 0.05 * jax.random.normal(key, (4, 8, 3))  # points near the origin
    uv = K.project_points(P[None], pts[:, None])  # (4, 2, 8, 2)
    rec = K.triangulate_points(P, uv)
    assert rec.shape == (4, 8, 3)
    assert jnp.allclose(rec, pts, atol=1e-4)


def test_procrustes_recovers_pose():
    P_corners = K.cube_corners()
    key = jax.random.PRNGKey(1)
    pose = geom.random_SE3(key, (6,))
    observed = geom.quat_rotate(pose[:, None, 3:7], P_corners[None]) + pose[:, None, :3]
    fit = K.procrustes_pose(P_corners, observed)
    assert jnp.allclose(fit[:, :3], pose[:, :3], atol=1e-5)
    dot = jnp.abs(jnp.sum(fit[:, 3:] * pose[:, 3:], axis=-1))
    assert jnp.all(dot > 1.0 - 1e-5)  # same rotation up to sign


def test_fit_pose_end_to_end():
    """GT pose -> projected corners -> triangulate+procrustes recovers the pose."""
    P = _toy_cameras()
    key = jax.random.PRNGKey(2)
    tau = 0.1 * geom.random_se3(key, (5,))
    pose = geom.se3_exp(tau)
    corners = K.cube_corners()
    world = geom.quat_rotate(pose[:, None, 3:7], corners[None]) + pose[:, None, :3]
    uv = K.project_points(P[None], world[:, None])  # (5, 2, 8, 2)
    fit = jax.jit(lambda uv: K.fit_pose(P, uv))(uv)
    assert jnp.allclose(fit[:, :3], pose[:, :3], atol=1e-4)
    dot = jnp.abs(jnp.sum(fit[:, 3:] * pose[:, 3:], axis=-1))
    assert jnp.all(dot > 1.0 - 1e-4)


def test_keypoint_loss_zero_at_truth():
    P = _toy_cameras()
    key = jax.random.PRNGKey(3)
    pose = geom.se3_exp(0.1 * geom.random_se3(key, (3,)))
    corners = K.cube_corners()
    world = geom.quat_rotate(pose[:, None, 3:7], corners[None]) + pose[:, None, :3]
    uv = K.project_points(P[None], world[:, None])
    losses = K.keypoint_loss_fn(uv, pose, P)
    assert losses.shape == (3,)
    assert jnp.allclose(losses, 0.0, atol=1e-4)
    # and gradients flow
    g = jax.grad(lambda u: jnp.mean(K.keypoint_loss_fn(u, pose, P)))(uv + 1.0)
    assert jnp.all(jnp.isfinite(g))
    assert not jnp.allclose(g, 0.0)


def test_keypoint_net_forward():
    cfg = K.CubeKeypointNetConfig(n_cams=2, backbone="resnet18", head_features=32)
    model = K.CubeKeypointNet(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 6))
    variables = model.init(jax.random.PRNGKey(5), x, train=False)
    (uv, heatmaps), _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert uv.shape == (2, 2, 8, 2)
    assert heatmaps.shape == (4, 8, 8, 8)  # 64/8 = 8
    # soft-argmax output lies inside the image
    assert jnp.all(uv >= 0) and jnp.all(uv <= 64)
    probs_sum = jnp.sum(heatmaps, axis=(1, 2))
    assert jnp.allclose(probs_sum, 1.0, atol=1e-4)

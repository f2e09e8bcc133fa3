"""Keypoint-detection + PnP pose-fitting variant.

The BASELINE config list includes a "keypoint-detection head + PnP pose-fitting
variant" of the estimator. This module provides it, fully differentiable and
jittable:

  1. `CubeKeypointNet` — shared ResNet backbone over cameras (same fold-into-batch
     trick as NCameraCNN), a light upsampling head producing per-corner heatmaps,
     and a spatial soft-argmax giving sub-pixel 2D corner estimates per camera.
  2. `triangulate_points` — batched two-(or N-)view DLT triangulation of each cube
     corner from the calibrated cameras' 3x4 projection matrices (normal-equation
     solve: MXU-friendly tiny matmuls, no SVD on the hot path).
  3. `procrustes_pose` — orthogonal-Procrustes fit of the canonical corner layout
     to the triangulated corners -> SE(3) pose (rotation via 3x3 SVD, translation
     from centroids).
  4. `keypoint_loss_fn` / `fit_pose` — training loss (soft-argmax vs projected
     ground-truth corners) and the full images -> SE(3) inference path.

Camera projection matrices come from the validation scene's calibrated cameras
(`scripts/mujoco_rendering.py::compute_camera_matrix`) or ZED intrinsics for the
real rig.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from argus_tpu.geom import matrix_to_quat
from argus_tpu.models.resnet import BACKBONES


# canonical reorientation-cube corners (3.5 cm half-width, the MJCF cube geometry)
def cube_corners(half_width: float = 0.035) -> jnp.ndarray:
    """(8, 3) corner offsets in the cube frame, +/- half_width per axis."""
    signs = jnp.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        jnp.float32,
    )
    return half_width * signs


@dataclass(frozen=True)
class CubeKeypointNetConfig:
    """Config for the keypoint variant.

    Fields:
        n_cams: number of cameras.
        n_keypoints: tracked cube corners (8).
        backbone: ResNet variant for the shared encoder.
        head_features: channels in the upsampling head.
        heatmap_stride: output heatmap stride relative to the input (8 -> 32x32
            heatmaps for 256x256 inputs).
        dtype: compute dtype.
    """

    n_cams: int = 2
    n_keypoints: int = 8
    backbone: str = "resnet18"
    head_features: int = 128
    heatmap_stride: int = 8
    dtype: str = "float32"
    # frozen-BN fine-tune mode for the shared encoder (see models/pose_cnn.py)
    bn_frozen: bool = False
    bn_frozen_affine: bool = False
    # freeze the stem in fine-tune (see models/resnet.py stem_frozen)
    stem_frozen: bool = False
    # progressive layer freezing: freeze stem + stages 0..k-1 (models/resnet.py
    # frozen_stages); 0 = off
    frozen_stages: int = 0
    # Fused-Pallas-backbone knobs, forwarded to the encoder (models/resnet.py
    # fuse_*; same "auto"/"on"/"off" semantics, engaged only under frozen
    # BN+affine). Default OFF for this family — unlike the resnet50 pose-cnn,
    # the resnet18 encoder measured SLOWER fused at the bench shapes
    # (B=256 2x256x256: 111.1 ms fused vs 102.9 exact-BN XLA, BENCH r5;
    # .bench/probe_kp_fuse_split.py splits the freezing/fusion levers) — its
    # 64/128-channel BasicBlock stages sit exactly in the F<128 lane-underfill
    # geometry where XLA's conv custom-calls win (docs/ROUND5_NOTES.md).
    fuse_block: str = "off"
    fuse_proj: str = "off"
    fuse_stem: str = "off"
    fuse_stage: str = "off"


class CubeKeypointNet(nn.Module):
    """Images -> per-camera corner heatmaps + soft-argmax 2D keypoints."""

    cfg: CubeKeypointNetConfig = field(default_factory=CubeKeypointNetConfig)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: (B, H, W, 3*n_cams). Returns (keypoints_uv, heatmaps):
        keypoints_uv: (B, n_cams, K, 2) pixel coordinates (u=x, v=y),
        heatmaps: (B*n_cams, H/stride, W/stride, K) post-softmax probabilities."""
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        if x.ndim != 4:
            raise ValueError("input must be (B, H, W, 3*n_cams)")
        B, H, W, C = x.shape
        if C != 3 * cfg.n_cams:
            raise ValueError(f"expected {3 * cfg.n_cams} channels, got {C}")

        per_cam = x.reshape(B, H, W, cfg.n_cams, 3)
        per_cam = jnp.moveaxis(per_cam, 3, 1).reshape(B * cfg.n_cams, H, W, 3)

        backbone = BACKBONES[cfg.backbone](
            output_dim=None,
            dtype=dtype,
            bn_frozen=cfg.bn_frozen,
            bn_frozen_affine=cfg.bn_frozen_affine,
            stem_frozen=cfg.stem_frozen,
            frozen_stages=cfg.frozen_stages,
            fuse_block=cfg.fuse_block,
            fuse_proj=cfg.fuse_proj,
            fuse_stem=cfg.fuse_stem,
            fuse_stage=cfg.fuse_stage,
            name="backbone",
        )
        feats = backbone(per_cam, train=train, return_spatial=True)  # (N, H/32, W/32, C')

        # upsampling head: resize-conv blocks from stride 32 to heatmap_stride
        y = feats.astype(dtype)
        stride = 32
        i = 0
        while stride > cfg.heatmap_stride:
            n, h, w, c = y.shape
            y = jax.image.resize(y, (n, h * 2, w * 2, c), method="nearest")
            y = nn.Conv(cfg.head_features, (3, 3), padding="SAME", dtype=dtype, name=f"up{i}")(y)
            y = nn.LayerNorm(dtype=dtype, name=f"up_norm{i}")(y)
            y = nn.relu(y)
            stride //= 2
            i += 1
        logits = nn.Conv(cfg.n_keypoints, (1, 1), dtype=jnp.float32, name="heatmap")(
            y.astype(jnp.float32)
        )  # (N, h, w, K)

        # spatial softmax + soft-argmax (sub-pixel, differentiable)
        n, h, w, k = logits.shape
        flat = logits.reshape(n, h * w, k)
        probs = jax.nn.softmax(flat, axis=1).reshape(n, h, w, k)
        # pixel-center grids in INPUT resolution
        us = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (W / w)
        vs = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (H / h)
        u = jnp.einsum("nhwk,w->nk", probs, us)
        v = jnp.einsum("nhwk,h->nk", probs, vs)
        uv = jnp.stack([u, v], axis=-1)  # (N, K, 2)
        return uv.reshape(B, cfg.n_cams, k, 2), probs


def nominal_camera_matrices(
    height: int = 256, width: int = 256, fovy_deg: float = 52.0
) -> jnp.ndarray:
    """(2, 3, 4) projection matrices for the rig's nominal cameras.

    Extrinsics: the CAD-nominal camera mounts (datagen.CAM1_NOMINAL/CAM2_NOMINAL,
    Unity frame) converted to the MuJoCo world frame and oriented to look at the
    cube (identical to the generated validation scene,
    scripts/make_mujoco_scene.py); intrinsics from the vertical FOV. Per-sample
    camera perturbations in the sim data act as calibration noise the keypoint
    head must absorb — the same noise the direct-regression variant absorbs.
    """
    import numpy as np

    from argus_tpu.datagen import CAM1_NOMINAL, CAM2_NOMINAL
    from argus_tpu.geom import convert_pose_unity_to_mjpc

    # MuJoCo-style pinhole: camera looks along -z, so K00 = -f (u right) and
    # K11 = +f (v down) — matches scripts/mujoco_rendering.py::compute_camera_matrix
    f = 0.5 * height / np.tan(np.deg2rad(fovy_deg) / 2.0)
    Kmat = np.array([[-f, 0.0, (width - 1) / 2.0], [0.0, f, (height - 1) / 2.0], [0.0, 0.0, 1.0]])
    target = np.array([0.0, 0.0, 0.05])
    up = np.array([0.0, 0.0, 1.0])

    mats = []
    for nominal in (CAM1_NOMINAL, CAM2_NOMINAL):
        pos = convert_pose_unity_to_mjpc(nominal[None])[0, :3]
        z_cam = pos - target
        z_cam = z_cam / np.linalg.norm(z_cam)
        x_cam = np.cross(up, z_cam)
        x_cam = x_cam / np.linalg.norm(x_cam)
        y_cam = np.cross(z_cam, x_cam)
        R_wc = np.stack([x_cam, y_cam, z_cam])  # world -> camera rows
        t = -R_wc @ pos
        mats.append(Kmat @ np.concatenate([R_wc, t[:, None]], axis=1))
    return jnp.asarray(np.stack(mats), jnp.float32)


# ───────────────────────────── multi-view pose fitting ─────────────────────────────


def project_points(P: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Project world points through 3x4 camera matrices.

    P: (..., 3, 4); pts: (..., K, 3) -> (..., K, 2) pixel coords.
    """
    homo = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)  # (..., K, 4)
    proj = jnp.einsum("...ij,...kj->...ki", P, homo)  # (..., K, 3)
    return proj[..., :2] / jnp.where(jnp.abs(proj[..., 2:]) < 1e-8, 1e-8, proj[..., 2:])


def triangulate_points(P: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """DLT triangulation of K points seen by C calibrated cameras.

    P: (C, 3, 4) camera matrices; uv: (..., C, K, 2) pixel observations.
    Returns (..., K, 3) world points via the normal equations of the stacked
    2C x 4 DLT system (tiny batched solves — no SVD on the hot path).
    """
    # rows: u * P3 - P1 = 0 ; v * P3 - P2 = 0 per camera
    P1, P2, P3 = P[..., 0, :], P[..., 1, :], P[..., 2, :]  # (C, 4)
    u = uv[..., 0]  # (..., C, K)
    v = uv[..., 1]
    rows_u = u[..., None] * P3[:, None, :] - P1[:, None, :]  # (..., C, K, 4)
    rows_v = v[..., None] * P3[:, None, :] - P2[:, None, :]
    A = jnp.concatenate([rows_u, rows_v], axis=-3)  # (..., 2C, K, 4)
    A = jnp.moveaxis(A, -3, -2)  # (..., K, 2C, 4)
    # split homogeneous: A[..., :3] x = -A[..., 3]
    M = A[..., :3]
    b = -A[..., 3]
    MtM = jnp.einsum("...ri,...rj->...ij", M, M)  # (..., K, 3, 3)
    Mtb = jnp.einsum("...ri,...r->...i", M, b)  # (..., K, 3)
    MtM = MtM + 1e-8 * jnp.eye(3, dtype=MtM.dtype)
    return jnp.linalg.solve(MtM, Mtb[..., None])[..., 0]


def procrustes_pose(canonical: jnp.ndarray, observed: jnp.ndarray) -> jnp.ndarray:
    """Rigid fit: find SE(3) 7-vector T (xyzw quat) minimizing |T(canonical) - observed|.

    canonical: (K, 3); observed: (..., K, 3). Orthogonal Procrustes via batched
    3x3 SVD with reflection correction.
    """
    c0 = jnp.mean(canonical, axis=-2)  # (3,)
    o0 = jnp.mean(observed, axis=-2, keepdims=True)  # (..., 1, 3)
    Xc = canonical - c0
    Yc = observed - o0
    H = jnp.einsum("...ki,kj->...ij", Yc, Xc)  # (..., 3, 3) covariance (obs x canon)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    D = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )  # fix reflections
    R = jnp.einsum("...ij,...j,...jk->...ik", U, D, Vt)
    t = o0[..., 0, :] - jnp.einsum("...ij,j->...i", R, c0)
    return jnp.concatenate([t, matrix_to_quat(R)], axis=-1)


def fit_pose(P: jnp.ndarray, keypoints_uv: jnp.ndarray, half_width: float = 0.035) -> jnp.ndarray:
    """Full pose fit: per-camera 2D corners -> triangulated corners -> SE(3).

    P: (n_cams, 3, 4); keypoints_uv: (B, n_cams, 8, 2) -> (B, 7) xyzw poses.
    """
    pts3d = triangulate_points(P, keypoints_uv)  # (B, 8, 3)
    return procrustes_pose(cube_corners(half_width), pts3d)


def keypoint_loss_fn(
    keypoints_uv: jnp.ndarray,
    pose_true: jnp.ndarray,
    P: jnp.ndarray,
    half_width: float = 0.035,
) -> jnp.ndarray:
    """Per-sample keypoint supervision: MSE (pixels^2) between predicted corners and
    the ground-truth pose's corners projected into each camera.

    keypoints_uv: (B, n_cams, 8, 2); pose_true: (B, 7) xyzw; P: (n_cams, 3, 4).
    Returns (B,) losses.
    """
    from argus_tpu.geom import quat_rotate

    corners = cube_corners(half_width)  # (8, 3)
    world = (
        quat_rotate(pose_true[:, None, 3:7], corners[None]) + pose_true[:, None, :3]
    )  # (B, 8, 3)
    target_uv = project_points(P[None], world[:, None])  # (B, n_cams, 8, 2)
    return jnp.mean(jnp.sum((keypoints_uv - target_uv) ** 2, axis=-1), axis=(-2, -1))

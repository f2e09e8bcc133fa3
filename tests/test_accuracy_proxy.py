"""Accuracy proxy without Unity (VERDICT r1 #9): both model families must LEARN
POSE — reported as rotation/translation error, not tangent-space loss — from the
corner-projection synthetic dataset (the 8 cube corners rendered through the rig's
nominal camera matrices, data/synthetic.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from argus_tpu.geom import pose_errors, se3_exp, xyzwxyz_to_xyzxyzw_SE3


def _eval_pose_errors(cfg, state, dataset):
    """(rot_deg, trans_m) means over a dataset split."""
    from argus_tpu.models.keypoint_net import fit_pose, nominal_camera_matrices
    from argus_tpu.train import build_model

    model, _ = build_model(cfg)
    variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
    idxs = list(range(len(dataset)))
    images = jnp.asarray(dataset.load_images_batch(idxs))
    gt = jnp.asarray(dataset.cube_poses[idxs])  # (N, 7) xyzw

    pred = model.apply(variables, images.astype(jnp.float32) / 255.0, train=False)
    if cfg.model_type == "keypoint":
        crop = tuple(cfg.dataset_config.center_crop)
        uv, _ = pred
        poses = fit_pose(nominal_camera_matrices(*crop), uv)
    else:
        poses = se3_exp(pred)
    rot, trans = pose_errors(poses, gt)
    return float(jnp.mean(rot)), float(jnp.mean(trans))


def _run_family(model_type: str, ds_dir: str, n_epochs: int):
    from argus_tpu.checkpoint import load_checkpoint
    from argus_tpu.data import CameraCubePoseDataset, CameraCubePoseDatasetConfig
    from argus_tpu.models import NCameraCNNConfig
    from argus_tpu.models.keypoint_net import CubeKeypointNetConfig
    from argus_tpu.train import TrainConfig, train

    cfg = TrainConfig(
        dataset_config=CameraCubePoseDatasetConfig(ds_dir, center_crop=(96, 96)),
        model_config=NCameraCNNConfig(n_cams=2, backbone="resnet18", resnet_output_dim=64),
        keypoint_config=CubeKeypointNetConfig(backbone="resnet18", head_features=32),
        model_type=model_type,
        batch_size=8,
        learning_rate=1e-3,
        n_epochs=n_epochs,
        use_augmentation=False,
        val_spaghetti=False,
        wandb_log=False,
        num_workers=2,
        save_epochs=max(1, n_epochs - 1),
        val_epochs=max(1, n_epochs // 2),
    )
    train_ds = CameraCubePoseDataset(cfg.dataset_config, train=True)
    test_ds = CameraCubePoseDataset(cfg.dataset_config, train=False)

    # untrained baseline
    from argus_tpu.train import create_train_state

    _, state0 = create_train_state(cfg, jax.random.PRNGKey(cfg.random_seed), (96, 96))
    base = _eval_pose_errors(cfg, {"params": state0.params, "batch_stats": state0.batch_stats}, train_ds)

    ckpt = train(cfg)
    raw = load_checkpoint(ckpt)
    fit = _eval_pose_errors(cfg, raw, train_ds)
    gen = _eval_pose_errors(cfg, raw, test_ds)
    print(
        f"[{model_type}] rot/trans: untrained {base[0]:.1f} deg / {base[1]*100:.2f} cm"
        f" -> train {fit[0]:.1f} deg / {fit[1]*100:.2f} cm"
        f" | test {gen[0]:.1f} deg / {gen[1]*100:.2f} cm"
    )
    return base, fit, gen


@pytest.fixture(scope="module")
def corners_ds(tmp_path_factory):
    from argus_tpu.data.synthetic import write_synthetic_dataset

    d = tmp_path_factory.mktemp("corners")
    write_synthetic_dataset(
        str(d), n_train=24, n_test=8, height=96, width=96, seed=11, pose_encoded="corners"
    )
    return str(d)


@pytest.mark.slow
def test_pose_cnn_learns_pose(corners_ds):
    # Direct regression learns translation much more slowly than rotation here:
    # the geodesic loss mixes radians and meters, so gradients are
    # rotation-dominated until rotation converges (~2 rad vs ~0.06 m at init).
    # Measured at 100 epochs: rot 136.3 -> 9.8 deg, trans 5.90 -> 3.46 cm
    # (0.59x). Bars are set against that with regression-detection headroom;
    # the keypoint family (explicit geometry) holds the stricter halving bar.
    base, fit, _ = _run_family("pose_cnn", corners_ds, n_epochs=100)
    assert fit[0] < 0.5 * base[0], (base, fit)  # rotation error halved at minimum
    assert fit[1] < 0.8 * base[1], (base, fit)  # translation clearly improving
    assert fit[0] < 40.0 and fit[1] < 0.045, fit


@pytest.mark.slow
def test_keypoint_learns_pose(corners_ds):
    base, fit, _ = _run_family("keypoint", corners_ds, n_epochs=30)
    assert fit[0] < 0.5 * base[0], (base, fit)
    assert fit[1] < 0.5 * base[1], (base, fit)
    assert fit[0] < 40.0 and fit[1] < 0.025, fit


# ───────────────── face-textured proxy (VERDICT r4 #1) ─────────────────
# The corners-only renderer encodes rotation SOLELY in corner-dot COLOR
# identity, which the photometric augmentation stack (hue/saturation/planckian
# jitter) attacks directly — so direct-regression rotation accuracy on it said
# nothing about the model family. The faces renderer adds per-face LUMINANCE
# patterns (the analog of the reference cube's per-face textures,
# /root/reference/mujoco/common_assets/reorientation_cube.xml:1-34): a rotation
# signal photometric jitter cannot erase. These tests pin that contract.


def _render_faces(pose_seed=3, style_name="FINETUNE_STYLE_FACES", n=4, res=128):
    from argus_tpu.data import synthetic as syn
    from argus_tpu.models.keypoint_net import cube_corners, nominal_camera_matrices

    rng = np.random.default_rng(pose_seed)
    P = np.asarray(nominal_camera_matrices(res, res))
    corners = np.asarray(cube_corners())
    poses = syn._workspace_wxyz_poses(rng, n)
    style = getattr(syn, style_name)
    imgs = []
    for pose in poses:
        imgs.extend(
            syn._render_corner_projection(pose, res, res, P, corners, style=style, rng=rng)
        )
    return np.stack(imgs), poses, P, corners


def _face_mask(img: np.ndarray) -> np.ndarray:
    """Grayscale-above-background pixels = the rasterized cube faces (pattern
    values are pure luminance: identical in all 3 channels by construction)."""
    gray = (img[..., 0] == img[..., 1]) & (img[..., 1] == img[..., 2])
    return gray & (img[..., 0] > 70)


def test_faces_render_luminance_pattern():
    imgs, _, _, _ = _render_faces()
    patterned = 0
    for img in imgs:
        m = _face_mask(img)
        # the cube covers a sizable patch of every view
        assert m.mean() > 0.05, m.mean()
        # ...and carries a >=2-level luminance pattern (per-face base +
        # +-contrast/2 values). A near-edge-on view can show a single level
        # above the mask threshold, so require the pattern in MOST views.
        if img[m][:, 0].std() > 10.0:
            patterned += 1
    assert patterned >= len(imgs) - 1, patterned


def test_faces_signal_survives_photometric_jitter():
    """The load-bearing property: hue rotation and saturation scaling are
    IDENTITY maps on grayscale pixels, so the face-pattern rotation signal
    survives exactly the transforms that erase corner-dot color identity."""
    import jax.numpy as jnp

    from argus_tpu.ops.augment import _adjust_hue, _adjust_saturation

    imgs, _, _, _ = _render_faces()
    x = jnp.asarray(imgs.astype(np.float32) / 255.0).transpose(0, 3, 1, 2)
    hue = np.asarray(_adjust_hue(x, 0.37))
    sat = np.asarray(_adjust_saturation(x, 0.1))
    for i, img in enumerate(imgs):
        m = _face_mask(img)
        ref = img.astype(np.float32) / 255.0
        # faces: bitwise-stable under hue, near-stable under saturation
        assert np.abs(hue[i].transpose(1, 2, 0)[m] - ref[m]).max() < 1e-5
        assert np.abs(sat[i].transpose(1, 2, 0)[m] - ref[m]).max() < 1e-5
        # corner dots (saturated colors): the same transforms MOVE them —
        # the round-4 failure mode, shown here for contrast
        dots = ~m & (np.abs(img.astype(np.int32).max(-1) - img.astype(np.int32).min(-1)) > 60)
        if dots.any():
            assert np.abs(hue[i].transpose(1, 2, 0)[dots] - ref[dots]).max() > 0.1


def test_faces_backface_culling():
    """Opaque cube: only corners adjacent to a visible face get dots; across
    random poses at least one corner per view must be hidden (a cube shows at
    most 7 corners) and at least 4 visible (>=1 visible face)."""
    from argus_tpu.data import synthetic as syn
    from scipy.spatial.transform import Rotation as R

    imgs, poses, P, corners = _render_faces(n=6)
    hw = float(np.abs(corners).max())
    for pi, pose in enumerate(poses):
        t, q = pose[:3], pose[3:]
        rot = R.from_quat(np.concatenate([q[1:], q[:1]])).as_matrix()
        for cam in range(2):
            C = -np.linalg.inv(P[cam][:, :3]) @ P[cam][:, 3]
            vis = set()
            for axis, g, quad in syn._CUBE_FACES:
                n_w = rot[:, axis] * g
                if float(n_w @ (C - (rot[:, axis] * (g * hw) + t))) > 1e-9:
                    vis.update(quad)
            assert 4 <= len(vis) <= 7, (pi, cam, sorted(vis))


def test_faces_style_constants():
    from argus_tpu.data.synthetic import (
        FINETUNE_STYLE,
        FINETUNE_STYLE_FACES,
        PRETRAIN_STYLE,
        PRETRAIN_STYLE_FACES,
    )
    import dataclasses

    # the faces variants differ from the round-4 styles ONLY in the faces knob,
    # so A/B deltas are attributable to the added luminance signal alone
    for base, faced in ((PRETRAIN_STYLE, PRETRAIN_STYLE_FACES), (FINETUNE_STYLE, FINETUNE_STYLE_FACES)):
        assert not base.faces and faced.faces
        assert dataclasses.replace(faced, faces=False) == base

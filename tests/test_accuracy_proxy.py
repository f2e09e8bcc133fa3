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

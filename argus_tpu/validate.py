"""Sim-set validation: per-example pose visuals + loss histogram.

Capability parity with the reference's `argus/validate.py:22-186`:
  * loads a checkpoint into a fresh model,
  * iterates the val (or train) split,
  * re-applies center-crop + augmentation (train-mode augmentation only when
    validating the train split, like the reference's `Augmentation(train=use_train)`),
  * saves a 3-panel figure per example (3D axis triads of true vs predicted pose +
    both camera images) under `outputs/{split}_visuals/<ckpt>/example_{i}.png`,
  * saves a log-scale loss histogram.

TPU-first difference: inference is ONE jitted program (images -> se(3) -> loss &
SE(3) pose); matplotlib stays host-side.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from typing import Optional

from argus_tpu import ROOT
from argus_tpu.checkpoint import load_checkpoint_with_meta
from argus_tpu.data import CameraCubePoseDataset, CameraCubePoseDatasetConfig, HostDataLoader
from argus_tpu.geom import se3_exp, se3_log, se3_matrix
from argus_tpu.models import NCameraCNNConfig, resolve_model
from argus_tpu.ops.augment import AugmentationConfig, apply_augmentation
from argus_tpu.ops.image import u8_to_f32
from argus_tpu.train import geometric_loss_fn
from argus_tpu.utils import get_tree_string


@dataclass
class ValConfig:
    """Validation config (field parity: argus/validate.py:48-82).

    Fields:
        model_path: checkpoint to validate (.ckpt from argus_tpu.train).
        dataset_config: dataset configuration.
        model_config: optional model-config override. Default None: the model
            family + config are reconstructed from the checkpoint's embedded
            metadata (either family; checkpoint.py format 2).
        aug_config: augmentation configuration.
        use_train: validate on the training split instead of test.
        max_examples: cap on rendered examples (None = all).
    """

    model_path: str
    dataset_config: CameraCubePoseDatasetConfig
    model_config: Optional[NCameraCNNConfig] = None
    aug_config: AugmentationConfig = field(default_factory=AugmentationConfig)
    use_train: bool = False
    max_examples: int = 100
    seed: int = 0

    def __post_init__(self):
        assert isinstance(self.model_path, str), "The model path must be a str!"
        if not os.path.exists(self.model_path):
            if os.path.exists(ROOT + "/" + self.model_path):
                self.model_path = ROOT + "/" + self.model_path
            else:
                raise FileNotFoundError(
                    f"The specified model path does not exist!\n"
                    f"Here is a tree of the `outputs/models` directory to help:\n"
                    f"{get_tree_string(ROOT + '/outputs/models', 'ckpt')}"
                )


def plot_axes_from_pose(pose_mat: np.ndarray, true: bool, ax):
    """Draw RGB axis triads for a 4x4 pose matrix (reference: argus/validate.py:22-46)."""
    origin = pose_mat[:3, -1]
    ls = "-" if true else "--"
    for axis_idx, color in enumerate("rgb"):
        ax.quiver(*origin, *pose_mat[:3, axis_idx], color=color, linestyle=ls, length=0.5)
    return ax


def validate(cfg: ValConfig) -> dict:
    """Run validation; returns {"mean_loss": float, "losses": list}."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.lines import Line2D
    from tqdm import tqdm

    ckpt_name = os.path.basename(cfg.model_path).split(".")[0]
    split = "train" if cfg.use_train else "validation"
    output_path = os.path.join(ROOT, "outputs", f"{split}_visuals", ckpt_name)
    os.makedirs(output_path, exist_ok=True)

    # model + weights (family/config from the checkpoint's embedded metadata)
    raw, meta = load_checkpoint_with_meta(cfg.model_path)
    model, model_cfg, model_type = resolve_model(meta, cfg.model_config)
    variables = {"params": raw["params"], "batch_stats": raw["batch_stats"]}

    # dataset (batch of 1, in order — reference argus/validate.py:110-111)
    dataset = CameraCubePoseDataset(cfg.dataset_config, train=cfg.use_train)
    loader = HostDataLoader(dataset, batch_size=1, shuffle=False, num_workers=2)
    n_cams = model_cfg.n_cams
    if model_type == "keypoint":
        from argus_tpu.models.keypoint_net import fit_pose, nominal_camera_matrices

        # intrinsics must match the ACTUAL image size: explicit crop, else the
        # dataset's native resolution (a hardcoded 256 here silently corrupts
        # triangulation on non-256 datasets)
        crop = tuple(
            cfg.dataset_config.center_crop or dataset[0]["images"].shape[:2]
        )
        cam_P = nominal_camera_matrices(*crop)

    @jax.jit
    def infer(variables, images_u8, pose_true, key):
        images = u8_to_f32(images_u8)
        if cfg.use_train:
            images = apply_augmentation(cfg.aug_config, key, images, n_cams=n_cams, train=True)
        elif cfg.aug_config.num_spaghetti > 0:
            # reference behavior: spaghetti arcs apply to the val split too (the
            # dataset draws them regardless of the train flag, argus/data.py:213)
            from argus_tpu.ops.augment import spaghetti_arcs

            B, H, W, C = images.shape
            per_cam = jnp.transpose(images.reshape(B, H, W, n_cams, 3), (0, 3, 4, 1, 2))
            per_cam = spaghetti_arcs(
                key, per_cam.reshape(B * n_cams, 3, H, W), cfg.aug_config.num_spaghetti
            )
            per_cam = per_cam.reshape(B, n_cams, 3, H, W)
            images = jnp.transpose(per_cam, (0, 3, 4, 1, 2)).reshape(B, H, W, C)
        pred = model.apply(variables, images, train=False)
        if model_type == "keypoint":
            # same comparable metric as train.make_eval_step: the geodesic error
            # of the fully-fitted pose (soft-argmax -> triangulation -> Procrustes)
            uv, _ = pred
            pose_pred = fit_pose(cam_P, uv)
            loss = geometric_loss_fn(se3_log(pose_pred), pose_true)
        else:
            pose_pred = se3_exp(pred)
            loss = geometric_loss_fn(pred, pose_true)
        return images, pose_pred, loss

    losses = []
    base_key = jax.random.PRNGKey(cfg.seed)
    for i, batch in enumerate(tqdm(loader, total=min(len(loader), cfg.max_examples))):
        if i >= cfg.max_examples:
            break
        images, pose_pred, loss = infer(
            variables, batch["images"], batch["cube_pose"], jax.random.fold_in(base_key, i)
        )
        loss_val = float(loss[0])
        losses.append(loss_val)

        true_mat = np.asarray(se3_matrix(jnp.asarray(batch["cube_pose"][0])))
        pred_mat = np.asarray(se3_matrix(pose_pred[0]))
        imgs_np = np.asarray(images[0])  # (H, W, 6)

        fig = plt.figure(figsize=plt.figaspect(1.0 / 3.0))
        fig.suptitle(f"Cube Pose Prediction Validation | Checkpoint: {ckpt_name}")

        ax = fig.add_subplot(131, projection="3d")
        plot_axes_from_pose(true_mat, true=True, ax=ax)
        plot_axes_from_pose(pred_mat, true=False, ax=ax)
        ax.set_title(f"Example {i} | Loss: {loss_val:.3f}")
        ax.set_xlim(-1, 1)
        ax.set_ylim(-1, 1)
        ax.set_zlim(-1, 1)
        ax.set_aspect("equal")
        ax.legend(
            handles=[
                Line2D([0], [0], color="black", linestyle="-", label="true"),
                Line2D([0], [0], color="black", linestyle="--", label="pred"),
            ]
        )

        for cam in range(min(n_cams, 2)):
            ax = fig.add_subplot(132 + cam)
            ax.imshow(np.clip(imgs_np[..., 3 * cam : 3 * cam + 3], 0, 1))
            ax.set_title(f"Camera {cam + 1}")
            ax.axis("off")

        fig.savefig(os.path.join(output_path, f"example_{i}.png"), bbox_inches="tight")
        plt.close(fig)

    # log-scale loss histogram (reference: argus/validate.py:169-181)
    fig, ax = plt.subplots()
    ax.hist(losses, bins=np.geomspace(0.001, 1e1, 20))
    ax.set_xscale("log")
    ax.set_title(f"Loss Histogram | Checkpoint: {ckpt_name}")
    ax.set_xlabel("Loss")
    ax.set_ylabel("Frequency")
    fig.savefig(os.path.join(output_path, "loss_histogram.png"), bbox_inches="tight")
    plt.close(fig)

    return {"mean_loss": float(np.mean(losses)), "losses": losses, "output_path": output_path}


if __name__ == "__main__":
    from argus_tpu.configs import cli

    validate(cli(ValConfig))

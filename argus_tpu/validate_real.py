"""Real-camera validation: estimate the pose from real images, re-render it in
MuJoCo, and build side-by-side comparison figures + a GIF.

Capability parity with the reference's `argus/validate_real.py:21-121`:
  * reads a **flat** real-data HDF5 (top-level `img_stems`, no train/test groups, no
    labels — argus/validate_real.py:58-60),
  * per frame: decode both camera PNGs -> center-crop -> compiled pose inference ->
    convert the predicted xyzw pose to MuJoCo's wxyz order -> write into qpos[:7] ->
    `mj_forward` -> offscreen-render `cam1`/`cam2` with the goal body hidden ->
    2x2 real-vs-rendered figure,
  * stitches all frames into `real_validation.gif`.

TPU-first: the estimator is ONE jitted images->SE(3) program (the <2 ms p50 target
artifact, SURVEY.md §7.7); MuJoCo rendering stays host-side (native C engine).
Requires the repo's MuJoCo assets (mujoco/leap/task.xml) and the `mujoco` package —
both are host-side dependencies, gated at call time.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from typing import Optional

from argus_tpu import ROOT
from argus_tpu.checkpoint import load_checkpoint_with_meta
from argus_tpu.data import CameraCubePoseDatasetConfig
from argus_tpu.data.dataset import _center_crop_np, _decode_png
from argus_tpu.geom import se3_exp, xyzxyzw_to_xyzwxyz_SE3
from argus_tpu.models import NCameraCNN, NCameraCNNConfig, resolve_model


@dataclass
class ValRealConfig:
    """Real-validation config (field parity: argus/validate_real.py:21-30).

    Fields:
        model_path: checkpoint to validate.
        dataset_config: points at the real-capture dataset directory (flat HDF5).
        model_config: optional model-config override. Default None: the model
            family + config come from the checkpoint's embedded metadata
            (either family; checkpoint.py format 2).
        mujoco_xml: task scene with cam1/cam2 + the goal body to hide.
    """

    model_path: str
    dataset_config: CameraCubePoseDatasetConfig
    model_config: Optional[NCameraCNNConfig] = None
    mujoco_xml: str = os.path.join(ROOT, "mujoco", "leap", "task.xml")
    # pose the articulated LEAP hand in the re-renders: per-frame `q_leap` when the
    # HDF5 carries it, else the scene's "home" keyframe grasp. The reference leaves
    # the hand at qpos defaults (argus/validate_real.py:76-78); posing it makes the
    # real-vs-rendered comparison faithful to the actual rig.
    pose_hand: bool = True


def make_pose_estimator(
    model: NCameraCNN, variables: dict, model_type: str = "pose_cnn", crop=(256, 256)
):
    """Compile the single-program real-time estimator: uint8 images -> SE(3) pose
    (xyzw), for either model family. This is the control-loop artifact (reference
    get_pose, argus/utils.py:179)."""
    if model_type == "keypoint":
        from argus_tpu.models.keypoint_net import fit_pose, nominal_camera_matrices

        cam_P = nominal_camera_matrices(*crop)

    @jax.jit
    def estimate(images_u8: jax.Array) -> jax.Array:
        images = images_u8.astype(jnp.float32) / 255.0
        pred = model.apply(variables, images, train=False)
        if model_type == "keypoint":
            uv, _ = pred
            return fit_pose(cam_P, uv)
        return se3_exp(pred)

    return estimate


def validate_real(cfg: ValRealConfig) -> str:
    """Run real-world validation; returns the output directory."""
    import h5py
    import imageio.v2 as imageio
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    try:
        import mujoco
    except ImportError as e:  # pragma: no cover
        raise ImportError("validate_real requires the `mujoco` package (host-side)") from e

    # model + compiled estimator (family/config from the checkpoint's metadata)
    raw, meta = load_checkpoint_with_meta(cfg.model_path)
    model, _, model_type = resolve_model(meta, cfg.model_config)
    crop0 = tuple(cfg.dataset_config.center_crop or (256, 256))
    estimate = make_pose_estimator(
        model,
        {"params": raw["params"], "batch_stats": raw["batch_stats"]},
        model_type=model_type,
        crop=crop0,
    )

    # MuJoCo scene for re-rendering the predicted pose
    m = mujoco.MjModel.from_xml_path(cfg.mujoco_xml)
    d = mujoco.MjData(m)
    crop = cfg.dataset_config.center_crop or (256, 256)
    renderer = mujoco.Renderer(m, *crop)
    # all geoms of the "goal" body get alpha-hidden during renders (the reference
    # indexes geom_rgba with the BODY id, which only works for 1-geom bodies —
    # argus/validate_real.py:46,89; fixed here)
    goal_body = m.body("goal")
    goal_geoms = range(goal_body.geomadr[0], goal_body.geomadr[0] + goal_body.geomnum[0])
    saved_alpha = {g: float(m.geom_rgba[g, 3]) for g in goal_geoms}
    mujoco.mj_forward(m, d)

    def render(camera: str) -> np.ndarray:
        for g in goal_geoms:
            m.geom_rgba[g, 3] = 0.0
        renderer.update_scene(d, camera=camera)
        for g in goal_geoms:
            m.geom_rgba[g, 3] = saved_alpha[g]
        return renderer.render()

    dataset_path = cfg.dataset_config.dataset_path
    filename = f"{dataset_path}/{Path(dataset_path).stem}.hdf5"
    output_dir = Path(ROOT) / f"outputs/real_validation_visuals/{Path(cfg.model_path).stem}"
    os.makedirs(output_dir, exist_ok=True)

    frames = []
    with h5py.File(filename, "r") as f:
        img_stems = [s.decode("utf-8") for s in f["img_stems"][()]]
        q_leap = f["q_leap"][()] if "q_leap" in f else None

    # hand articulation: per-frame q_leap, else the "home" keyframe grasp
    n_hand = m.nq - 7
    home_hand = None
    if cfg.pose_hand and n_hand > 0:
        if m.nkey > 0:
            home_hand = np.array(m.key_qpos[0][7 : 7 + n_hand])
        else:  # scene without a keyframe: keep defaults
            home_hand = np.array(d.qpos[7 : 7 + n_hand])

    for i, stem in enumerate(img_stems):
        pair = [
            _center_crop_np(_decode_png(f"{dataset_path}/{stem}_{sfx}.png"), crop)
            for sfx in ("a", "b")
        ]
        images_u8 = jnp.asarray(np.concatenate(pair, axis=-1))[None]  # (1, H, W, 6)

        pred_pose_xyzw = np.asarray(estimate(images_u8)[0])
        pred_pose_wxyz = xyzxyzw_to_xyzwxyz_SE3(pred_pose_xyzw)
        d.qpos[:7] = pred_pose_wxyz
        if cfg.pose_hand and n_hand > 0:
            hand = q_leap[i][:n_hand] if q_leap is not None else home_hand
            d.qpos[7 : 7 + len(hand)] = hand
        mujoco.mj_forward(m, d)

        fig = plt.figure()
        for cam in range(2):
            plt.subplot(2, 2, 2 * cam + 1)
            plt.imshow(pair[cam])
            plt.axis("off")

            plt.subplot(2, 2, 2 * cam + 2)
            plt.imshow(render(f"cam{cam + 1}"))
            plt.axis("off")

        plt.suptitle(
            f"Pred pose {i}:\n{np.array2string(pred_pose_wxyz, precision=3, floatmode='fixed')}"
        )
        fig_path = output_dir / f"example_{i}.png"
        plt.savefig(fig_path, bbox_inches="tight")
        plt.close(fig)
        frames.append(imageio.imread(fig_path))

    imageio.mimsave(output_dir / "real_validation.gif", frames)
    return str(output_dir)


if __name__ == "__main__":
    from argus_tpu.configs import cli

    validate_real(cli(ValRealConfig))

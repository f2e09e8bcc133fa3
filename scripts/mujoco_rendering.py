"""MuJoCo camera calibration + dataset pose re-rendering.

Replaces the reference's scripts/mujoco_rendering.py with its staleness fixed
(hard-coded user paths at :50,54, reads a nonexistent `images` dataset at :64, and a
leftover breakpoint() at :105):

  * `compute_camera_matrix` — 3x4 projection matrix of a named MJCF camera
    (intrinsics from fovy + image size, extrinsics from cam_xpos/cam_xmat),
  * re-render dataset cube poses from `cam1`/`cam2` and save comparison strips
    (Unity-render vs MuJoCo-render for the same pose).

ZED VGA intrinsics (for real-camera work; the reference keeps these in comments):
fx=350.954, fy=350.954, cx=317.0175, cy=179.8715 at 672x376.
"""

import os
import sys
from dataclasses import dataclass, field

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from argus_tpu import ROOT  # noqa: E402


@dataclass
class RenderConfig:
    dataset_path: str = os.path.join(ROOT, "outputs", "data", "cube_unity_data")
    mujoco_xml: str = os.path.join(ROOT, "mujoco", "leap", "task.xml")
    n_examples: int = 5
    height: int = 256
    width: int = 256
    output_dir: str = os.path.join(ROOT, "outputs", "mujoco_render_check")


def compute_camera_matrix(model, data, camera_name: str, width: int, height: int) -> np.ndarray:
    """3x4 projection matrix P = K [R | t] for a fixed MJCF camera."""
    import mujoco

    cam_id = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_CAMERA, camera_name)
    fovy = np.deg2rad(model.cam_fovy[cam_id])
    f = 0.5 * height / np.tan(fovy / 2.0)
    K = np.array([[-f, 0.0, (width - 1) / 2.0], [0.0, f, (height - 1) / 2.0], [0.0, 0.0, 1.0]])

    R_world_cam = data.cam_xmat[cam_id].reshape(3, 3).T
    t = -R_world_cam @ data.cam_xpos[cam_id]
    return K @ np.concatenate([R_world_cam, t[:, None]], axis=1)


def main(cfg: RenderConfig) -> None:
    import h5py
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import mujoco
    from PIL import Image

    m = mujoco.MjModel.from_xml_path(cfg.mujoco_xml)
    d = mujoco.MjData(m)
    mujoco.mj_forward(m, d)
    renderer = mujoco.Renderer(m, cfg.height, cfg.width)

    P = compute_camera_matrix(m, d, "cam1", cfg.width, cfg.height)
    print("cam1 3x4 camera matrix:\n", P)

    stem = os.path.basename(cfg.dataset_path)
    h5 = os.path.join(cfg.dataset_path, f"{stem}.hdf5")
    if not os.path.exists(h5):
        print(f"(no dataset at {h5} — camera matrix only)")
        return

    os.makedirs(cfg.output_dir, exist_ok=True)
    with h5py.File(h5, "r") as f:
        poses = f["train"]["cube_poses"][: cfg.n_examples]  # MJPC wxyz
        stems = [s.decode() for s in f["train"]["img_stems"][: cfg.n_examples]]

    for i, (pose, img_stem) in enumerate(zip(poses, stems)):
        d.qpos[:7] = pose
        mujoco.mj_forward(m, d)
        fig, axes = plt.subplots(1, 2, figsize=(8, 4))
        unity_png = os.path.join(cfg.dataset_path, f"{img_stem}_a.png")
        if os.path.exists(unity_png):
            axes[0].imshow(np.asarray(Image.open(unity_png)))
        axes[0].set_title("Unity render")
        axes[0].axis("off")
        renderer.update_scene(d, camera="cam1")
        axes[1].imshow(renderer.render())
        axes[1].set_title("MuJoCo re-render")
        axes[1].axis("off")
        fig.savefig(os.path.join(cfg.output_dir, f"compare_{i}.png"), bbox_inches="tight")
        plt.close(fig)
    print(f"wrote {cfg.n_examples} comparison figures to {cfg.output_dir}")


if __name__ == "__main__":
    from argus_tpu.configs import cli

    main(cli(RenderConfig))

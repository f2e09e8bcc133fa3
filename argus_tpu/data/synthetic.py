"""Synthetic dataset writer: the test-suite's fixture recipe as a library utility.

Produces a dataset that is byte-compatible with the datagen writer's schema
(reference: argus/data_generation.py:245-264, mirrored by tests/conftest.py:14-56):

    <dir>/<dir-stem>.hdf5
        attrs: n_cams, W, H
        train/ {cube_poses (N,7) wxyz, q_leap (N,16), img_stems}
        test/  {same}
    <dir>/img/img{i}_{a,b}.png   uint8 RGB

Useful for tests, benchmarking, and the "minimum end-to-end slice" (SURVEY.md §7)
without Unity.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def _random_wxyz_poses(rng: np.random.Generator, n: int) -> np.ndarray:
    """Random SE(3) poses as (n, 7) arrays with **wxyz** quats (the HDF5 order)."""
    from scipy.spatial.transform import Rotation as R

    trans = rng.normal(size=(n, 3))
    quat_xyzw = R.random(n, random_state=np.random.RandomState(rng.integers(2**31))).as_quat()
    quat_wxyz = np.concatenate([quat_xyzw[:, 3:], quat_xyzw[:, :3]], axis=-1)
    return np.concatenate([trans, quat_wxyz], axis=-1)


def _render_pose_encoded(pose_wxyz: np.ndarray, height: int, width: int, cam: int) -> np.ndarray:
    """Render an image whose content is a FUNCTION of the pose: a colored square
    whose position encodes (x, y) and whose size encodes z, viewed with a
    per-camera parallax shift. A regressor can learn the translation from these —
    used to demonstrate end-to-end learning without Unity."""
    img = np.full((height, width, 3), 40, np.uint8)
    x, y, z = np.tanh(pose_wxyz[:3])
    cx = int((0.5 + 0.3 * x + 0.05 * (cam - 0.5)) * width)
    cy = int((0.5 + 0.3 * y) * height)
    half = max(4, int((0.08 + 0.05 * (z + 1) / 2) * min(height, width)))
    color = np.array([200, 120 + int(50 * x), 80 + int(50 * y)], np.uint8)
    y0, y1 = max(0, cy - half), min(height, cy + half)
    x0, x1 = max(0, cx - half), min(width, cx + half)
    img[y0:y1, x0:x1] = color
    return img


def write_synthetic_dataset(
    out_dir: str,
    n_train: int = 10,
    n_test: int = 5,
    height: int = 256,
    width: int = 256,
    n_cams: int = 2,
    seed: int = 0,
    q_leap_dim: int = 16,
    pose_encoded: bool = False,
) -> str:
    """Write a complete synthetic dataset to `out_dir`. Returns `out_dir`.

    With `pose_encoded=True` the images are a deterministic function of the pose
    (learnable translation signal) instead of random noise — useful for
    end-to-end learning demonstrations without the Unity renderer.
    """
    import h5py
    from PIL import Image

    rng = np.random.default_rng(seed)
    out = Path(out_dir)
    img_dir = out / "img"
    os.makedirs(img_dir, exist_ok=True)

    n_total = n_train + n_test
    poses_all = _random_wxyz_poses(rng, n_total) if pose_encoded else None
    for i in range(n_total):
        for cam, suffix in enumerate(("a", "b")):
            if pose_encoded:
                arr = _render_pose_encoded(poses_all[i], height, width, cam)
            else:
                arr = (rng.random((height, width, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"img{i}_{suffix}.png")

    with h5py.File(out / f"{out.stem}.hdf5", "w") as f:
        f.attrs["n_cams"] = n_cams
        f.attrs["W"] = width
        f.attrs["H"] = height
        for name, n, start in (("train", n_train, 0), ("test", n_test, n_train)):
            g = f.create_group(name)
            poses = (
                poses_all[start : start + n]
                if pose_encoded
                else _random_wxyz_poses(rng, n)
            )
            g.create_dataset("cube_poses", data=poses)
            g.create_dataset("q_leap", data=rng.normal(size=(n, q_leap_dim)))
            stems = [f"img/img{i}".encode() for i in range(start, start + n)]
            g.create_dataset("img_stems", data=np.array(stems))

    return str(out)

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


def write_synthetic_dataset(
    out_dir: str,
    n_train: int = 10,
    n_test: int = 5,
    height: int = 256,
    width: int = 256,
    n_cams: int = 2,
    seed: int = 0,
    q_leap_dim: int = 16,
) -> str:
    """Write a complete synthetic dataset to `out_dir`. Returns `out_dir`."""
    import h5py
    from PIL import Image

    rng = np.random.default_rng(seed)
    out = Path(out_dir)
    img_dir = out / "img"
    os.makedirs(img_dir, exist_ok=True)

    n_total = n_train + n_test
    for i in range(n_total):
        for suffix in ("a", "b"):
            arr = (rng.random((height, width, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"img{i}_{suffix}.png")

    with h5py.File(out / f"{out.stem}.hdf5", "w") as f:
        f.attrs["n_cams"] = n_cams
        f.attrs["W"] = width
        f.attrs["H"] = height
        for name, n, start in (("train", n_train, 0), ("test", n_test, n_train)):
            g = f.create_group(name)
            g.create_dataset("cube_poses", data=_random_wxyz_poses(rng, n))
            g.create_dataset("q_leap", data=rng.normal(size=(n, q_leap_dim)))
            stems = [f"img/img{i}".encode() for i in range(start, start + n)]
            g.create_dataset("img_stems", data=np.array(stems))

    return str(out)

"""End-to-end validate_real test: flat real-data HDF5 -> compiled estimator ->
MuJoCo re-render -> figures + GIF (reference: argus/validate_real.py:33-121)."""

import os

import numpy as np
import pytest

os.environ.setdefault("MUJOCO_GL", "egl")  # before mujoco import (conftest also sets it)
mujoco = pytest.importorskip("mujoco")


@pytest.fixture(scope="module")
def real_data_dir(tmp_path_factory):
    """Flat real-capture dataset: top-level img_stems, no train/test groups, no
    labels (argus/validate_real.py:58-60)."""
    import h5py
    from PIL import Image

    d = tmp_path_factory.mktemp("real")
    (d / "img").mkdir()
    rng = np.random.default_rng(0)
    stems = []
    for i in range(2):
        for sfx in ("a", "b"):
            arr = (rng.random((256, 256, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"img/img{i}_{sfx}.png")
        stems.append(f"img/img{i}")
    with h5py.File(d / f"{d.name}.hdf5", "w") as f:
        f.create_dataset("img_stems", data=np.array([s.encode() for s in stems]))
    return str(d)


def test_validate_real_end_to_end(real_data_dir, tmp_path):
    import jax

    from argus_tpu import ROOT
    from argus_tpu.checkpoint import save_checkpoint
    from argus_tpu.data import CameraCubePoseDatasetConfig
    from argus_tpu.models import NCameraCNNConfig
    from argus_tpu.train import create_train_state
    from argus_tpu.validate_real import ValRealConfig, validate_real

    scene = os.path.join(ROOT, "mujoco", "leap", "task.xml")
    if not os.path.exists(scene):
        pytest.skip("mujoco scene not generated")

    class _Cfg:
        model_config = NCameraCNNConfig(n_cams=2, backbone="resnet18", resnet_output_dim=16)
        amp = False
        max_grad_norm = 1.0
        learning_rate = 1e-4

    _, state = create_train_state(_Cfg(), jax.random.PRNGKey(0), (256, 256))
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, state)

    cfg = ValRealConfig(
        model_path=ckpt,
        dataset_config=CameraCubePoseDatasetConfig(real_data_dir, center_crop=(256, 256)),
        model_config=_Cfg.model_config,
        mujoco_xml=scene,
    )
    out_dir = validate_real(cfg)
    assert os.path.exists(os.path.join(out_dir, "example_0.png"))
    assert os.path.exists(os.path.join(out_dir, "real_validation.gif"))

"""Checkpoint tests: round-trip with/without target, validate-pipeline smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from argus_tpu.checkpoint import load_checkpoint, save_checkpoint


def test_roundtrip_plain_tree(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3)), "n": jnp.asarray(3)}}
    path = str(tmp_path / "x.ckpt")
    save_checkpoint(path, tree)
    out = load_checkpoint(path)
    assert np.allclose(out["a"], np.arange(5.0))
    assert np.allclose(out["b"]["c"], 1.0)
    assert int(out["b"]["n"]) == 3


def test_roundtrip_with_target(tmp_path):
    from argus_tpu.models import NCameraCNNConfig
    from argus_tpu.train import create_train_state

    class _Cfg:
        model_config = NCameraCNNConfig(n_cams=2, backbone="resnet18", resnet_output_dim=16)
        amp = False
        max_grad_norm = 1.0
        learning_rate = 1e-4

    _, state = create_train_state(_Cfg(), jax.random.PRNGKey(0), (32, 32))
    path = str(tmp_path / "state.ckpt")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, target=state)
    for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(restored.params)):
        assert np.allclose(a, b)
    assert int(restored.step) == 0
    assert float(restored.lr) == pytest.approx(1e-4)


def test_atomic_overwrite(tmp_path):
    path = str(tmp_path / "x.ckpt")
    save_checkpoint(path, {"v": jnp.asarray(1.0)})
    save_checkpoint(path, {"v": jnp.asarray(2.0)})
    assert float(load_checkpoint(path)["v"]) == 2.0


def test_validate_pipeline(tmp_path, dummy_data_path):
    """Headless validate() over the dummy dataset with a fresh (untrained) model
    checkpoint: figures + histogram written, finite mean loss."""
    import os

    from argus_tpu.data import CameraCubePoseDatasetConfig
    from argus_tpu.models import NCameraCNNConfig
    from argus_tpu.train import create_train_state
    from argus_tpu.validate import ValConfig, validate

    class _Cfg:
        model_config = NCameraCNNConfig(n_cams=2, backbone="resnet18", resnet_output_dim=16)
        amp = False
        max_grad_norm = 1.0
        learning_rate = 1e-4

    _, state = create_train_state(_Cfg(), jax.random.PRNGKey(0), (64, 64))
    ckpt = str(tmp_path / "fresh.ckpt")
    save_checkpoint(ckpt, state)

    cfg = ValConfig(
        model_path=ckpt,
        dataset_config=CameraCubePoseDatasetConfig(dummy_data_path, center_crop=(64, 64)),
        model_config=_Cfg.model_config,
        max_examples=2,
    )
    result = validate(cfg)
    assert np.isfinite(result["mean_loss"])
    assert os.path.exists(os.path.join(result["output_path"], "example_0.png"))
    assert os.path.exists(os.path.join(result["output_path"], "loss_histogram.png"))

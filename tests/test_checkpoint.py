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


def test_async_checkpointer_matches_sync_and_survives_donation(tmp_path):
    """AsyncCheckpointer must (a) write byte-identical files to the sync path,
    (b) snapshot before returning so donated/overwritten source buffers can't
    corrupt the in-flight save, and (c) re-raise worker errors on wait()."""
    from argus_tpu.checkpoint import AsyncCheckpointer

    tree = {"a": jnp.arange(6.0), "b": {"c": jnp.full((4, 4), 2.0)}}
    sync_path = str(tmp_path / "sync.ckpt")
    async_path = str(tmp_path / "async.ckpt")
    save_checkpoint(sync_path, tree, meta={"k": 1})

    ck = AsyncCheckpointer()
    ck.save(async_path, tree, meta={"k": 1})
    # clobber the source arrays while the save is (possibly) in flight — the
    # donation-safety contract says the snapshot was taken before save returned
    tree["a"] = tree["a"] * 0 - 1.0
    tree["b"]["c"] = tree["b"]["c"] * 0 - 1.0
    ck.wait()
    assert open(async_path, "rb").read() == open(sync_path, "rb").read()

    # worker exceptions surface on wait(): a FILE as the parent "directory"
    # makes the worker's makedirs raise
    blocker = tmp_path / "blocker"
    blocker.write_text("")
    ck2 = AsyncCheckpointer()
    ck2.save(str(blocker / "x.ckpt"), {"a": jnp.ones(())})
    with pytest.raises(OSError):
        ck2.wait()


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


def test_meta_roundtrip_and_legacy_load(tmp_path):
    """Format-2 checkpoints carry model metadata; legacy bare-state files still
    load (with empty meta)."""
    from flax import serialization

    from argus_tpu.checkpoint import load_checkpoint_with_meta

    path = str(tmp_path / "m.ckpt")
    meta = {
        "model_type": "keypoint",
        "model_config": {"n_cams": 2, "backbone": "resnet18"},
        "center_crop": [64, 64],
    }
    save_checkpoint(path, {"v": jnp.asarray(1.0)}, meta=meta)
    state, m = load_checkpoint_with_meta(path)
    assert m["model_type"] == "keypoint"
    assert list(m["center_crop"]) == [64, 64]
    assert m["model_config"]["backbone"] == "resnet18"
    assert float(state["v"]) == 1.0

    legacy = str(tmp_path / "legacy.ckpt")
    with open(legacy, "wb") as f:
        f.write(serialization.msgpack_serialize({"v": np.asarray(2.0)}))
    state, m = load_checkpoint_with_meta(legacy)
    assert float(state["v"]) == 2.0 and m == {}
    assert float(load_checkpoint(legacy)["v"]) == 2.0


def test_model_from_meta_reconstructs_families():
    """model_from_meta builds the right family + coerces msgpack'd types
    (lists back to tuples, bytes to str)."""
    from argus_tpu.models import model_from_meta
    from argus_tpu.models.keypoint_net import CubeKeypointNet

    model, cfg, mt = model_from_meta(
        {
            "model_type": "keypoint",
            "model_config": {"n_cams": 2, "backbone": b"resnet18", "head_features": 16},
        }
    )
    assert mt == "keypoint" and isinstance(model, CubeKeypointNet)
    assert cfg.backbone == "resnet18" and cfg.head_features == 16

    from argus_tpu.models import NCameraCNN

    model, cfg, mt = model_from_meta(
        {
            "model_type": "pose_cnn",
            "model_config": {
                "backbone": "resnet18",
                "resnet_output_dim": 32,
                "fuse_block_stages": [0, 1],
                "unknown_future_field": 7,  # dropped, not a crash
            },
        }
    )
    assert mt == "pose_cnn" and isinstance(model, NCameraCNN)
    assert cfg.fuse_block_stages == (0, 1) and cfg.resnet_output_dim == 32
    # empty meta -> the reference family with defaults (legacy checkpoints)
    _, cfg, mt = model_from_meta({})
    assert mt == "pose_cnn" and cfg.backbone == "resnet50"


def test_validate_pipeline_keypoint_from_meta(tmp_path, dummy_data_path):
    """A keypoint-family checkpoint round-trips through validate() with NO
    out-of-band config: the family is reconstructed from the embedded metadata
    (VERDICT r2 #4)."""
    import os

    from argus_tpu.data import CameraCubePoseDatasetConfig
    from argus_tpu.models.keypoint_net import CubeKeypointNetConfig
    from argus_tpu.train import TrainConfig, checkpoint_meta, create_train_state
    from argus_tpu.validate import ValConfig, validate

    cfg = TrainConfig(
        model_type="keypoint",
        keypoint_config=CubeKeypointNetConfig(n_cams=2, backbone="resnet18", head_features=16),
        wandb_log=False,
        save_dir=str(tmp_path),
    )
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), (64, 64))
    ckpt = str(tmp_path / "kp.ckpt")
    save_checkpoint(ckpt, state, meta=checkpoint_meta(cfg))

    vcfg = ValConfig(
        model_path=ckpt,
        dataset_config=CameraCubePoseDatasetConfig(dummy_data_path, center_crop=(64, 64)),
        max_examples=1,
    )
    result = validate(vcfg)
    assert np.isfinite(result["mean_loss"])
    assert os.path.exists(os.path.join(result["output_path"], "example_0.png"))

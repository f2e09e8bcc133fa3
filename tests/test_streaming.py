"""Streaming feed tests with a synthetic render source (no Unity needed)."""

import numpy as np
import pytest

from argus_tpu.data.streaming import StreamingRenderLoader


def _fake_source(seed=0):
    rng = np.random.default_rng(seed)

    def render_fn(batch_size):
        imgs = rng.integers(0, 256, (batch_size, 64, 64, 6), dtype=np.uint8)
        poses = rng.normal(size=(batch_size, 7)).astype(np.float32)
        poses[:, 3:] /= np.linalg.norm(poses[:, 3:], axis=-1, keepdims=True)
        return imgs, poses

    return render_fn


def test_streaming_loader_schema():
    loader = StreamingRenderLoader(_fake_source(), batch_size=4, n_batches=3)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert set(b.keys()) == {"images", "cube_pose", "mask"}
        assert b["images"].shape == (4, 64, 64, 6) and b["images"].dtype == np.uint8
        assert b["cube_pose"].shape == (4, 7)
        assert b["mask"].sum() == 4


def test_streaming_loader_propagates_errors():
    def bad_source(batch_size):
        raise RuntimeError("render died")

    loader = StreamingRenderLoader(bad_source, batch_size=2, n_batches=2)
    with pytest.raises(RuntimeError, match="render died"):
        list(loader)


def test_streaming_feeds_train_step():
    """A streamed batch drives the jitted train step end-to-end."""
    import jax

    from argus_tpu.models import NCameraCNNConfig
    from argus_tpu.ops.augment import AugmentationConfig
    from argus_tpu.train import create_train_state, make_train_step

    class _Cfg:
        model_config = NCameraCNNConfig(n_cams=2, backbone="resnet18", resnet_output_dim=16)
        model_type = "pose_cnn"
        augmentation_config = AugmentationConfig(num_spaghetti=2, pallas_blur=False)
        use_augmentation = True
        amp = False
        max_grad_norm = 1.0
        learning_rate = 1e-3

    model, state = create_train_state(_Cfg(), jax.random.PRNGKey(0), (64, 64))
    step = make_train_step(model, _Cfg(), base_seed=0)
    loader = StreamingRenderLoader(_fake_source(), batch_size=4, n_batches=2)
    for batch in loader:
        state, loss = step(state, batch)
    assert np.isfinite(float(loss))

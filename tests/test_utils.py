"""Utils tests: get_pose through a jitted model, timing helper, tree printer,
host-side spaghetti (mirrors the non-converter parts of reference tests/test_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from argus_tpu import utils
from argus_tpu.models import NCameraCNN, NCameraCNNConfig


def test_get_pose_through_jitted_model(dummy_center_crop):
    """get_pose returns unit-quaternion SE(3) poses through a compiled model
    (reference tests/test_utils.py:80-87 uses torch.compile; jit here)."""
    cfg = NCameraCNNConfig(n_cams=2, backbone="resnet18", resnet_output_dim=16)
    model = NCameraCNN(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 6))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    apply_fn = jax.jit(lambda images: model.apply(variables, images, train=False))
    pose = utils.get_pose(x, apply_fn)
    assert pose.shape == (2, 7)
    assert jnp.allclose(jnp.linalg.norm(pose[:, 3:], axis=-1), 1.0, atol=1e-5)


def test_time_jax_fn():
    f = jax.jit(lambda: jnp.sum(jnp.ones((64, 64))))
    result, seconds = utils.time_jax_fn(f, warmup=1)
    assert float(result) == 64 * 64
    assert seconds > 0


def test_get_tree_string(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "a.ckpt").write_bytes(b"x")
    (tmp_path / "b.ckpt").write_bytes(b"x")
    (tmp_path / "ignored.txt").write_bytes(b"x")
    out = utils.get_tree_string(str(tmp_path), "ckpt")
    assert "a.ckpt" in out and "b.ckpt" in out
    assert "ignored.txt" not in out
    assert "└──" in out or "├──" in out


def test_draw_spaghetti_host():
    rng = np.random.default_rng(0)
    img = Image.fromarray(np.full((64, 64, 3), 200, np.uint8))
    out = utils.draw_spaghetti(img, n_arcs=10, rng=rng)
    arr = np.asarray(out)
    assert arr.shape == (64, 64, 3)
    assert (arr == 0).any(), "arcs should draw black pixels"
    # determinism with an explicit generator
    img2 = Image.fromarray(np.full((64, 64, 3), 200, np.uint8))
    out2 = utils.draw_spaghetti(img2, n_arcs=10, rng=np.random.default_rng(0))
    assert np.array_equal(arr, np.asarray(out2))

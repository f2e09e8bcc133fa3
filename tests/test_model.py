"""Model tests (mirrors reference tests/test_model.py:7-17, extended with backbone
variants and bf16)."""

import jax
import jax.numpy as jnp
import pytest

from argus_tpu.models import NCameraCNN, NCameraCNNConfig
from argus_tpu.models.pose_cnn import init_model


@pytest.fixture(scope="module")
def small_model():
    """ResNet-18 at low res keeps CPU test time sane; the head/reshape logic under
    test is identical across backbones."""
    cfg = NCameraCNNConfig(n_cams=2, backbone="resnet18", resnet_output_dim=64)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), height=64, width=64)
    return cfg, model, variables


def test_forward(small_model):
    cfg, model, variables = small_model
    # unbatched input must raise
    x = jnp.zeros((64, 64, 6))
    with pytest.raises(ValueError):
        model.apply(variables, x)

    # wrong channel count must raise
    with pytest.raises(ValueError):
        model.apply(variables, jnp.zeros((2, 64, 64, 9)))

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 6))
    pose = model.apply(variables, x)
    assert pose.shape == (2, 6)
    assert jnp.all(jnp.isfinite(pose))


def test_shared_backbone_across_cameras(small_model):
    """Feeding (img, img) must produce identical per-camera features: the backbone is
    shared via the fold-into-batch reshape (reference argus/models.py:81)."""
    cfg, model, variables = small_model
    img = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    x_same = jnp.concatenate([img, img], axis=-1)
    x_swap = jnp.concatenate([img * 0.5, img], axis=-1)
    out_same = model.apply(variables, x_same)
    out_swap = model.apply(variables, x_swap)
    assert out_same.shape == (1, 6)
    assert not jnp.allclose(out_same, out_swap)


def test_train_mode_updates_batch_stats(small_model):
    cfg, model, variables = small_model
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 6))
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 6)
    # running stats must actually move
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not jnp.allclose(o, n) for o, n in zip(old, new))


def test_bf16_compute():
    cfg = NCameraCNNConfig(n_cams=2, backbone="resnet18", resnet_output_dim=32, dtype="bfloat16")
    model, variables = init_model(cfg, jax.random.PRNGKey(0), height=32, width=32)
    out = model.apply(variables, jnp.ones((2, 32, 32, 6)))
    assert out.dtype == jnp.float32  # params/output fp32, compute bf16
    assert jnp.all(jnp.isfinite(out))


def test_jit_forward(small_model):
    cfg, model, variables = small_model
    f = jax.jit(lambda v, x: model.apply(v, x))
    out = f(variables, jnp.ones((2, 64, 64, 6)))
    assert out.shape == (2, 6)


def test_space_to_depth_stem_equivalence():
    """The s2d stem must compute EXACTLY the standard stem's function (kernel
    rewrite is lossless, models/resnet.py::conv1_kernel_to_s2d)."""
    import flax.linen as nn
    import numpy as np
    from argus_tpu.models.resnet import conv1_kernel_to_s2d, space_to_depth

    rng = np.random.default_rng(0)
    k7 = jnp.asarray(rng.normal(size=(7, 7, 3, 16)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))

    std = jax.lax.conv_general_dilated(
        x, k7, (2, 2), ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    k4 = jnp.asarray(conv1_kernel_to_s2d(k7))
    s2d = jax.lax.conv_general_dilated(
        space_to_depth(x, 2), k4, (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert std.shape == s2d.shape == (2, 32, 32, 16)
    np.testing.assert_allclose(np.asarray(std), np.asarray(s2d), atol=1e-4, rtol=1e-4)


def test_s2d_model_forward_and_import():
    """NCameraCNN with the s2d stem runs, and torchvision import rewrites conv1."""
    from tests.test_torch_import import _fake_torch_resnet18_state_dict
    from argus_tpu.models.torch_import import load_torch_resnet

    cfg = NCameraCNNConfig(
        n_cams=2, backbone="resnet18", resnet_output_dim=16, stem_space_to_depth=True
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0), height=64, width=64)
    assert "conv_init_s2d" in variables["params"]["backbone"]
    out = model.apply(variables, jnp.ones((2, 64, 64, 6)))
    assert out.shape == (2, 6)

    sd = _fake_torch_resnet18_state_dict()
    new_vars = load_torch_resnet(sd, variables)
    assert new_vars["params"]["backbone"]["conv_init_s2d"]["kernel"].shape == (4, 4, 12, 64)


def test_remat_matches_no_remat():
    """nn.remat'ed blocks must be numerically identical (memory option only)."""
    from argus_tpu.models.resnet import resnet18

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    results = []
    for remat in (False, True):
        m = resnet18(output_dim=8, remat=remat)
        v = m.init(jax.random.PRNGKey(0), x, train=False)

        def loss(p):
            o, _ = m.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x, train=True, mutable=["batch_stats"]
            )
            return jnp.sum(o**2)

        g = jax.grad(loss)(v["params"])
        results.append((float(loss(v["params"])), jax.tree_util.tree_leaves(g)))
    assert results[0][0] == pytest.approx(results[1][0], rel=1e-6)
    for a, b in zip(results[0][1], results[1][1]):
        assert jnp.allclose(a, b, atol=1e-5)


def test_stem_frozen_stops_stem_gradients_only():
    """stem_frozen zeroes conv_init/norm_init gradients, leaves the forward
    value and every downstream gradient identical (stop_gradient placement:
    models/resnet.py)."""
    from argus_tpu.models.resnet import resnet18

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    outs, grads = [], []
    for frozen in (False, True):
        m = resnet18(output_dim=8, stem_frozen=frozen)
        v = m.init(jax.random.PRNGKey(0), x, train=False)

        def loss(p):
            o = m.apply({"params": p, "batch_stats": v["batch_stats"]}, x, train=False)
            return jnp.sum(o**2)

        outs.append(float(loss(v["params"])))
        grads.append(jax.grad(loss)(v["params"]))
    assert outs[0] == pytest.approx(outs[1], rel=1e-6)
    g_off, g_on = grads
    # stem grads vanish
    assert all(
        float(jnp.abs(l).max()) == 0.0
        for l in jax.tree_util.tree_leaves(g_on["conv_init"])
    )
    assert all(
        float(jnp.abs(l).max()) == 0.0
        for l in jax.tree_util.tree_leaves(g_on["norm_init"])
    )
    # a downstream grad is unchanged
    a = jax.tree_util.tree_leaves(g_off["stage0_block0"])
    b = jax.tree_util.tree_leaves(g_on["stage0_block0"])
    for x1, x2 in zip(a, b):
        assert jnp.allclose(x1, x2, atol=1e-6)


def test_frozen_stages_stops_gradients_below_boundary():
    """frozen_stages=k zeroes grads for the stem and stages 0..k-1, leaves the
    forward value and every deeper gradient identical (single stop_gradient at
    the stage k-1 output: models/resnet.py)."""
    from argus_tpu.models.resnet import resnet18

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    outs, grads = [], []
    for k in (0, 2):
        m = resnet18(output_dim=8, frozen_stages=k)
        v = m.init(jax.random.PRNGKey(0), x, train=False)

        def loss(p):
            o = m.apply({"params": p, "batch_stats": v["batch_stats"]}, x, train=False)
            return jnp.sum(o**2)

        outs.append(float(loss(v["params"])))
        grads.append(jax.grad(loss)(v["params"]))
    assert outs[0] == pytest.approx(outs[1], rel=1e-6)
    g_off, g_on = grads
    frozen = [k for k in g_on if k in ("conv_init", "norm_init")]
    frozen += [k for k in g_on if k.startswith(("stage0_", "stage1_"))]
    live = [k for k in g_on if k.startswith(("stage2_", "stage3_"))]
    assert frozen and live
    for name in frozen:
        assert all(
            float(jnp.abs(l).max()) == 0.0
            for l in jax.tree_util.tree_leaves(g_on[name])
        ), name
    for name in live:
        for x1, x2 in zip(
            jax.tree_util.tree_leaves(g_off[name]),
            jax.tree_util.tree_leaves(g_on[name]),
        ):
            assert jnp.allclose(x1, x2, atol=1e-6)

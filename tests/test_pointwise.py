"""Fused pointwise-conv kernel (ops/pallas/pointwise.py): pallas-vs-XLA
equivalence in both directions, and model-level fused-vs-unfused equivalence
with an identical variable tree (checkpoint compatibility)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from argus_tpu.ops.pallas.pointwise import pointwise_conv_frozen_bn


def _mk(n=2, h=8, w=8, cin=16, cout=32, dtype=jnp.float32, seed=0, residual=False):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (n, h, w, cin)), dtype)
    k = jnp.asarray(rng.normal(0, 0.2, (1, 1, cin, cout)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (cout,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.3, (cout,)), jnp.float32)
    mean = jnp.asarray(rng.normal(0, 0.3, (cout,)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 2.0, (cout,)), jnp.float32)
    res = jnp.asarray(rng.normal(0, 1, (n, h, w, cout)), dtype) if residual else None
    return x, k, scale, bias, mean, var, res


@pytest.mark.parametrize("residual", [False, True])
@pytest.mark.parametrize("relu", [True, False])
def test_pallas_interpret_matches_xla_forward(residual, relu):
    x, k, s, b, m, v, res = _mk(residual=residual)
    kw = dict(eps=1e-5, relu=relu, residual=res)
    y_x = pointwise_conv_frozen_bn(x, k, s, b, m, v, impl="xla", **kw)
    y_p = pointwise_conv_frozen_bn(x, k, s, b, m, v, impl="pallas", interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("residual", [False, True])
def test_pallas_interpret_matches_xla_gradients(residual):
    x, k, s, b, m, v, res = _mk(residual=residual)

    def loss(impl, interpret):
        def f(x, k, res):
            y = pointwise_conv_frozen_bn(
                x, k, s, b, m, v, relu=True, residual=res, impl=impl, interpret=interpret
            )
            return jnp.sum(jnp.sin(y))

        if residual:
            return jax.grad(f, argnums=(0, 1, 2))(x, k, res)
        return jax.grad(f, argnums=(0, 1))(x, k, None)

    g_x = loss("xla", None)
    g_p = loss("pallas", True)
    for a, b_ in zip(g_x, g_p):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_matches_unfused_conv_bn_relu_math():
    """The folded math must equal conv1x1 -> frozen-BN affine -> relu."""
    x, k, s, b, m, v, _ = _mk()
    y = pointwise_conv_frozen_bn(x, k, s, b, m, v, impl="xla", relu=True)
    z = jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    c = s / np.sqrt(np.asarray(v) + 1e-5)
    ref = jnp.maximum((z - m) * c + b, 0.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_odd_row_count_tiles():
    """M not a multiple of 256 (batch-1 inference shapes) still works."""
    x, k, s, b, m, v, _ = _mk(n=1, h=8, w=8, cin=16, cout=32)
    y = pointwise_conv_frozen_bn(x, k, s, b, m, v, impl="pallas", interpret=True)
    ref = pointwise_conv_frozen_bn(x, k, s, b, m, v, impl="xla")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


# ───────────────────────── model-level integration ─────────────────────────


def _tiny_r50_cfgs(fuse):
    from argus_tpu.models.resnet import ResNet, BottleneckBlock

    return ResNet(
        stage_sizes=(1, 1),
        block_cls=BottleneckBlock,
        output_dim=8,
        num_filters=8,
        bn_frozen=True,
        bn_frozen_affine=True,
        fuse_pointwise=fuse,
    )


def test_fused_model_same_tree_and_outputs():
    """fuse_pointwise='on' (XLA-math fallback on CPU) produces the same variable
    tree and the same outputs/gradients as the unfused frozen-affine model."""
    from flax.traverse_util import flatten_dict

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)

    net_off = _tiny_r50_cfgs("off")
    net_on = _tiny_r50_cfgs("on")
    v_off = net_off.init(jax.random.PRNGKey(7), x, train=False)
    v_on = net_on.init(jax.random.PRNGKey(7), x, train=False)

    flat_off = flatten_dict(jax.tree_util.tree_map(lambda a: a.shape, v_off))
    flat_on = flatten_dict(jax.tree_util.tree_map(lambda a: a.shape, v_on))
    assert flat_off == flat_on  # identical paths AND shapes

    # flax path-derived RNG: same names -> bitwise-identical init
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), v_off, v_on
    )

    y_off = net_off.apply(v_off, x, train=True, mutable=["batch_stats"])[0]
    y_on = net_on.apply(v_off, x, train=True, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off), rtol=1e-4, atol=1e-5)

    def loss(net, params):
        y = net.apply(
            {"params": params, "batch_stats": v_off["batch_stats"]}, x, train=True
        )
        return jnp.sum(y**2)

    g_off = jax.grad(lambda p: loss(net_off, p))(v_off["params"])
    g_on = jax.grad(lambda p: loss(net_on, p))(v_off["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=1e-4
        ),
        g_off,
        g_on,
    )


def test_odd_m_not_multiple_of_8():
    """M = N*H*W with an odd factor (e.g. 7x7 stage maps from 224x224 inputs)
    must pick a small exact-divisor tile, not crash (review finding)."""
    x, k, s, b, m, v, _ = _mk(n=1, h=7, w=7, cin=16, cout=32)
    y = pointwise_conv_frozen_bn(x, k, s, b, m, v, impl="pallas", interpret=True)
    ref = pointwise_conv_frozen_bn(x, k, s, b, m, v, impl="xla")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)

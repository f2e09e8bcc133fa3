"""Fused whole-bottleneck-block kernels (ops/pallas/block_fused.py): the
hand-derived single-pass backward must match pure autodiff, and the Pallas
kernels (interpret mode) must match the XLA-math path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from argus_tpu.ops.pallas.block_fused import _block, _xla_forward, fused_bottleneck_block


def _mk(n=2, h=8, w=8, cin=32, f=16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (n, h, w, cin)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.2, (cin, f)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.2, (3, 3, f, f)), jnp.float32)
    w3 = jnp.asarray(rng.normal(0, 0.2, (f, cin)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.3, (1, f)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.3, (1, f)), jnp.float32)
    b3 = jnp.asarray(rng.normal(0, 0.3, (1, cin)), jnp.float32)
    return x, w1, b1, w2, b2, w3, b3


def test_forward_matches_xla_reference():
    x, w1, b1, w2, b2, w3, b3 = _mk()
    ref = _xla_forward(x, w1, b1, w2, b2, w3, b3)
    out_x = _block(x, w1, b1, w2, b2, w3, b3, "xla", None)
    out_p = _block(x, w1, b1, w2, b2, w3, b3, "pallas", True)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_hand_backward_matches_autodiff():
    """The custom-VJP formulas (XLA-math engine) vs pure autodiff of the
    forward — validates the math independent of Pallas."""
    x, w1, b1, w2, b2, w3, b3 = _mk(seed=1)

    def loss_auto(x, w1, w2, w3):
        return jnp.sum(jnp.sin(_xla_forward(x, w1, b1, w2, b2, w3, b3)))

    def loss_custom(x, w1, w2, w3):
        return jnp.sum(jnp.sin(_block(x, w1, b1, w2, b2, w3, b3, "xla", None)))

    g_auto = jax.grad(loss_auto, argnums=(0, 1, 2, 3))(x, w1, w2, w3)
    g_cust = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(x, w1, w2, w3)
    for a, c in zip(g_auto, g_cust):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), rtol=1e-4, atol=1e-4)


def test_pallas_backward_matches_xla_backward():
    x, w1, b1, w2, b2, w3, b3 = _mk(seed=2)

    def loss(impl, interpret):
        def f(x, w1, w2, w3):
            return jnp.sum(jnp.sin(_block(x, w1, b1, w2, b2, w3, b3, impl, interpret)))

        return jax.grad(f, argnums=(0, 1, 2, 3))(x, w1, w2, w3)

    g_x = loss("xla", None)
    g_p = loss("pallas", True)
    for a, p in zip(g_x, g_p):
        np.testing.assert_allclose(np.asarray(p), np.asarray(a), rtol=1e-4, atol=1e-4)


def test_public_op_folds_frozen_bn():
    """fused_bottleneck_block == conv/bn/relu chain with frozen buffers."""
    rng = np.random.default_rng(3)
    n, h, w, cin, f = 2, 8, 8, 32, 16
    x = jnp.asarray(rng.normal(0, 1, (n, h, w, cin)), jnp.float32)
    k1 = jnp.asarray(rng.normal(0, 0.2, (1, 1, cin, f)), jnp.float32)
    k2 = jnp.asarray(rng.normal(0, 0.2, (3, 3, f, f)), jnp.float32)
    k3 = jnp.asarray(rng.normal(0, 0.2, (1, 1, f, cin)), jnp.float32)

    def bnp(c, seed):
        r = np.random.default_rng(seed)
        return (
            jnp.asarray(r.uniform(0.5, 1.5, (c,)), jnp.float32),
            jnp.asarray(r.normal(0, 0.2, (c,)), jnp.float32),
            jnp.asarray(r.normal(0, 0.2, (c,)), jnp.float32),
            jnp.asarray(r.uniform(0.5, 2.0, (c,)), jnp.float32),
        )

    s1, bi1, m1, v1 = bnp(f, 10)
    s2, bi2, m2, v2 = bnp(f, 11)
    s3, bi3, m3, v3 = bnp(cin, 12)

    out = fused_bottleneck_block(
        x, k1, s1, bi1, m1, v1, k2, s2, bi2, m2, v2, k3, s3, bi3, m3, v3, impl="xla"
    )

    def cbr(h_, k, s, b, m, v, pad):
        y = jax.lax.conv_general_dilated(
            h_, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        c = s / jnp.sqrt(v + 1e-5)
        return (y - m) * c + b

    h1 = jnp.maximum(cbr(x, k1, s1, bi1, m1, v1, "VALID"), 0.0)
    h2 = jnp.maximum(cbr(h1, k2, s2, bi2, m2, v2, ((1, 1), (1, 1))), 0.0)
    y3 = cbr(h2, k3, s3, bi3, m3, v3, "VALID")
    ref = jnp.maximum(y3 + x, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fused_block_model_same_tree_and_grads():
    """fuse_block='on' (XLA-math fallback on CPU) keeps the variable tree and
    matches the unfused frozen-affine model's outputs and gradients. Only the
    stride-1 identity blocks are fused; projection blocks keep the XLA path."""
    from flax.traverse_util import flatten_dict

    from argus_tpu.models.resnet import BottleneckBlock, ResNet

    def mk(fuse):
        return ResNet(
            stage_sizes=(2, 2),  # block 1 of each stage is stride-1 identity -> fused
            block_cls=BottleneckBlock,
            output_dim=8,
            num_filters=8,
            bn_frozen=True,
            bn_frozen_affine=True,
            fuse_block=fuse,
        )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    net_off, net_on = mk("off"), mk("on")
    v_off = net_off.init(jax.random.PRNGKey(7), x, train=False)
    v_on = net_on.init(jax.random.PRNGKey(7), x, train=False)

    assert flatten_dict(jax.tree_util.tree_map(lambda a: a.shape, v_off)) == flatten_dict(
        jax.tree_util.tree_map(lambda a: a.shape, v_on)
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), v_off, v_on
    )

    y_off = net_off.apply(v_off, x, train=True, mutable=["batch_stats"])[0]
    y_on = net_on.apply(v_off, x, train=True, mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off), rtol=1e-4, atol=1e-4)

    def loss(net, params):
        y = net.apply({"params": params, "batch_stats": v_off["batch_stats"]}, x, train=True)
        return jnp.sum(y**2)

    g_off = jax.grad(lambda p: loss(net_off, p))(v_off["params"])
    g_on = jax.grad(lambda p: loss(net_on, p))(v_off["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4
        ),
        g_off,
        g_on,
    )

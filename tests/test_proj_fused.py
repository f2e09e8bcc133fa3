"""Fused projection-block kernels (ops/pallas/proj_fused.py): interpret-mode
Pallas vs XLA reference math, hand-derived backward vs pure autodiff, stride-1
and stride-2, multi-image grids, and model-level tree/value equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from argus_tpu.ops.pallas.proj_fused import _proj_block, _xla_forward


def _args(S, CIN=24, F=16, COUT=32, N=4, H=8, W=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (N, H, W, CIN)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.1, (CIN, F)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, F, F)), jnp.float32)
    w3 = jnp.asarray(rng.normal(0, 0.1, (F, COUT)), jnp.float32)
    wsc = jnp.asarray(rng.normal(0, 0.1, (CIN, COUT)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.1, (1, F)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.1, (1, F)), jnp.float32)
    b3 = jnp.asarray(rng.normal(0, 0.1, (1, COUT)), jnp.float32)
    bsc = jnp.asarray(rng.normal(0, 0.1, (1, COUT)), jnp.float32)
    return (x, w1, b1, w2, b2, w3, b3, wsc, bsc)


@pytest.mark.parametrize("S", [1, 2])
@pytest.mark.parametrize("g", [1, 2, 4])
def test_forward_matches_xla(S, g):
    args = _args(S)
    out_p = _proj_block(*args, S, "pallas", True, g)
    out_x = _xla_forward(*args, S)
    N, H, W, _ = args[0].shape
    assert out_p.shape == (N, H // S, W // S, 32)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("S", [1, 2])
@pytest.mark.parametrize("g", [1, 4])
def test_backward_matches_autodiff(S, g):
    """The hand-derived single-pass backward (strided tap transpose via parity
    interleave) must match pure autodiff through the XLA math."""
    args = _args(S)

    def loss_pallas(a):
        out = _proj_block(*a, S, "pallas", True, g)
        return jnp.sum(out * jnp.sin(out))

    def loss_xla(a):
        out = _xla_forward(*a, S)
        return jnp.sum(out * jnp.sin(out))

    vp, gp = jax.value_and_grad(loss_pallas)(args)
    vx, gx = jax.value_and_grad(loss_xla)(args)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
    names = ["x", "w1", "b1", "w2", "b2", "w3", "b3", "wsc", "bsc"]
    for name, a, b in zip(names, gp, gx):
        if name.startswith("b"):
            # folded-bias cotangents are intentionally dropped (frozen BN buffers)
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_model_level_tree_and_value_equivalence():
    """fuse_proj must not change the variable tree, the forward values, or the
    gradients of a frozen-affine model (interpret-mode kernels on CPU)."""
    from argus_tpu.models import NCameraCNN, NCameraCNNConfig

    kw = dict(
        n_cams=1,
        backbone="resnet50",
        resnet_output_dim=8,
        bn_frozen=True,
        bn_frozen_affine=True,
    )
    m_ref = NCameraCNN(NCameraCNNConfig(**kw))
    m_fused = NCameraCNN(NCameraCNNConfig(**kw, fuse_proj="on"))
    x = jnp.asarray(np.random.default_rng(0).normal(0.45, 0.2, (2, 64, 64, 3)), jnp.float32)
    v_ref = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    v_fused = m_fused.init(jax.random.PRNGKey(0), x, train=False)

    # identical variable trees (checkpoint/torch-import compatibility)
    tr = jax.tree_util.tree_structure(v_ref)
    tf = jax.tree_util.tree_structure(v_fused)
    assert tr == tf
    for a, b in zip(jax.tree_util.tree_leaves(v_ref), jax.tree_util.tree_leaves(v_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    out_ref = m_ref.apply(v_ref, x, train=False)
    out_fused = m_fused.apply(v_fused, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )

    def loss(model, variables):
        def f(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x,
                train=True,
                mutable=["batch_stats"],
            )[0]
            return jnp.sum(out**2)

        return jax.grad(f)(variables["params"])

    g_ref = loss(m_ref, v_ref)
    g_fused = loss(m_fused, v_fused)
    ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref)
    fused_leaves = jax.tree_util.tree_leaves_with_path(g_fused)
    for (pa, a), (_, b) in zip(ref_leaves, fused_leaves):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(pa),
        )

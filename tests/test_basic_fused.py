"""Fused BasicBlock kernels (ops/pallas/basic_fused.py): value + gradient
equivalence vs the XLA reference math, and model-level equivalence for the
resnet18 backbone (the keypoint family's default)."""

import jax
import jax.numpy as jnp
import numpy as np

from argus_tpu.ops.pallas.basic_fused import _basic_block, _xla_forward


def _params(rng, c):
    mk = lambda s: jnp.asarray(rng.normal(0, 0.15, s), jnp.float32)
    return (
        mk((3, 3, c, c)), jnp.asarray(rng.normal(0, 0.05, (1, c)), jnp.float32),
        mk((3, 3, c, c)), jnp.asarray(rng.normal(0, 0.05, (1, c)), jnp.float32),
    )


def test_basic_block_matches_xla_autodiff():
    rng = np.random.default_rng(0)
    c = 32
    x = jnp.asarray(rng.normal(0, 0.5, (3, 8, 8, c)), jnp.float32)
    w1, b1, w2, b2 = _params(rng, c)

    def loss(fn):
        def inner(args):
            xv, w1v, w2v = args
            out = fn(xv, w1v, w2v)
            return jnp.sum(out * jnp.sin(out * 0.2))
        return inner

    pallas_fn = lambda xv, w1v, w2v: _basic_block(xv, w1v, b1, w2v, b2, "pallas", True, 1)

    def ref_fn(xv, w1v, w2v):
        return _xla_forward(xv, w1v, b1, w2v, b2)

    args = (x, w1, w2)
    vp, gp = jax.value_and_grad(loss(pallas_fn))(args)
    vr, gr = jax.value_and_grad(loss(ref_fn))(args)
    np.testing.assert_allclose(float(vp), float(vr), rtol=1e-5)
    for a, b, tag in zip(gp, gr, ("dx", "dw1", "dw2")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=tag
        )

    # multi-image grid step
    vp2, gp2 = jax.value_and_grad(
        loss(lambda xv, w1v, w2v: _basic_block(xv, w1v, b1, w2v, b2, "pallas", True, 3))
    )(args)
    np.testing.assert_allclose(float(vp2), float(vr), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp2[1]), np.asarray(gr[1]), rtol=2e-4, atol=2e-5)


def test_model_level_fused_basic_equivalence():
    """fuse_block on a frozen-affine resnet18 must keep the variable tree,
    outputs, and gradients (XLA-fallback math on CPU; the Pallas kernels are
    pinned by the interpret-mode test above)."""
    from argus_tpu.models import NCameraCNN, NCameraCNNConfig

    kw = dict(
        n_cams=1,
        backbone="resnet18",
        resnet_output_dim=8,
        bn_frozen=True,
        bn_frozen_affine=True,
    )
    m_ref = NCameraCNN(NCameraCNNConfig(**kw))
    m_fused = NCameraCNN(NCameraCNNConfig(**kw, fuse_block="on"))
    x = jnp.asarray(np.random.default_rng(0).normal(0.45, 0.2, (2, 64, 64, 3)), jnp.float32)
    v_ref = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    v_fused = m_fused.init(jax.random.PRNGKey(0), x, train=False)

    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(v_fused)
    for a, b in zip(jax.tree_util.tree_leaves(v_ref), jax.tree_util.tree_leaves(v_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    out_ref = m_ref.apply(v_ref, x, train=False)
    out_fused = m_fused.apply(v_fused, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )

    def grads(model, variables):
        def f(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )[0]
            return jnp.sum(out**2)

        return jax.grad(f)(variables["params"])

    g_ref = grads(m_ref, v_ref)
    g_fused = grads(m_fused, v_fused)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_fused),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=3e-4,
            err_msg=jax.tree_util.keystr(pa),
        )

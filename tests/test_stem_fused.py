"""Fused stem kernel (ops/pallas/stem_fused.py): the s2d(4) parity-packed
matmul formulation must reproduce the reference stem (conv7x7/s2 pad-3 +
frozen-BN affine + relu + maxpool3x3/s2 pad-1) exactly, in value and in the
conv-kernel gradient, through both the XLA fallback and the interpret-mode
Pallas kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from argus_tpu.models.resnet import space_to_depth
from argus_tpu.ops.pallas.stem_fused import (
    _stem_pool,
    _xla_stem_pool,
    fused_stem_pool,
    pack_stem_weights,
)


def _ref_stem(x, k7, scale, bias, mean, var, eps=1e-5):
    """The reference math: torch-padded conv + frozen-BN + relu + maxpool."""
    y = jax.lax.conv_general_dilated(
        x, k7, (2, 2), ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    c = scale * jax.lax.rsqrt(var + eps)
    y = jnp.maximum(y * c + (bias - mean * c), 0.0)
    # maxpool 3x3/s2 pad 1; pads never win (relu >= 0) so 0-padding is exact
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def _inputs(n=2, hw=64, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, 1, (n, hw, hw, 3)), jnp.float32)
    k7 = jnp.asarray(rng.normal(0, 0.2, (7, 7, 3, 64)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (64,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.3, (64,)), jnp.float32)
    mean = jnp.asarray(rng.normal(0, 0.3, (64,)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 1.5, (64,)), jnp.float32)
    return x, k7, scale, bias, mean, var


def test_space_to_depth_conv_matches_reshape():
    """The one-hot-conv s2d (TPU fast path) must equal the reshape/transpose
    formulation exactly, for both stem block sizes."""
    from argus_tpu.models.resnet import space_to_depth, space_to_depth_conv

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 24, 3)), jnp.float32)
    for b in (2, 4):
        np.testing.assert_array_equal(
            np.asarray(space_to_depth_conv(x, b)), np.asarray(space_to_depth(x, b))
        )


def test_packing_reproduces_reference_stem():
    """The whole derivation (8x8 zero-pad trick, s2d channel order, parity-major
    output packing, in-packed-coords maxpool) vs the literal conv/reduce_window
    reference."""
    x, k7, scale, bias, mean, var = _inputs()
    ref = _ref_stem(x, k7, scale, bias, mean, var)

    W, b = pack_stem_weights(k7, scale, bias, mean, var, 1e-5, jnp.float32)
    got = _xla_stem_pool(space_to_depth(x, 4), W, b)
    assert got.shape == ref.shape == (2, 16, 16, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_matches_fallback_and_gradient():
    """Interpret-mode Pallas fwd + wgrad-only bwd vs the XLA fallback autodiff,
    through the differentiable packing back to the (7,7,3,64) kernel."""
    x, k7, scale, bias, mean, var = _inputs(n=3, seed=1)

    def loss(k7v, impl):
        out = fused_stem_pool(x, k7v, scale, bias, mean, var, impl=impl, interpret=True)
        return jnp.sum(out * jnp.sin(out)), out

    (vp, outp), gp = jax.value_and_grad(loss, has_aux=True)(k7, "pallas")
    (vx, outx), gx = jax.value_and_grad(loss, has_aux=True)(k7, "xla")
    np.testing.assert_allclose(np.asarray(outp), np.asarray(outx), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-5)

    # and the gradient agrees with autodiff through the REFERENCE math
    def ref_loss(k7v):
        out = _ref_stem(x, k7v, scale, bias, mean, var)
        return jnp.sum(out * jnp.sin(out))

    gr = jax.grad(ref_loss)(k7)
    # rtol 3e-4: the im2col fwd (one K=432 f32 dot) sums in a different order
    # than the reference's per-tap convs; bf16 inputs leave ~1e-4 relative noise
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), rtol=3e-4, atol=1e-5)


def test_model_level_fused_stem_equivalence():
    """fuse_stem must keep the variable tree, outputs, and gradients of the
    frozen-affine model (interpret-mode kernels on CPU)."""
    from argus_tpu.models import NCameraCNN, NCameraCNNConfig

    kw = dict(
        n_cams=1,
        backbone="resnet50",
        resnet_output_dim=8,
        bn_frozen=True,
        bn_frozen_affine=True,
    )
    m_ref = NCameraCNN(NCameraCNNConfig(**kw))
    m_fused = NCameraCNN(NCameraCNNConfig(**kw, fuse_stem="on"))
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
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-4,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_stem_grad_stride_subsamples_and_scales():
    """grad_stride=2's dW must equal the dW computed on the FIRST HALF of the
    batch scaled by 2 (contiguous-prefix subsample — grid-side in the Pallas
    path; see _stem_bwd_pallas), in both impls."""
    import numpy as np

    from argus_tpu.ops.pallas.stem_fused import fused_stem_pool

    rng = np.random.default_rng(3)
    N, H, W = 4, 16, 16
    x = jnp.asarray(rng.uniform(0, 1, (N, H, W, 3)), jnp.float32)
    k7 = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 64)), jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (64,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)
    mean = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)
    var = jnp.asarray(rng.uniform(0.5, 1.5, (64,)), jnp.float32)

    for impl in ("pallas", "xla"):
        def loss(k7v, xv, stride):
            out = fused_stem_pool(
                xv, k7v, scale, bias, mean, var, impl=impl, interpret=True,
                grad_stride=stride,
            )
            return jnp.sum(out * jnp.cos(out))

        g_strided = jax.grad(loss)(k7, x, 2)
        g_half = jax.grad(lambda k: loss(k, x[:2], 1))(k7)
        np.testing.assert_allclose(
            # rtol 1e-4: XLA reduces the two batch shapes in different orders
            np.asarray(g_strided), 2.0 * np.asarray(g_half), rtol=1e-4, atol=1e-6,
            err_msg=impl,
        )


def test_stem_packed_out_matches_unpacked():
    """packed_out emits the pair-packed (N, HS, WS/2, 128) view of the exact
    same pool values (out[..., j, r*64+c] == pool[..., 2j+r, c]), through both
    the interpret-mode Pallas kernel and the XLA fallback."""
    x, k7, scale, bias, mean, var = _inputs()
    for impl in ("pallas", "xla"):
        ref = fused_stem_pool(
            x, k7, scale, bias, mean, var, impl=impl, interpret=True
        )
        got = fused_stem_pool(
            x, k7, scale, bias, mean, var, impl=impl, interpret=True,
            packed_out=True,
        )
        n, hs, wsp, c2 = got.shape
        assert (hs, wsp, c2) == (ref.shape[1], ref.shape[2] // 2, 128)
        np.testing.assert_allclose(
            np.asarray(got).reshape(n, hs, 2 * wsp, 64), np.asarray(ref),
            rtol=1e-6, atol=1e-6, err_msg=impl,
        )


def test_model_level_packed_stem_handoff():
    """frozen_stages=1 with every fuse option ON routes the stem's packed
    output straight into the packed stage-0 chain (XLA fallback math on CPU —
    the plumbing and shape logic under test; kernels are pinned above and in
    test_stage_fused): outputs must match the unfused frozen model."""
    from argus_tpu.models import NCameraCNN, NCameraCNNConfig

    kw = dict(
        n_cams=1,
        backbone="resnet50",
        resnet_output_dim=8,
        bn_frozen=True,
        bn_frozen_affine=True,
        frozen_stages=1,
    )
    m_ref = NCameraCNN(NCameraCNNConfig(**kw))
    m_fused = NCameraCNN(
        NCameraCNNConfig(
            **kw, fuse_block="on", fuse_proj="on", fuse_stage="on", fuse_stem="on"
        )
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(0.45, 0.2, (2, 64, 64, 3)), jnp.float32
    )
    v_ref = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    v_fused = m_fused.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(v_fused)

    out_ref = m_ref.apply(v_ref, x, train=False)
    out_fused = m_fused.apply(v_fused, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )

    # and the packed handoff must survive a grad trace (frozen stage-0 carries
    # no gradient; deeper grads match the reference model)
    def loss(model, variables):
        def f(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True,
            )
            return jnp.sum(out**2)

        return jax.grad(f)(variables["params"])

    g_ref = loss(m_ref, v_ref)
    g_fused = loss(m_fused, v_fused)
    bb = g_fused["backbone"]
    for name in [k for k in bb if k == "conv_init" or k.startswith("stage0_")]:
        assert all(
            float(jnp.abs(l).max()) == 0.0 for l in jax.tree_util.tree_leaves(bb[name])
        ), name
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_fused),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=3e-4,
            err_msg=jax.tree_util.keystr(pa),
        )

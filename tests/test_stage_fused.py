"""Whole-stage chain kernels (ops/pallas/stage_fused.py): the chained
projection+identity kernels must reproduce the composed reference math in
value and in every weight gradient, through both the XLA fallback and the
interpret-mode Pallas kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from argus_tpu.ops.pallas.stage_fused import _xla_chain, fused_stage


def _mk_params(rng, cin, f, cout, n_id, with_proj=True):
    mk = lambda s: jnp.asarray(rng.normal(0, 0.15, s), jnp.float32)
    zb = lambda c: jnp.asarray(rng.normal(0, 0.05, (1, c)), jnp.float32)
    pw = None
    if with_proj:
        pw = (mk((cin, f)), zb(f), mk((3, 3, f, f)), zb(f),
              mk((f, cout)), zb(cout), mk((cin, cout)), zb(cout))
    idws = tuple(
        (mk((cout, f)), zb(f), mk((3, 3, f, f)), zb(f), mk((f, cout)), zb(cout))
        for _ in range(n_id)
    )
    return pw, idws


def _ref_chain(x, pw, idws, S):
    """Reference: composed per-block XLA math (the exact ops the per-block
    fused kernels are pinned against)."""
    return _xla_chain(x, pw, idws, S)


@pytest.mark.parametrize(
    "cin,f,cout,S,n_id,with_proj",
    [
        (32, 16, 64, 1, 2, True),   # stage-0 shape: stride-1 projection entry
        (64, 16, 64, 2, 2, True),   # stride-2 stage entry
        (64, 16, 64, 1, 3, False),  # pure identity chain (stage-2 split tail)
    ],
)
def test_chain_matches_composed_reference(cin, f, cout, S, n_id, with_proj):
    rng = np.random.default_rng(0)
    n, h, w = 3, 8, 8
    x = jnp.asarray(rng.normal(0, 0.5, (n, h, w, cin if with_proj else cout)), jnp.float32)
    pw, idws = _mk_params(rng, cin, f, cout, n_id, with_proj)

    def loss(fn):
        def inner(params):
            pwv, idwsv = params
            out = fn(x, pwv, idwsv)
            return jnp.sum(out * jnp.cos(out * 0.3))
        return inner

    pallas_fn = lambda xv, pwv, idwsv: fused_stage(
        xv, pwv, idwsv, stride=S, impl="pallas", interpret=True
    )
    xla_fn = lambda xv, pwv, idwsv: fused_stage(
        xv, pwv, idwsv, stride=S, impl="xla", interpret=True
    )
    ref_fn = lambda xv, pwv, idwsv: _ref_chain(xv, pwv, idwsv, S)

    params = (pw, idws)
    vp, gp = jax.value_and_grad(loss(pallas_fn))(params)
    vx, gx = jax.value_and_grad(loss(xla_fn))(params)
    vr, gr = jax.value_and_grad(loss(ref_fn))(params)

    np.testing.assert_allclose(float(vp), float(vr), rtol=1e-5)
    np.testing.assert_allclose(float(vx), float(vr), rtol=1e-5)

    def split(g):
        """(weight grads, bias grads): biases are the odd tuple slots."""
        gpw, gid = g
        ws = [gpw[i] for i in range(0, 8, 2)] if gpw is not None else []
        bs = [gpw[i] for i in range(1, 8, 2)] if gpw is not None else []
        for t in gid:
            ws += [t[0], t[2], t[4]]
            bs += [t[1], t[3], t[5]]
        return ws, bs

    wr, _ = split(gr)
    for got, tag in ((gp, "pallas"), (gx, "xla")):
        wg, bg = split(got)
        for k, (a, b) in enumerate(zip(wg, wr)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                err_msg=f"{tag}:w{k}",
            )
        # frozen-affine contract: folded biases are buffers, zero cotangent
        for k, b in enumerate(bg):
            np.testing.assert_array_equal(np.asarray(b), 0.0, err_msg=f"{tag}:b{k}")


def test_chain_cap_splitting_matches_unsplit():
    """A stage longer than chain_cap splits into consecutive chains; the split
    must be value- and grad-exact vs the single-chain math."""
    rng = np.random.default_rng(2)
    cin, f, cout, S = 32, 16, 64, 2
    x = jnp.asarray(rng.normal(0, 0.5, (2, 8, 8, cin)), jnp.float32)
    pw, idws = _mk_params(rng, cin, f, cout, 5, True)  # proj + 5 ids (stage-2 shape)

    def loss(cap):
        def inner(params):
            pwv, idwsv = params
            out = fused_stage(
                x, pwv, idwsv, stride=S, impl="pallas", interpret=True, chain_cap=cap
            )
            return jnp.sum(out * jnp.sin(out * 0.1))
        return inner

    params = (pw, idws)
    v3, g3 = jax.value_and_grad(loss(3))(params)       # split: proj+2id, 3id
    v9, g9 = jax.value_and_grad(loss(9))(params)       # single chain
    np.testing.assert_allclose(float(v3), float(v9), rtol=1e-6)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g3),
        jax.tree_util.tree_leaves_with_path(g9),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_model_level_fused_stage_equivalence():
    """fuse_stage must keep the variable tree, outputs, and gradients of the
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
    # fuse_stage needs fuse_block+fuse_proj active ("auto" = off on CPU); the
    # chain itself runs its XLA fallback math here — the Pallas kernels are
    # pinned by the interpret-mode tests above
    m_chain = NCameraCNN(
        NCameraCNNConfig(**kw, fuse_block="on", fuse_proj="on", fuse_stage="on")
    )
    x = jnp.asarray(np.random.default_rng(0).normal(0.45, 0.2, (2, 64, 64, 3)), jnp.float32)
    v_ref = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    v_chain = m_chain.init(jax.random.PRNGKey(0), x, train=False)

    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(v_chain)
    for a, b in zip(jax.tree_util.tree_leaves(v_ref), jax.tree_util.tree_leaves(v_chain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    out_ref = m_ref.apply(v_ref, x, train=False)
    out_chain = m_chain.apply(v_chain, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_chain), np.asarray(out_ref), rtol=2e-4, atol=2e-4
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
    g_chain = grads(m_chain, v_chain)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_chain),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=3e-4,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_chain_matches_per_block_kernels():
    """The chain must equal the composition of the PER-BLOCK fused ops (same
    saved-residual backward semantics) bit-for-bit in fp32 interpret mode."""
    from argus_tpu.ops.pallas.block_fused import _block_saved
    from argus_tpu.ops.pallas.proj_fused import _proj_block

    rng = np.random.default_rng(1)
    cin, f, cout, S = 32, 16, 64, 2
    n, h, w = 2, 8, 8
    x = jnp.asarray(rng.normal(0, 0.5, (n, h, w, cin)), jnp.float32)
    pw, idws = _mk_params(rng, cin, f, cout, 2, True)

    def chain_loss(params):
        pwv, idwsv = params
        out = fused_stage(x, pwv, idwsv, stride=S, impl="pallas", interpret=True)
        return jnp.sum(out**2)

    def per_block_loss(params):
        pwv, idwsv = params
        cur = _proj_block(x, *pwv, S, "pallas", True, 1)
        for idw in idwsv:
            cur = _block_saved(cur, *idw, "pallas", True, 1)
        return jnp.sum(cur**2)

    params = (pw, idws)
    vc, gc = jax.value_and_grad(chain_loss)(params)
    vb, gb = jax.value_and_grad(per_block_loss)(params)
    np.testing.assert_allclose(float(vc), float(vb), rtol=1e-6)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gc),
        jax.tree_util.tree_leaves_with_path(gb),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa),
        )


def _walk_pallas_calls(jx, out):
    for eqn in jx.eqns:
        if eqn.primitive.name == "pallas_call":
            out.append(len(eqn.outvars))
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                _walk_pallas_calls(v.jaxpr, out)
            elif isinstance(v, (tuple, list)):
                for w in v:
                    if hasattr(w, "jaxpr"):
                        _walk_pallas_calls(w.jaxpr, out)
    return out


def test_frozen_inputs_select_no_save_forward():
    """The frozen_stages contract that makes freezing CHEAP: when the chain's
    input AND weights are stop-gradient'd, the custom-VJP primal (a
    single-output, no-save kernel) must trace — not the save-residual forward,
    whose dead residual writes survive DCE (a multi-output Pallas custom call
    is all-or-nothing to XLA). Regression for the round-3 finding that the
    downstream stop_gradient alone left ~4-5 ms/step of dead saves in the
    flagship step (trace outputs/traces/step_r3s4)."""
    rng = np.random.default_rng(3)
    cin, f, cout, S = 32, 16, 64, 2
    x = jnp.asarray(rng.normal(0, 0.5, (2, 8, 8, cin)), jnp.float32)
    pw, idws = _mk_params(rng, cin, f, cout, 2, True)

    def head(out, w):
        return jnp.sum((out * w) ** 2)

    w_head = jnp.ones((), jnp.float32)

    def loss_frozen(wh):
        sg = jax.lax.stop_gradient
        out = fused_stage(
            sg(x), jax.tree_util.tree_map(sg, pw), jax.tree_util.tree_map(sg, idws),
            stride=S, impl="pallas", interpret=True, chain_cap=3,
        )
        return head(out, wh)

    def loss_trainable(params):
        pwv, idwsv = params
        out = fused_stage(x, pwv, idwsv, stride=S, impl="pallas", interpret=True, chain_cap=3)
        return head(out, w_head)

    arities_frozen = _walk_pallas_calls(
        jax.make_jaxpr(jax.grad(loss_frozen))(w_head).jaxpr, []
    )
    arities_train = _walk_pallas_calls(
        jax.make_jaxpr(jax.grad(loss_trainable))((pw, idws)).jaxpr, []
    )
    # frozen: only no-save single-output forwards
    assert arities_frozen and all(a == 1 for a in arities_frozen), arities_frozen
    # sanity: the differentiated path does produce multi-output save-forwards
    assert any(a > 1 for a in arities_train), arities_train


def test_model_frozen_stages_whole_chain_equivalence():
    """frozen_stages through the fused chain path (XLA fallback math on CPU):
    same outputs as the unfused frozen model, zero grads for frozen stages,
    identical deeper grads — with the whole-stage (chain_cap=block_count)
    frozen chains and use-site weight stop_gradients active."""
    from argus_tpu.models import NCameraCNN, NCameraCNNConfig

    kw = dict(
        n_cams=1,
        backbone="resnet50",
        resnet_output_dim=8,
        bn_frozen=True,
        bn_frozen_affine=True,
        frozen_stages=2,
    )
    m_ref = NCameraCNN(NCameraCNNConfig(**kw))
    m_chain = NCameraCNN(
        NCameraCNNConfig(**kw, fuse_block="on", fuse_proj="on", fuse_stage="on")
    )
    x = jnp.asarray(np.random.default_rng(0).normal(0.45, 0.2, (2, 64, 64, 3)), jnp.float32)
    v_ref = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    v_chain = m_chain.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(v_chain)

    out_ref = m_ref.apply(v_ref, x, train=False)
    out_chain = m_chain.apply(v_chain, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_chain), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )

    def grads(model, variables):
        def f(params):
            out = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True,
            )
            return jnp.sum(out**2)

        return jax.grad(f)(variables["params"])

    g_ref = grads(m_ref, v_ref)
    g_chain = grads(m_chain, v_chain)
    bb = g_chain["backbone"]
    frozen = [k for k in bb if k in ("conv_init",) or k.startswith(("stage0_", "stage1_"))]
    assert frozen
    for name in frozen:
        assert all(
            float(jnp.abs(l).max()) == 0.0
            for l in jax.tree_util.tree_leaves(bb[name])
        ), name
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_chain),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=3e-4,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_packed_fwd_chain_matches_reference(monkeypatch):
    """The fully-packed no-save forward chain (stage-0 geometry, F=64): the
    pair-packed full-lane formulation must route on the primal path and
    reproduce the composed reference math. Packing is value-exact up to f32
    tap-accumulation order inside conv2."""
    import argus_tpu.ops.pallas.stage_fused as sf

    rng = np.random.default_rng(7)
    cin, f, cout, S, n_id = 64, 64, 256, 1, 2  # stage-0 shapes (stride-1 entry)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 8, 8, cin)), jnp.float32)
    pw, idws = _mk_params(rng, cin, f, cout, n_id, True)

    hits = []
    orig = sf._chain_fwd_packed
    monkeypatch.setattr(
        sf, "_chain_fwd_packed", lambda *a, **k: (hits.append(1), orig(*a, **k))[1]
    )
    out_packed = sf.fused_stage(
        x, pw, idws, stride=S, impl="pallas", interpret=True, chain_cap=3
    )
    assert hits, "packed forward chain did not engage at F=64 geometry"
    out_ref = _ref_chain(x, pw, idws, S)
    # conv2's packed form sums taps in a different f32 order; through a
    # 3-block chain that is ~1e-5 relative
    np.testing.assert_allclose(
        np.asarray(out_packed), np.asarray(out_ref), rtol=2e-4, atol=1e-4
    )

    # gate respects the kill switch
    hits.clear()
    monkeypatch.setenv("ARGUS_PACK_CHAIN", "0")
    out_off = sf.fused_stage(
        x, pw, idws, stride=S, impl="pallas", interpret=True, chain_cap=3
    )
    assert not hits
    np.testing.assert_allclose(
        np.asarray(out_off), np.asarray(out_ref), rtol=2e-4, atol=1e-4
    )

    # the differentiated (save/backward) path is untouched by the packed gate:
    # identical grads with the gate on and off (the gate only sees the primal)
    def loss(params):
        pwv, idwsv = params
        out = sf.fused_stage(x, pwv, idwsv, stride=S, impl="pallas", interpret=True)
        return jnp.sum(jnp.sin(out))

    monkeypatch.setenv("ARGUS_PACK_CHAIN", "1")
    g_on = jax.grad(loss)((pw, idws))
    monkeypatch.setenv("ARGUS_PACK_CHAIN", "0")
    g_off = jax.grad(loss)((pw, idws))
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_on),
        jax.tree_util.tree_leaves_with_path(g_off),
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(pa)
        )


def test_packed_fwd_chain_pre_packed_input():
    """x_packed=True: the chain consumes the pair-packed (N, H, W/2, 2C) view
    directly (the packed-output stem handoff) — same values as feeding the
    unpacked array, through the interpret-mode Pallas kernel and the XLA
    fallback."""
    rng = np.random.default_rng(11)
    cin, f, cout, n_id = 64, 64, 256, 2
    n, h, w = 2, 8, 8
    x = jnp.asarray(rng.normal(0, 0.5, (n, h, w, cin)), jnp.float32)
    xp = x.reshape(n, h, w // 2, 2 * cin)  # linear-order identity
    pw, idws = _mk_params(rng, cin, f, cout, n_id, True)

    ref = _ref_chain(x, pw, idws, 1)
    for impl in ("pallas", "xla"):
        got = fused_stage(
            xp, pw, idws, stride=1, impl=impl, interpret=True,
            chain_cap=3, x_packed=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=1e-4, err_msg=impl
        )

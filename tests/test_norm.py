"""ops/norm.BatchNorm: exact-mode equivalence with flax nn.BatchNorm (values,
gradients, running-stats updates, variable tree) and fast-mode correctness
(stop-grad dx formula, unbiased strided dgamma/dbeta, convergence parity)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from argus_tpu.ops.norm import BatchNorm, _block_subsample


def _mk(norm_cls, **kw):
    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return norm_cls(use_running_average=False, momentum=0.9, epsilon=1e-5, **kw)(x)

    return M()


@pytest.fixture(scope="module")
def xkey():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 12, 10, 16), jnp.float32) * 2.0 + 0.5
    return x, key


def test_exact_mode_matches_flax_forward_and_grads(xkey):
    x, key = xkey
    ours = _mk(BatchNorm)
    ref = _mk(nn.BatchNorm)
    v_ours = ours.init(key, x)
    v_ref = ref.init(key, x)
    # same variable tree (checkpoint/torch-import compat)
    assert jax.tree_util.tree_structure(v_ours) == jax.tree_util.tree_structure(v_ref)

    # give scale/bias non-trivial values
    p = {"scale": jnp.linspace(0.5, 1.5, 16), "bias": jnp.linspace(-1, 1, 16)}
    v_ours = {"params": {"BatchNorm_0": p}, "batch_stats": v_ours["batch_stats"]}
    v_ref = {"params": {"BatchNorm_0": p}, "batch_stats": v_ref["batch_stats"]}

    def run(m, v):
        def loss(params, x):
            y, mut = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x,
                mutable=["batch_stats"],
            )
            return jnp.sum(jnp.sin(y)), mut

        (val, mut), grads = jax.value_and_grad(loss, has_aux=True)(v["params"], x)
        gx = jax.grad(lambda xx: loss(v["params"], xx)[0])(x)
        return val, grads, gx, mut

    val_o, g_o, gx_o, mut_o = run(ours, v_ours)
    val_r, g_r, gx_r, mut_r = run(ref, v_ref)

    np.testing.assert_allclose(val_o, val_r, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5), g_o, g_r
    )
    np.testing.assert_allclose(gx_o, gx_r, rtol=1e-4, atol=1e-5)
    # running stats updated identically
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        mut_o["batch_stats"],
        mut_r["batch_stats"],
    )


def test_eval_mode_matches_flax(xkey):
    x, key = xkey

    class MOurs(nn.Module):
        @nn.compact
        def __call__(self, x):
            return BatchNorm(use_running_average=True)(x)

    class MRef(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.BatchNorm(use_running_average=True)(x)

    stats = {"mean": jnp.linspace(-1, 1, 16), "var": jnp.linspace(0.5, 2.0, 16)}
    p = {"scale": jnp.linspace(0.5, 1.5, 16), "bias": jnp.linspace(-1, 1, 16)}
    vo = {"params": {"BatchNorm_0": p}, "batch_stats": {"BatchNorm_0": stats}}
    y_o = MOurs().apply(vo, x)
    y_r = MRef().apply(vo, x)
    np.testing.assert_allclose(y_o, y_r, rtol=1e-5, atol=1e-6)


def test_block_subsample_keeps_contiguous_blocks():
    x = jnp.arange(2 * 16 * 4 * 3, dtype=jnp.float32).reshape(2, 16, 4, 3)
    y = _block_subsample(x, 2)
    # H=16, stride 2 -> 8-row blocks: keep rows 0..7 of each 16-row group
    np.testing.assert_allclose(np.asarray(y), np.asarray(x[:, :8]))
    # H=12: falls to 2-row blocks: keep rows 0,1, 4,5, 8,9
    x2 = jnp.arange(1 * 12 * 4 * 3, dtype=jnp.float32).reshape(1, 12, 4, 3)
    y2 = _block_subsample(x2, 2)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(x2[:, [0, 1, 4, 5, 8, 9]]))
    # indivisible H -> unchanged
    x3 = jnp.zeros((1, 7, 4, 3))
    assert _block_subsample(x3, 2).shape == x3.shape


def test_fast_mode_forward_uses_strided_stats(xkey):
    x, key = xkey
    m_fast = _mk(BatchNorm, stats_stride=2)
    v = m_fast.init(key, x)
    y_fast, mut = m_fast.apply(v, x, mutable=["batch_stats"])

    # manual: stats from the block subsample, applied to all of x
    xs = _block_subsample(x, 2).astype(jnp.float32)
    mean = xs.mean((0, 1, 2))
    var = (xs**2).mean((0, 1, 2)) - mean**2
    y_ref = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    np.testing.assert_allclose(y_fast, y_ref, rtol=1e-4, atol=1e-5)
    # running stats track the SUBSAMPLED estimate
    np.testing.assert_allclose(
        mut["batch_stats"]["BatchNorm_0"]["mean"], 0.1 * mean, rtol=1e-5, atol=1e-6
    )


def test_fast_mode_dx_keeps_batch_coupling(xkey):
    """With strided stats, dx must follow the exact BN gradient formula with the
    batch moments estimated from the subsample (NOT a bare stop-grad dy*g*rstd)."""
    x, key = xkey
    m = _mk(BatchNorm, stats_stride=2, grad_stride=2)
    v = m.init(key, x)
    scale = jnp.linspace(0.5, 1.5, 16)
    v = {"params": {"BatchNorm_0": {"scale": scale, "bias": jnp.zeros(16)}},
         "batch_stats": v["batch_stats"]}

    dy = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    def f(xx):
        y, _ = m.apply(v, xx, mutable=["batch_stats"])
        return jnp.sum(y * dy)

    gx = jax.grad(f)(x)
    xs = _block_subsample(x, 2).astype(jnp.float32)
    mean = xs.mean((0, 1, 2))
    var = (xs**2).mean((0, 1, 2)) - mean**2
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (x - mean) * rstd
    xhat_s = _block_subsample(xhat, 2)
    dy_s = _block_subsample(dy, 2)
    m_dy = dy_s.mean((0, 1, 2))
    m_dy_xhat = (dy_s * xhat_s).mean((0, 1, 2))
    expected = (rstd * scale) * (dy - m_dy - xhat * m_dy_xhat)
    np.testing.assert_allclose(gx, expected, rtol=1e-4, atol=1e-5)


def test_grad_stride_estimates_are_unbiased_scaled(xkey):
    """grad_stride=1 must give EXACT dgamma/dbeta (same reductions); grad_stride=2
    must equal the stride-2 estimate scaled by the row ratio."""
    x, key = xkey
    dy = jax.random.normal(jax.random.PRNGKey(2), x.shape)

    def grads(grad_stride):
        m = _mk(BatchNorm, stats_stride=2, grad_stride=grad_stride)
        v = m.init(key, x)

        def f(params):
            y, _ = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, x, mutable=["batch_stats"]
            )
            return jnp.sum(y * dy)

        return jax.grad(f)(v["params"])["BatchNorm_0"]

    xs = _block_subsample(x, 2).astype(jnp.float32)
    mean = xs.mean((0, 1, 2))
    rstd = jax.lax.rsqrt((xs**2).mean((0, 1, 2)) - mean**2 + 1e-5)

    g1 = grads(1)
    xhat = (x - mean) * rstd
    np.testing.assert_allclose(g1["bias"], dy.sum((0, 1, 2)), rtol=1e-4)
    np.testing.assert_allclose(g1["scale"], (dy * xhat).sum((0, 1, 2)), rtol=1e-4)

    g2 = grads(2)
    dy_s, xhat_s = _block_subsample(dy, 2), _block_subsample(xhat, 2)
    ratio = x.shape[1] / dy_s.shape[1]
    np.testing.assert_allclose(g2["bias"], dy_s.sum((0, 1, 2)) * ratio, rtol=1e-4)
    np.testing.assert_allclose(
        g2["scale"], (dy_s * xhat_s).sum((0, 1, 2)) * ratio, rtol=1e-4
    )


def test_resnet_param_tree_unchanged_by_fast_mode():
    """Fast-mode strides must not alter the variable tree (checkpoint compat)."""
    from argus_tpu.models import NCameraCNN, NCameraCNNConfig

    k = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 6))
    v1 = NCameraCNN(NCameraCNNConfig(backbone="resnet18", resnet_output_dim=32)).init(
        k, x, train=False
    )
    v2 = NCameraCNN(
        NCameraCNNConfig(
            backbone="resnet18", resnet_output_dim=32, bn_stats_stride=4, bn_grad_stride=4
        )
    ).init(k, x, train=False)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_allclose(a, b), v1, v2)


@pytest.mark.slow
def test_fast_bn_convergence_parity():
    """Train the same tiny pose-regression problem with exact vs fast BN; the fast
    path must reach a comparable loss (within 25%) after the same step budget."""
    from argus_tpu.models import NCameraCNN, NCameraCNNConfig
    from argus_tpu.train import TrainConfig, create_train_state, make_train_step

    def run(stats_stride, grad_stride):
        cfg = TrainConfig(
            model_config=NCameraCNNConfig(
                n_cams=2,
                backbone="resnet18",
                resnet_output_dim=32,
                bn_stats_stride=stats_stride,
                bn_grad_stride=grad_stride,
            ),
            use_augmentation=False,
            wandb_log=False,
        )
        model, state = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
        step = make_train_step(model, cfg, base_seed=0)
        rng = np.random.default_rng(0)
        # pose-encoded images: brightness encodes translation x (learnable signal)
        n = 16
        tx = rng.uniform(-0.1, 0.1, (n,)).astype(np.float32)
        # brightness encodes the target + per-pixel noise so row subsampling
        # actually changes the estimated statistics
        base = (tx[:, None, None, None] * 5 + 0.5) * 255 * np.ones((n, 32, 32, 6), np.float32)
        noise = rng.normal(0.0, 20.0, base.shape).astype(np.float32)
        imgs = np.clip(base + noise, 0, 255).astype(np.uint8)
        poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (n, 1))
        poses[:, 0] = tx
        batch = {
            "images": jnp.asarray(imgs),
            "cube_pose": jnp.asarray(poses),
            "mask": jnp.ones((n,), jnp.float32),
        }
        losses = []
        for _ in range(60):
            state, loss = step(state, batch)
            losses.append(float(loss))
        return np.mean(losses[-10:])

    exact = run(1, 1)
    fast = run(4, 4)
    assert fast < max(1.25 * exact, exact + 1e-4), (exact, fast)
    # both must actually learn (well below the ~1e-2 loss of predicting zeros)
    assert exact < 5e-3 and fast < 5e-3, (exact, fast)


def test_pallas_impl_matches_xla_impl():
    """impl='pallas' (interpret mode on CPU) must match impl='xla' at stride 1:
    same forward, same dgamma/dbeta/dx through the custom VJP."""
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (4, 8, 8, 128), jnp.float32)
    dy = jax.random.normal(jax.random.PRNGKey(6), x.shape)

    def run(impl):
        m = _mk(BatchNorm, stats_stride=1, grad_stride=1, impl=impl)
        v = m.init(key, x)

        def f(params, xx):
            y, _ = m.apply(
                {"params": params, "batch_stats": v["batch_stats"]}, xx, mutable=["batch_stats"]
            )
            return jnp.sum(y * dy)

        val, gp = jax.value_and_grad(f)(v["params"], x)
        gx = jax.grad(lambda xx: f(v["params"], xx))(x)
        return val, gp["BatchNorm_0"], gx

    # force the xla path through the SAME custom-vjp code by using stride>1? No:
    # stride 1 + impl='xla' takes the plain autodiff path — which is the point:
    # pallas must reproduce the exact semantics.
    v_p, g_p, gx_p = run("pallas")
    v_x, g_x, gx_x = run("xla")
    np.testing.assert_allclose(v_p, v_x, rtol=1e-5)
    np.testing.assert_allclose(g_p["scale"], g_x["scale"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(g_p["bias"], g_x["bias"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gx_p, gx_x, rtol=1e-4, atol=1e-5)


def test_frozen_bn_trains_scale_bias_only(xkey):
    """bn_frozen (FrozenBatchNorm2d semantics): train-mode forward equals the
    eval-mode forward (running stats, here init mean=0/var=1), running stats are
    NOT updated, and gradients still flow to scale/bias and upstream."""
    from argus_tpu.models.resnet import ResNet, BasicBlock

    x, key = xkey
    x6 = jnp.concatenate([x, x], -1)  # (8,12,10,32) -> any C works

    net = ResNet(stage_sizes=[1], block_cls=BasicBlock, output_dim=8, bn_frozen=True)
    v = net.init(key, x6, train=False)

    y_train, mut = net.apply(v, x6, train=True, mutable=["batch_stats"])
    y_eval = net.apply(v, x6, train=False)
    np.testing.assert_allclose(np.asarray(y_train), np.asarray(y_eval), rtol=1e-5, atol=1e-5)
    # running stats unchanged (frozen)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        v["batch_stats"],
        mut["batch_stats"],
    )

    # gradients flow into every param (scale/bias and convs)
    def loss(params):
        y = net.apply({"params": params, "batch_stats": v["batch_stats"]}, x6, train=True)
        return jnp.sum(y**2)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


@pytest.mark.slow
@pytest.mark.parametrize("frozen_affine", [False, True])
def test_frozen_bn_convergence(frozen_affine):
    """Frozen-BN fine-tune mode must still learn the toy pose-regression problem
    (same setup as test_fast_bn_convergence_parity); from a random init its loss
    bar is looser than exact BN's, but it must clearly beat predicting zeros.
    Covers both trainable-affine (bn_frozen) and full FrozenBatchNorm2d
    (bn_frozen_affine — the flagship bench default)."""
    from argus_tpu.models import NCameraCNN, NCameraCNNConfig
    from argus_tpu.train import TrainConfig, create_train_state, make_train_step

    cfg = TrainConfig(
        model_config=NCameraCNNConfig(
            n_cams=2, backbone="resnet18", resnet_output_dim=32, bn_frozen=True,
            bn_frozen_affine=frozen_affine,
        ),
        use_augmentation=False,
        wandb_log=False,
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
    step = make_train_step(model, cfg, base_seed=0)
    rng = np.random.default_rng(0)
    n = 16
    tx = rng.uniform(-0.1, 0.1, (n,)).astype(np.float32)
    base = (tx[:, None, None, None] * 5 + 0.5) * 255 * np.ones((n, 32, 32, 6), np.float32)
    noise = rng.normal(0.0, 20.0, base.shape).astype(np.float32)
    imgs = np.clip(base + noise, 0, 255).astype(np.uint8)
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (n, 1))
    poses[:, 0] = tx
    batch = {
        "images": jnp.asarray(imgs),
        "cube_pose": jnp.asarray(poses),
        "mask": jnp.ones((n,), jnp.float32),
    }
    losses = []
    for _ in range(60):
        state, loss = step(state, batch)
        losses.append(float(loss))
    final = np.mean(losses[-10:])
    # predicting zeros scores ~mean(tx^2) ~ 3.3e-3; frozen BN must decisively beat it
    assert final < 2e-3, final


def test_frozen_affine_bn_no_affine_grads(xkey):
    """bn_frozen_affine (full torchvision FrozenBatchNorm2d: weight/bias/mean/var
    are all buffers): forward identical to bn_frozen, scale/bias gradients are
    exactly zero (the dgamma/dbeta reductions are dead code), conv gradients and
    upstream gradients still flow."""
    from argus_tpu.models.resnet import BasicBlock, ResNet

    x, key = xkey
    x6 = jnp.concatenate([x, x], -1)

    net_a = ResNet(stage_sizes=[1], block_cls=BasicBlock, output_dim=8, bn_frozen=True)
    net_f = ResNet(
        stage_sizes=[1], block_cls=BasicBlock, output_dim=8, bn_frozen=True, bn_frozen_affine=True
    )
    v = net_a.init(key, x6, train=False)

    # identical forward (the affine values are the same, only differentiability changes)
    y_a = net_a.apply(v, x6, train=True, mutable=["batch_stats"])[0]
    y_f = net_f.apply(v, x6, train=True, mutable=["batch_stats"])[0]
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_f))

    def loss(params):
        y = net_f.apply({"params": params, "batch_stats": v["batch_stats"]}, x6, train=True)
        return jnp.sum(y**2)

    from flax.traverse_util import flatten_dict

    g = jax.grad(loss)(v["params"])
    flat = flatten_dict(g, sep="/")
    bn_leaves = {k: a for k, a in flat.items() if "norm" in k.lower()}
    conv_leaves = {k: a for k, a in flat.items() if k not in bn_leaves}
    assert bn_leaves, sorted(flat)
    for k, a in bn_leaves.items():
        np.testing.assert_array_equal(np.asarray(a), 0.0, err_msg=k)
    assert any(float(jnp.abs(a).sum()) > 0 for a in conv_leaves.values())


def test_pallas_stats_exact_on_nondivisible_rows():
    """stride=1 pallas reductions must be EXACT even when the row count doesn't
    tile into the kernel's block size (falls back to an XLA reduction rather
    than silently dropping trailing rows — review finding)."""
    from argus_tpu.ops.pallas.bn_reduce import fused_bn_bwd_reduce, fused_stats

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (1, 7, 7, 128)), jnp.float32)  # 49 rows
    s, q, n = fused_stats(x, stride=1, interpret=True)
    assert n == 49
    np.testing.assert_allclose(np.asarray(s), np.asarray(x.reshape(-1, 128).sum(0)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(q), np.asarray((x.reshape(-1, 128) ** 2).sum(0)), rtol=1e-5
    )

    dy = jnp.asarray(rng.normal(0, 1, x.shape), jnp.float32)
    mean = jnp.asarray(rng.normal(0, 1, (128,)), jnp.float32)
    rstd = jnp.asarray(rng.uniform(0.5, 2, (128,)), jnp.float32)
    s_dy, s_dyxh, n2 = fused_bn_bwd_reduce(x, dy, mean, rstd, stride=1, interpret=True)
    assert n2 == 49
    xh = (x.reshape(-1, 128) - mean) * rstd
    np.testing.assert_allclose(np.asarray(s_dy), np.asarray(dy.reshape(-1, 128).sum(0)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_dyxh), np.asarray((dy.reshape(-1, 128) * xh).sum(0)), rtol=1e-4
    )

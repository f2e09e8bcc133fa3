"""Whole-stack fused Pallas augmentation (ops/pallas/augment_fused.py) vs the
per-op XLA path: identical parameter sampling => near-identical outputs (blur
border excepted: the kernel edge-pads, the XLA path reflect-pads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from argus_tpu.ops.augment import AugmentationConfig, apply_augmentation


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(5)
    return jnp.asarray(rng.uniform(0, 1, (6, 24, 32, 6)).astype(np.float32))


def _run(cfg, images, key, mesh=None):
    return apply_augmentation(cfg, key, images, n_cams=2, train=True, mesh=mesh)


def test_fused_matches_per_op_interior(images):
    key = jax.random.PRNGKey(9)
    ref = _run(AugmentationConfig(pallas_fused=False, pallas_blur=False), images, key)
    fused = _run(AugmentationConfig(pallas_fused=True), images, key)
    assert fused.shape == ref.shape and fused.dtype == ref.dtype
    # interior: blur padding differences only touch a 2px border
    m = 4
    np.testing.assert_allclose(
        np.asarray(fused[:, m:-m, m:-m]), np.asarray(ref[:, m:-m, m:-m]), atol=2e-2, rtol=0
    )
    # distributions must match tightly, not just pointwise-loosely
    assert abs(float(fused.mean()) - float(ref.mean())) < 5e-3


def test_fused_no_arcs(images):
    key = jax.random.PRNGKey(10)
    cfg_f = AugmentationConfig(pallas_fused=True, num_spaghetti=0)
    cfg_r = AugmentationConfig(pallas_fused=False, pallas_blur=False, num_spaghetti=0)
    fused = _run(cfg_f, images, key)
    ref = _run(cfg_r, images, key)
    m = 4
    np.testing.assert_allclose(
        np.asarray(fused[:, m:-m, m:-m]), np.asarray(ref[:, m:-m, m:-m]), atol=2e-2, rtol=0
    )


def test_fused_falls_back_when_unsupported(images):
    """salt_and_pepper is outside the fused set: the call must still work (per-op
    fallback), not crash or silently skip the transform."""
    key = jax.random.PRNGKey(11)
    cfg = AugmentationConfig(pallas_fused=True, salt_and_pepper=True, pallas_blur=False)
    out = _run(cfg, images, key)
    ref = _run(
        AugmentationConfig(pallas_fused=False, salt_and_pepper=True, pallas_blur=False),
        images,
        key,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_jiggle_plan_all_orders():
    """jiggle_plan factors every one of the 24 sampled orders into (hue_pos,
    affine selectors) and the static-hue-position kernel dispatch reproduces
    the legacy in-kernel lax.switch exactly (same SMEM scalars, same math)."""
    import itertools

    from argus_tpu.ops.pallas.augment_fused import fused_augment, jiggle_plan

    rng = np.random.default_rng(3)
    N, H, W = 2, 16, 128  # lane-width W; tiny rows keep interpret mode fast
    img = jnp.asarray(rng.uniform(0, 1, (N, 3, H, W)).astype(np.float32))
    field = jnp.asarray(rng.uniform(0, 1, (N, 4, 4)).astype(np.float32))
    mh = jnp.asarray(np.zeros((H, 4), np.float32))
    mwt = jnp.asarray(np.zeros((4, W), np.float32))
    # packed row: no arcs; gains(3) | jiggle b,c,s,h(4) | gauss(5) | motion(9)
    # | gates(2) | plasma(2) — only the jiggle slots matter for phases="j"/"S"
    packed = np.zeros((N, 25), np.float32)
    packed[:, 3:7] = rng.uniform(0.6, 1.4, (N, 4)).astype(np.float32)
    packed[:, 6] = rng.uniform(-0.4, 0.4, N).astype(np.float32)  # hue shift
    packed = jnp.asarray(packed)

    for perm in itertools.permutations(range(4)):
        order = jnp.asarray(perm, jnp.int32)
        hue_pos, aff = jiggle_plan(order)
        assert int(hue_pos) == perm.index(3)
        assert [int(v) for v in aff[0]] == [v for v in perm if v != 3]
        run = lambda ph: fused_augment(
            img, field, mh, mwt, packed, order[None], n_arcs=0, interpret=True, phases=ph
        )
        np.testing.assert_allclose(
            np.asarray(run("j")), np.asarray(run("S")), atol=1e-6, err_msg=f"order={perm}"
        )


def test_fused_under_data_sharding(images):
    """The fused kernel must run shard_mapped over a >1-device data axis and
    reproduce the unsharded result exactly (per-image math)."""
    from argus_tpu.parallel import batch_sharding, make_mesh

    key = jax.random.PRNGKey(12)
    cfg = AugmentationConfig(pallas_fused=True)
    ref = _run(cfg, images, key)
    mesh = make_mesh(n_data=2, n_model=1, devices=jax.devices()[:2])
    sharded = jax.device_put(images, batch_sharding(mesh))
    out = jax.jit(lambda im: apply_augmentation(cfg, key, im, n_cams=2, train=True, mesh=mesh))(
        sharded
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

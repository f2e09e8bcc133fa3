"""Pallas fused-blur kernel tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from argus_tpu.ops import augment as A
from argus_tpu.ops.augment import AugmentationConfig, _gaussian_taps, _motion_kernel, apply_augmentation
from argus_tpu.ops.pallas.blur import fused_random_blur, reference_blur


def _params(n, key=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    gw, ggate = _gaussian_taps(k1, n)
    mk, mgate = _motion_kernel(k2, n)
    gates = jnp.stack([ggate, mgate], axis=1)
    return gw, mk, gates


def test_kernel_matches_reference():
    n = 4
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (n, 3, 64, 128))
    gw, mk, gates = _params(n)
    out_k = fused_random_blur(imgs, gw, mk, gates, interpret=True)
    out_ref = reference_blur(imgs, gw, mk, gates)
    assert out_k.shape == imgs.shape
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref), atol=1e-5, rtol=1e-5)


def test_kernel_gates():
    n = 2
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (n, 3, 32, 128))
    gw, mk, _ = _params(n)
    # gates all zero -> identity
    out = fused_random_blur(imgs, gw, mk, jnp.zeros((n, 2)), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-6)
    # gates on -> smoothing reduces variance
    out_on = fused_random_blur(imgs, gw, mk, jnp.ones((n, 2)), interpret=True)
    assert jnp.var(out_on) < jnp.var(imgs)


def test_full_stack_with_pallas_blur():
    cfg = AugmentationConfig(pallas_blur=True)
    images = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 6))
    out = apply_augmentation(cfg, jax.random.PRNGKey(4), images, n_cams=2, train=True)
    assert out.shape == images.shape
    assert jnp.all(jnp.isfinite(out))
    assert jnp.all(out >= 0) and jnp.all(out <= 1)


def test_pallas_path_matches_xla_path_interior():
    """With identical keys, the pallas and XLA stacks draw identical blur params;
    outputs may differ only near borders (edge vs reflect padding)."""
    key = jax.random.PRNGKey(7)
    images = jax.random.uniform(jax.random.PRNGKey(8), (2, 32, 32, 6))
    outs = {}
    for pb in (False, True):
        cfg = A.AugmentationConfig(
            pallas_blur=pb,
            num_spaghetti=0,
            planckian_jitter=False,
            color_jiggle=False,
            plasma_shadow=False,
        )
        outs[pb] = A.apply_augmentation(cfg, key, images, n_cams=2, train=True)
    interior = (slice(None), slice(4, -4), slice(4, -4), slice(None))
    np.testing.assert_allclose(
        np.asarray(outs[True][interior]), np.asarray(outs[False][interior]), atol=1e-5
    )

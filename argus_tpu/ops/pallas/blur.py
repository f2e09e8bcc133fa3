"""Fused gaussian + motion blur as ONE Pallas TPU kernel.

The augmentation stack applies a per-image 5x5 separable gaussian (p=.5) followed by
a per-image 3x3 motion kernel (p=.7) (reference: kornia RandomGaussianBlur +
RandomMotionBlur, argus/data.py:78-81). As XLA ops these are ~19 shifted-add
passes with intermediates materialized between the two transforms; this kernel
keeps one image's channels resident in VMEM, applies both convolutions and both
probability gates in registers, and writes the result once — one HBM read + one
HBM write total.

Layout: (N, 3, H, W) channel-first (W in the lane dimension, see ops/augment.py).
Grid: one program per image; per-image weights ride in SMEM.

Border handling: edge-replication (clamp) padding. kornia uses reflect padding;
for a blur the 2-pixel border difference is visually and statistically negligible,
and clamp padding is expressible as pure concatenation of edge slices (no gather,
no negative-stride slicing — both pitfalls on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_edge(x: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    """Clamp-pad by repeating the first/last slice r times along `axis`.

    Static slicing only (no jnp.take — index constants become captured arrays,
    which pallas_call rejects)."""
    sl_first = [slice(None)] * x.ndim
    sl_first[axis] = slice(0, 1)
    sl_last = [slice(None)] * x.ndim
    sl_last[axis] = slice(x.shape[axis] - 1, x.shape[axis])
    first = [x[tuple(sl_first)]] * r
    last = [x[tuple(sl_last)]] * r
    return jnp.concatenate(first + [x] + last, axis=axis)


def _blur_kernel(img_ref, w_ref, out_ref):
    """One image: (1, 3, H, W) VMEM block. All per-image scalars ride in ONE packed
    SMEM array w: (N, 16) = [gauss taps 0:5 | motion 3x3 row-major 5:14 | gates
    14:16], indexed by program id. (Separate SMEM arrays pad every trailing dim to
    128 lanes — three of them overflow the 1 MB SMEM budget at N~384.)"""
    i = pl.program_id(0)
    x = img_ref[0]  # (3, H, W)
    H, W = x.shape[1], x.shape[2]
    dt = x.dtype

    # SMEM scalars stay f32 (Mosaic has no bf16 scalar ALU); cast at the vector op
    def w(k):
        return w_ref[i, k].astype(dt)

    # ── separable 5-tap gaussian (rows then cols) ──
    xp = _pad_edge(x, 2, axis=1)  # (3, H+4, W)
    g = jnp.zeros_like(x)
    for k in range(5):
        g = g + w(k) * xp[:, k : k + H, :]
    gp = _pad_edge(g, 2, axis=2)  # (3, H, W+4)
    g2 = jnp.zeros_like(x)
    for k in range(5):
        g2 = g2 + w(k) * gp[:, :, k : k + W]
    ggate = w_ref[i, 14]  # f32 scalar
    g2 = ggate.astype(dt) * g2 + (1.0 - ggate).astype(dt) * x

    # ── 3x3 motion kernel on the (possibly) gaussian-blurred image ──
    mp = _pad_edge(_pad_edge(g2, 1, axis=1), 1, axis=2)  # (3, H+2, W+2)
    m = jnp.zeros_like(x)
    for ky in range(3):
        for kx in range(3):
            m = m + w(5 + 3 * ky + kx) * mp[:, ky : ky + H, kx : kx + W]
    mgate = w_ref[i, 15]  # f32 scalar
    out_ref[0] = mgate.astype(dt) * m + (1.0 - mgate).astype(dt) * g2


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_random_blur(
    images: jnp.ndarray,
    gauss_w: jnp.ndarray,
    motion_k: jnp.ndarray,
    gates: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply gated gaussian-then-motion blur per image in one fused pass.

    Args:
        images: (N, 3, H, W) float.
        gauss_w: (N, 5) normalized gaussian taps.
        motion_k: (N, 3, 3) normalized motion kernels.
        gates: (N, 2) in {0,1}: [:, 0] applies the gaussian, [:, 1] the motion blur.
        interpret: run in the Pallas interpreter (CPU testing).
    """
    N, C, H, W = images.shape
    dtype = images.dtype
    # pack all per-image scalars into one SMEM array: (N, 16) f32 ~ N*64 bytes
    packed = jnp.concatenate(
        [
            gauss_w.astype(jnp.float32),
            motion_k.reshape(N, 9).astype(jnp.float32),
            gates.astype(jnp.float32),
        ],
        axis=1,
    )
    return pl.pallas_call(
        _blur_kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, C, H, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # packed per-image scalars (N, 16)
        ],
        out_specs=pl.BlockSpec((1, C, H, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C, H, W), dtype),
        interpret=interpret,
    )(images, packed)


def reference_blur(images, gauss_w, motion_k, gates):
    """Pure-jnp reference of the kernel's math (edge padding), for testing."""
    N, C, H, W = images.shape
    gw = gauss_w.astype(images.dtype)
    mk = motion_k.astype(images.dtype)

    xp = jnp.pad(images, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="edge")
    g = sum(gw[:, k, None, None, None] * xp[:, :, k : k + H, :] for k in range(5))
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (2, 2)), mode="edge")
    g2 = sum(gw[:, k, None, None, None] * gp[:, :, :, k : k + W] for k in range(5))
    ggate = gates[:, 0, None, None, None].astype(images.dtype)
    g2 = ggate * g2 + (1 - ggate) * images

    mp = jnp.pad(g2, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")
    m = sum(
        mk[:, ky, kx, None, None, None] * mp[:, :, ky : ky + H, kx : kx + W]
        for ky in range(3)
        for kx in range(3)
    )
    mgate = gates[:, 1, None, None, None].astype(images.dtype)
    return mgate * m + (1 - mgate) * g2

"""Whole-block fused Pallas kernels for BASIC residual blocks (ResNet-18/34).

The bottleneck-family counterpart is ops/pallas/block_fused.py; this module
gives the 3x3+3x3 BasicBlock — the keypoint family's default backbone
(models/keypoint_net.py, backbone="resnet18") — the same treatment:

    h1  = relu(conv3x3(x) + b1)
    y   = conv3x3(h1) + b2 + x        (identity residual; no relu before add)
    out = relu(y)

as ONE kernel per direction. Both convs run as nine shifted MXU matmuls over
a zero-padded copy (block_fused._conv3x3_shifted). Saved-residual backward
(reads x, g, out, and the fwd-saved h1; one pass):

    m2  = g * (out > 0)
    dw2[ky,kx] += shift(h1)^T @ m2        dh1 = conv2^T(m2)
    m1  = dh1 * (h1 > 0)
    dw1[ky,kx] += shift(x)^T @ m1         dx  = conv1^T(m1) + m2

Weight-grad accumulators live in f32 VMEM scratch across the sequential image
grid. Identity (stride-1, cin == cout) blocks only; frozen affine required
(the BN affines fold into effective weights/biases, `fold_basic_params`).

Reference architecture: torchvision BasicBlock (the reference's resnet18
option, argus/models.py:43); XLA-path equivalence pinned in
tests/test_basic_fused.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from argus_tpu.ops.pallas.block_fused import (
    _conv3x3_shifted,
    _interp,
    _relu_mask_mul,
    _use_pallas,
)

_VMEM_LIMIT = 110 * 1024 * 1024


# ───────────────────────────────── forward ─────────────────────────────────


def _fwd_math(x4, w1, b1, w2, b2, G, H, W, C):
    x = x4.reshape(G * H * W, C)
    h1, _ = _conv3x3_shifted(x, w1, G, H, W, C)
    h1 = jnp.maximum(h1 + b1.astype(jnp.float32), 0.0).astype(x.dtype)
    y, _ = _conv3x3_shifted(h1, w2, G, H, W, C)
    y = y + b2.astype(jnp.float32) + x.astype(jnp.float32)
    out = jnp.maximum(y, 0.0).astype(x.dtype).reshape(G, H, W, C)
    return out, h1


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, G, H, W, C):
    out, _ = _fwd_math(x_ref[...], w1_ref, b1_ref[...], w2_ref, b2_ref[...], G, H, W, C)
    out_ref[...] = out


def _fwd_save_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, h1_ref, *, G, H, W, C):
    out, h1 = _fwd_math(x_ref[...], w1_ref, b1_ref[...], w2_ref, b2_ref[...], G, H, W, C)
    out_ref[...] = out
    h1_ref[...] = h1.reshape(G, H, W, C)


def _specs(G, H, W, C, save):
    in_specs = [
        pl.BlockSpec((G, H, W, C), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((3, 3, C, C), lambda i: (0, 0, 0, 0)),
        pl.BlockSpec((1, C), lambda i: (0, 0)),
        pl.BlockSpec((3, 3, C, C), lambda i: (0, 0, 0, 0)),
        pl.BlockSpec((1, C), lambda i: (0, 0)),
    ]
    out_specs = [pl.BlockSpec((G, H, W, C), lambda i: (i, 0, 0, 0))]
    if save:
        out_specs.append(pl.BlockSpec((G, H, W, C), lambda i: (i, 0, 0, 0)))
    return in_specs, out_specs


def _fwd_pallas(x, w1, b1, w2, b2, interpret, G, save):
    N, H, W, C = x.shape
    kern = _fwd_save_kernel if save else _fwd_kernel
    kernel = functools.partial(kern, G=G, H=H, W=W, C=C)
    in_specs, out_specs = _specs(G, H, W, C, save)
    out_shape = [jax.ShapeDtypeStruct((N, H, W, C), x.dtype)]
    if save:
        out_shape.append(jax.ShapeDtypeStruct((N, H, W, C), x.dtype))
    outs = pl.pallas_call(
        kernel,
        grid=(N // G,),
        in_specs=in_specs,
        out_specs=out_specs if save else out_specs[0],
        out_shape=out_shape if save else out_shape[0],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, w1, b1, w2, b2)
    return outs


# ───────────────────────────────── backward ─────────────────────────────────


def _bwd_kernel(
    x_ref, g_ref, out_ref, h1_ref, w1_ref, w2_ref,
    dx_ref, dw1_ref, dw2_ref, a1_ref, a2_ref, *, G, H, W, C,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        a1_ref[:] = jnp.zeros_like(a1_ref)
        a2_ref[:] = jnp.zeros_like(a2_ref)

    dt = x_ref.dtype
    R = G * H * W
    x = x_ref[...].reshape(R, C)
    h1 = h1_ref[...].reshape(R, C)
    g = g_ref[...].reshape(R, C)
    m2 = _relu_mask_mul(g, out_ref[...].reshape(R, C))

    h1_padded = jnp.pad(h1.reshape(G, H, W, C), ((0, 0), (1, 1), (1, 1), (0, 0)))
    m2_padded = jnp.pad(m2.reshape(G, H, W, C), ((0, 0), (1, 1), (1, 1), (0, 0)))
    dh1 = jnp.zeros((R, C), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            h1_shift = h1_padded[:, ky : ky + H, kx : kx + W].reshape(R, C)
            a2_ref[ky, kx] += jax.lax.dot_general(
                h1_shift, m2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            m2_shift = m2_padded[:, 2 - ky : 2 - ky + H, 2 - kx : 2 - kx + W].reshape(R, C)
            dh1 = dh1 + jax.lax.dot_general(
                m2_shift, w2_ref[ky, kx], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    m1 = _relu_mask_mul(dh1.astype(dt), h1)
    x_padded = jnp.pad(x.reshape(G, H, W, C), ((0, 0), (1, 1), (1, 1), (0, 0)))
    m1_padded = jnp.pad(m1.reshape(G, H, W, C), ((0, 0), (1, 1), (1, 1), (0, 0)))
    dx = jnp.zeros((R, C), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            x_shift = x_padded[:, ky : ky + H, kx : kx + W].reshape(R, C)
            a1_ref[ky, kx] += jax.lax.dot_general(
                x_shift, m1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            m1_shift = m1_padded[:, 2 - ky : 2 - ky + H, 2 - kx : 2 - kx + W].reshape(R, C)
            dx = dx + jax.lax.dot_general(
                m1_shift, w1_ref[ky, kx], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    dx_ref[...] = (dx + m2.astype(jnp.float32)).astype(dt).reshape(G, H, W, C)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw1_ref[...] = a1_ref[...]
        dw2_ref[...] = a2_ref[...]


def _bwd_pallas(x, g, out, h1, w1, w2, interpret, G):
    N, H, W, C = x.shape
    kernel = functools.partial(_bwd_kernel, G=G, H=H, W=W, C=C)
    img = lambda: pl.BlockSpec((G, H, W, C), lambda i: (i, 0, 0, 0))
    wsp = lambda: pl.BlockSpec((3, 3, C, C), lambda i: (0, 0, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(N // G,),
        in_specs=[img(), img(), img(), img(), wsp(), wsp()],
        out_specs=[img(), wsp(), wsp()],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W, C), x.dtype),
            jax.ShapeDtypeStruct((3, 3, C, C), jnp.float32),
            jax.ShapeDtypeStruct((3, 3, C, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, 3, C, C), jnp.float32),
            pltpu.VMEM((3, 3, C, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, g, out, h1, w1, w2)


# ─────────────────────────── XLA fallback (reference math) ───────────────────────────


def _xla_forward(x, w1, b1, w2, b2):
    h1 = jax.lax.conv_general_dilated(
        x, w1, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    h1 = jnp.maximum(h1.astype(jnp.float32) + b1.astype(jnp.float32), 0.0).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        h1, w2, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y = y.astype(jnp.float32) + b2.astype(jnp.float32) + x.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(x.dtype)


# ─────────────────────────── public op (custom VJP) ───────────────────────────


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _basic_block(x, w1, b1, w2, b2, impl, interpret, gsz):
    if _use_pallas(impl):
        return _fwd_pallas(x, w1, b1, w2, b2, _interp(interpret), gsz, save=False)
    return _xla_forward(x, w1, b1, w2, b2)


def _basic_block_fwd(x, w1, b1, w2, b2, impl, interpret, gsz):
    if _use_pallas(impl):
        out, h1 = _fwd_pallas(x, w1, b1, w2, b2, _interp(interpret), gsz, save=True)
        return out, (x, w1, b1, w2, b2, out, h1)
    out = _xla_forward(x, w1, b1, w2, b2)
    return out, (x, w1, b1, w2, b2, out, None)


def _basic_block_bwd(impl, interpret, gsz, resids, g):
    x, w1, b1, w2, b2, out, h1 = resids
    zb = lambda b: jnp.zeros_like(b)
    if _use_pallas(impl):
        dx, dw1, dw2 = _bwd_pallas(x, g, out, h1, w1, w2, _interp(interpret), gsz)
        return dx, dw1.astype(w1.dtype), zb(b1), dw2.astype(w2.dtype), zb(b2)
    _, vjp = jax.vjp(lambda xv, w1v, w2v: _xla_forward(xv, w1v, b1, w2v, b2), x, w1, w2)
    dx, dw1, dw2 = vjp(g)
    return dx, dw1, zb(b1), dw2, zb(b2)


_basic_block.defvjp(_basic_block_fwd, _basic_block_bwd)


def fold_basic_params(dtype, k1, s1, bi1, m1, v1, k2, s2, bi2, m2, v2, *, eps=1e-5):
    """Fold the two frozen BN affines into effective conv weights/biases:
    (w1 (3,3,C,C), b1 (1,C), w2, b2)."""
    C = k1.shape[-1]

    def fold(k, s, b, m, v):
        c = s * jax.lax.rsqrt(v + eps)
        return (k.astype(jnp.float32) * c).astype(dtype), (b - m * c).reshape(1, C)

    w1, b1 = fold(k1, s1, bi1, m1, v1)
    w2, b2 = fold(k2, s2, bi2, m2, v2)
    return w1, b1, w2, b2


def fused_basic_block(
    x: jnp.ndarray,
    k1, s1, bi1, m1, v1,  # conv1 (3,3,C,C) + frozen BN buffers (C,)
    k2, s2, bi2, m2, v2,
    *,
    eps: float = 1e-5,
    impl: str = "auto",
    interpret: Optional[bool] = None,
    g: int = 1,
) -> jnp.ndarray:
    """Fused stride-1 identity BasicBlock under frozen affine."""
    w1, b1, w2, b2 = fold_basic_params(
        x.dtype, k1, s1, bi1, m1, v1, k2, s2, bi2, m2, v2, eps=eps
    )
    return _basic_block(x, w1, b1, w2, b2, impl, interpret, g)

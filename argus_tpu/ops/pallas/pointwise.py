"""Fused pointwise (1x1) convolution + frozen-BN affine + ReLU (+ residual) for
TPU, with a single-pass combined backward.

Why this exists. With full FrozenBatchNorm2d semantics (bn_frozen_affine — the
flagship fine-tune mode) the train step is HBM-bandwidth-bound and every
remaining millisecond is a standalone elementwise pass over stage-sized
activations (outputs/traces/step_frozenaff):

  * forward: XLA materializes each 1x1-conv output, then runs a separate
    affine(+relu, +mask-pack) fusion over it (~8 ms/step total);
  * backward: the relu mask multiply (`compare_select_fusion`, 16.5 ms/step) and
    the residual gradient accumulation (`add_add_fusion`, 10 ms/step) are
    standalone passes because the conv custom-calls that consume/produce their
    tensors cannot fuse elementwise — and the masked gradient is materialized
    once and then re-read by BOTH the dgrad and wgrad convolutions.

A 1x1 convolution is a matmul over the channel axis, so both directions can be
Pallas matmul kernels with the elementwise work living in the epilogue/prologue:

  forward:  out = relu(x @ w_eff + b_eff [+ residual])     one read of x,
            one write of out — the affine is pre-folded into (w_eff, b_eff)
            since ALL BN parameters are frozen constants in this mode:
                c     = scale / sqrt(var + eps)
                w_eff = w * c,   b_eff = bias - mean * c
  backward: one pass over (g, out, x):
                m  = g * (out > 0)          (relu mask, in VMEM)
                dx = m @ w_eff^T            (dgrad matmul)
                dw += x^T @ m               (wgrad, f32 VMEM accumulator across
                                             the sequential TPU grid)
            instead of XLA's mask-pass + dgrad-read + wgrad-read of a
            materialized m. With a residual input, m is additionally emitted as
            the residual cotangent (XLA pays that write too).

The affine fold means this path REQUIRES frozen affine (scale/bias are buffers;
their cotangents are zero) — `pointwise_conv_frozen_bn` asserts nothing about
it, but models must only enable it under bn_frozen + bn_frozen_affine
(models/resnet.py plumbs `fuse_pointwise`).

Reference behavior being accelerated: the 1x1 convs inside torchvision
bottleneck blocks used by the reference's ResNet-50 backbone
(argus/models.py:43); numerics match the unfused XLA path to bf16 tolerance
(tests/test_pointwise.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile_m(m: int, cin: int, cout: int, itemsize: int, n_bufs: int) -> int:
    """Largest row-tile dividing `m` whose double-buffered VMEM footprint stays
    under ~8 MB, given `n_bufs` (M, C)-shaped buffers live per step. Prefers
    multiples of 8 (sublane-aligned); when no such divisor exists (m = N*H*W
    with an odd factor, e.g. 7x7 stage maps at 224x224 inputs) it falls back to
    the largest small divisor — partially-padded blocks are correct, just less
    efficient. Exact divisibility means no masking is needed in the kernels."""
    budget = 8 * 1024 * 1024
    per_row = n_bufs * max(cin, cout) * itemsize * 2  # x2: pallas double-buffers
    tm = min(m, 2048, max(budget // max(per_row, 1), 8))
    tm = max(8, (tm // 8) * 8)
    while tm >= 8 and m % tm != 0:
        tm -= 8
    if tm < 8:  # no multiple-of-8 divisor
        tm = next(t for t in (7, 6, 5, 4, 3, 2, 1) if m % t == 0)
    return tm


# ───────────────────────────────── forward ─────────────────────────────────


def _fwd_kernel(x_ref, w_ref, b_ref, out_ref, *, relu: bool):
    z = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    z = z + b_ref[:].astype(jnp.float32)
    if relu:
        z = jnp.maximum(z, 0.0)
    out_ref[:] = z.astype(out_ref.dtype)


def _fwd_res_kernel(x_ref, w_ref, b_ref, r_ref, out_ref, *, relu: bool):
    z = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    z = z + b_ref[:].astype(jnp.float32) + r_ref[:].astype(jnp.float32)
    if relu:
        z = jnp.maximum(z, 0.0)
    out_ref[:] = z.astype(out_ref.dtype)


def _pw_fwd_pallas(x2, w_eff, b_eff, res2, relu: bool, interpret: bool):
    """x2: (M, Cin), w_eff: (Cin, Cout), b_eff: (1, Cout), res2: (M, Cout)|None."""
    M, Cin = x2.shape
    Cout = w_eff.shape[1]
    tm = _pick_tile_m(M, Cin, Cout, x2.dtype.itemsize, n_bufs=3 if res2 is None else 4)
    grid = (M // tm,)
    in_specs = [
        pl.BlockSpec((tm, Cin), lambda i: (i, 0)),
        pl.BlockSpec((Cin, Cout), lambda i: (0, 0)),
        pl.BlockSpec((1, Cout), lambda i: (0, 0)),
    ]
    args = [x2, w_eff, b_eff]
    if res2 is None:
        kernel = functools.partial(_fwd_kernel, relu=relu)
    else:
        kernel = functools.partial(_fwd_res_kernel, relu=relu)
        in_specs.append(pl.BlockSpec((tm, Cout), lambda i: (i, 0)))
        args.append(res2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, Cout), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, Cout), x2.dtype),
        interpret=interpret,
    )(*args)


# ───────────────────────────────── backward ─────────────────────────────────


def _bwd_kernel(g_ref, out_ref, x_ref, w_ref, dx_ref, dw_ref, m_ref, acc_ref, *, relu: bool, emit_m: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = g_ref[:]
    if relu:
        # Mosaic on v5e has no bf16 vector compare — compare in f32 and apply the
        # mask multiplicatively (no bool-vector select either; see CLAUDE.md).
        mask = (out_ref[:].astype(jnp.float32) > 0.0).astype(jnp.float32)
        m = (g.astype(jnp.float32) * mask).astype(g.dtype)
    else:
        m = g
    if emit_m:
        m_ref[:] = m
    # dgrad: (TM, Cout) x (Cin, Cout)^T -> (TM, Cin)
    dx_ref[:] = jax.lax.dot_general(
        m, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)
    # wgrad accumulate: (TM, Cin)^T x (TM, Cout) -> (Cin, Cout), f32
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], m, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[:] = acc_ref[:]


def _pw_bwd_pallas(g2, out2, x2, w_eff, relu: bool, emit_m: bool, interpret: bool):
    """Single-pass combined backward. Returns (dx2, dw_eff_f32, m2|None)."""
    M, Cout = g2.shape
    Cin = x2.shape[1]
    tm = _pick_tile_m(M, Cin, Cout, x2.dtype.itemsize, n_bufs=5 if emit_m else 4)
    grid = (M // tm,)
    kernel = functools.partial(_bwd_kernel, relu=relu, emit_m=emit_m)
    out_shapes = [
        jax.ShapeDtypeStruct((M, Cin), x2.dtype),
        jax.ShapeDtypeStruct((Cin, Cout), jnp.float32),
        jax.ShapeDtypeStruct((M, Cout) if emit_m else (1, Cout), g2.dtype),
    ]
    out_specs = [
        pl.BlockSpec((tm, Cin), lambda i: (i, 0)),
        pl.BlockSpec((Cin, Cout), lambda i: (0, 0)),
        pl.BlockSpec((tm, Cout), lambda i: (i, 0))
        if emit_m
        else pl.BlockSpec((1, Cout), lambda i: (0, 0)),
    ]
    dx, dw, m = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, Cout), lambda i: (i, 0)),
            pl.BlockSpec((tm, Cout), lambda i: (i, 0)),
            pl.BlockSpec((tm, Cin), lambda i: (i, 0)),
            pl.BlockSpec((Cin, Cout), lambda i: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((Cin, Cout), jnp.float32)],
        interpret=interpret,
    )(g2, out2, x2, w_eff)
    return dx, dw, (m if emit_m else None)


# ─────────────────────────── public op (custom VJP) ───────────────────────────


def _use_pallas(impl: str) -> bool:
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    return jax.default_backend() == "tpu"


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _pw_nores(x2, w_eff, b_eff, relu: bool, impl: str, interpret: Optional[bool]):
    if _use_pallas(impl):
        itp = _interpret_default() if interpret is None else interpret
        return _pw_fwd_pallas(x2, w_eff, b_eff, None, relu, itp)
    z = jnp.dot(x2, w_eff, preferred_element_type=jnp.float32) + b_eff.astype(jnp.float32)
    if relu:
        z = jnp.maximum(z, 0.0)
    return z.astype(x2.dtype)


def _pw_nores_fwd(x2, w_eff, b_eff, relu, impl, interpret):
    out = _pw_nores(x2, w_eff, b_eff, relu, impl, interpret)
    return out, (x2, w_eff, out)


def _pw_nores_bwd(relu, impl, interpret, resids, g):
    x2, w_eff, out = resids
    if _use_pallas(impl):
        itp = _interpret_default() if interpret is None else interpret
        dx, dw, _ = _pw_bwd_pallas(g, out, x2, w_eff, relu, False, itp)
    else:
        m = jnp.where(out > 0, g, jnp.zeros_like(g)) if relu else g
        dx = jax.lax.dot_general(
            m, w_eff, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x2.dtype)
        dw = jax.lax.dot_general(
            x2, m, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    return dx, dw.astype(w_eff.dtype), jnp.zeros((1, w_eff.shape[1]), jnp.float32)


_pw_nores.defvjp(_pw_nores_fwd, _pw_nores_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _pw_res(x2, w_eff, b_eff, res2, relu: bool, impl: str, interpret: Optional[bool]):
    if _use_pallas(impl):
        itp = _interpret_default() if interpret is None else interpret
        return _pw_fwd_pallas(x2, w_eff, b_eff, res2, relu, itp)
    z = (
        jnp.dot(x2, w_eff, preferred_element_type=jnp.float32)
        + b_eff.astype(jnp.float32)
        + res2.astype(jnp.float32)
    )
    if relu:
        z = jnp.maximum(z, 0.0)
    return z.astype(x2.dtype)


def _pw_res_fwd(x2, w_eff, b_eff, res2, relu, impl, interpret):
    out = _pw_res(x2, w_eff, b_eff, res2, relu, impl, interpret)
    return out, (x2, w_eff, out)


def _pw_res_bwd(relu, impl, interpret, resids, g):
    x2, w_eff, out = resids
    if _use_pallas(impl):
        itp = _interpret_default() if interpret is None else interpret
        dx, dw, m = _pw_bwd_pallas(g, out, x2, w_eff, relu, True, itp)
    else:
        m = jnp.where(out > 0, g, jnp.zeros_like(g)) if relu else g
        dx = jax.lax.dot_general(
            m, w_eff, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x2.dtype)
        dw = jax.lax.dot_general(
            x2, m, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    return dx, dw.astype(w_eff.dtype), jnp.zeros((1, w_eff.shape[1]), jnp.float32), m


_pw_res.defvjp(_pw_res_fwd, _pw_res_bwd)


def pointwise_conv_frozen_bn(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    *,
    eps: float = 1e-5,
    relu: bool = True,
    residual: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """relu((conv1x1(x, kernel) normalized by frozen BN) [+ residual]).

    x: (N, H, W, Cin); kernel: (1, 1, Cin, Cout) (flax nn.Conv layout);
    scale/bias/mean/var: (Cout,) f32 frozen-BN buffers (stop-gradiented by the
    caller; their cotangents here are zero). residual: (N, H, W, Cout) or None.

    The affine fold happens in f32 before the cast to the compute dtype, so the
    folded weights are at least as precise as the unfused conv->affine chain.
    Gradients flow to x, kernel, and residual (kernel's via autodiff through the
    fold: dL/dw = dL/dw_eff * c).
    """
    N, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    c = scale * jax.lax.rsqrt(var + eps)  # (Cout,) f32, frozen
    w_eff = (kernel.reshape(Cin, Cout).astype(jnp.float32) * c).astype(x.dtype)
    b_eff = (bias - mean * c).reshape(1, Cout)  # stays f32; kernels add in f32

    x2 = x.reshape(N * H * W, Cin)
    if residual is None:
        out2 = _pw_nores(x2, w_eff, b_eff, relu, impl, interpret)
    else:
        out2 = _pw_res(x2, w_eff, b_eff, residual.reshape(N * H * W, Cout), relu, impl, interpret)
    return out2.reshape(N, H, W, Cout)

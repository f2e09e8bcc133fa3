"""TPU-first BatchNorm: drop-in flax `nn.BatchNorm` replacement with an HBM-lean
training mode.

Why this exists: the train-step profile (CLAUDE.md) shows 49% of the step burned in
`convert_reduce_fusion` — BatchNorm statistics and BN-backward reductions re-reading
every conv activation from HBM. XLA cannot fuse those reductions into the TPU conv
custom-calls, so the only lever is to READ FEWER BYTES — without breaking the
gradient. Two independent knobs, both defaulting to exact flax/torch semantics:

  * `stats_stride` > 1 — train-time batch statistics from a 1/s row subsample.
    Subsampling is BLOCK-granular (contiguous row blocks via reshape+slice, or the
    Pallas kernels' grid index map), never element-strided: measured on v5e, an XLA
    `x[:, ::4]` reduce runs at ~130 GB/s while contiguous-block reads run at
    400-600 GB/s (.bench/bench_reduce.py) — naive striding made the step SLOWER.
    At the flagship shapes (backbone batch 256) a stride-4 estimate still averages
    ~2x more samples per channel than the reference's full batch-32 statistics
    (argus/train.py:64), so the estimator is *stronger* than the reference's.
  * `grad_stride` > 1 — a custom VJP computes the backward pass with the EXACT
    BatchNorm gradient formula
        dx = rstd*g*(dy - mean(dy) - xhat*mean(dy*xhat)),  dgamma = sum(dy*xhat),
        dbeta = sum(dy)
    but estimates all four batch moments from the same kind of block subsample
    (unbiased: means over the subsample; sums scaled by the kept-row ratio). The
    batch-coupling signal the gradient carries is preserved — a naive
    stop-gradient through mean/var drops it and measurably slows convergence (see
    test_norm.py's toy, where the signal lives exactly in the batch statistics) —
    while the backward reduction pass reads (x, dy) at 1/s the bytes. At stride 1
    the formula is bit-for-bit the autodiff gradient.

`impl` selects the reduction engine: "xla" (reshape+slice+reduce, GSPMD-friendly —
partitions over a sharded batch axis with an XLA-inserted psum), "pallas" (fused
sum/sumsq and (sum dy, sum dy*xhat) kernels, ops/pallas/bn_reduce.py), or "auto"
(pallas on TPU, xla elsewhere — interpret-mode Pallas is too slow for CPU tests).

Eval mode (`use_running_average=True`) is always exact and identical to flax.
Variable tree matches `nn.BatchNorm` exactly (params: scale/bias; batch_stats:
mean/var) and the class is *named* BatchNorm so flax auto-naming keeps checkpoint
and torchvision-import compatibility (models/torch_import.py:14).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _block_subsample(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Keep 1 of every `stride` CONTIGUOUS row-blocks along H of (N, H, W, C).

    Contiguity is the point: the kept blocks are whole-DMA reads, unlike an
    element-strided slice (see module docstring). Falls back to no subsampling
    when H doesn't factor."""
    if stride <= 1 or x.ndim != 4:
        return x
    N, H, W, C = x.shape
    for bs in (8, 4, 2, 1):
        if H % (bs * stride) == 0:
            xb = x.reshape(N, H // (bs * stride), stride, bs, W, C)[:, :, 0]
            return xb.reshape(N, H // stride, W, C)
    return x


def _reduce_moments(x, dy, mean, rstd, stride: int, impl: str, interpret: bool):
    """(sum dy, sum dy*xhat, rows_counted, total_rows) with 1/stride subsampling."""
    C = x.shape[-1]
    total = x.size // C
    if impl == "pallas":
        from argus_tpu.ops.pallas.bn_reduce import fused_bn_bwd_reduce

        s_dy, s_dyxh, n = fused_bn_bwd_reduce(x, dy, mean, rstd, stride=stride, interpret=interpret)
        return s_dy, s_dyxh, n, total
    xs = _block_subsample(x, stride)
    dys = _block_subsample(dy, stride)
    red = tuple(range(x.ndim - 1))
    dys32 = dys.astype(jnp.float32)
    xhat32 = (xs.astype(jnp.float32) - mean) * rstd
    s_dy = jnp.sum(dys32, red)
    s_dyxh = jnp.sum(dys32 * xhat32, red)
    return s_dy, s_dyxh, xs.size // C, total


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _bn_apply_subgrad(x, mean, rstd, scale, bias, grad_stride: int, impl: str, interpret: bool):
    """y = (x - mean) * rstd * scale + bias, with a custom backward that applies
    the exact BatchNorm gradient formula using batch moments estimated from a
    block subsample. Forward math is bit-identical to the plain expression.
    mean/rstd are treated as given constants (their own estimation path carries no
    gradient); the batch-coupling terms of dx are retained via the estimates."""
    dt = x.dtype
    return ((x - mean.astype(dt)) * rstd.astype(dt)) * scale.astype(dt) + bias.astype(dt)


def _bn_apply_fwd(x, mean, rstd, scale, bias, grad_stride: int, impl: str, interpret: bool):
    y = _bn_apply_subgrad(x, mean, rstd, scale, bias, grad_stride, impl, interpret)
    return y, (x, mean, rstd, scale, bias)


def _bn_apply_bwd(grad_stride: int, impl: str, interpret: bool, res, dy):
    x, mean, rstd, scale, bias = res
    dt = x.dtype
    sum_dy, sum_dy_xhat, n_sub, _total = _reduce_moments(
        x, dy, mean, rstd, grad_stride, impl, interpret
    )
    # dgamma/dbeta: unbiased estimates of the full sums (scaled by kept ratio)
    ratio = _total / n_sub
    dgamma = sum_dy_xhat * ratio
    dbeta = sum_dy * ratio
    # dx: exact BN gradient with the batch means replaced by subsample means
    m_dy = (sum_dy / n_sub).astype(dt)
    m_dy_xhat = (sum_dy_xhat / n_sub).astype(dt)
    xhat = (x - mean.astype(dt)) * rstd.astype(dt)
    dx = (rstd.astype(dt) * scale.astype(dt)) * (dy - m_dy - xhat * m_dy_xhat)
    return (
        dx,
        jnp.zeros_like(mean),
        jnp.zeros_like(rstd),
        dgamma.astype(scale.dtype),
        dbeta.astype(bias.dtype),
    )


_bn_apply_subgrad.defvjp(_bn_apply_fwd, _bn_apply_bwd)


class BatchNorm(nn.Module):
    """Flax-compatible BatchNorm over all axes but the last (NHWC feature axis).

    stats_stride/grad_stride == 1 with impl="xla" reproduces `nn.BatchNorm`
    semantics (gradients flow through the batch statistics); otherwise the custom
    HBM-lean training mode documented in the module docstring is used.
    `use_running_average=True` (eval) is always the exact running-stats path.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Any] = None
    scale_init: Callable = nn.initializers.ones_init()
    bias_init: Callable = nn.initializers.zeros_init()
    stats_stride: int = 1
    grad_stride: int = 1
    impl: str = "xla"  # "xla" | "pallas" | "auto"
    # Freeze scale/bias too (full torchvision FrozenBatchNorm2d semantics: all four
    # of weight/bias/mean/var are non-trainable buffers). Only meaningful together
    # with use_running_average=True (the frozen-stats path). Beyond parity this is
    # a large measured perf lever: with trainable affine the backward must compute
    # dgamma=sum(dy*xhat)/dbeta=sum(dy), which re-reads every conv activation from
    # HBM (36 ms of the 120 ms flagship step, outputs/traces/step_frozen); with the
    # affine frozen those reductions are dead code and dx is a pure elementwise
    # scale that fuses into the conv backward.
    frozen_affine: bool = False

    def _impl(self) -> str:
        if self.impl == "auto":
            return "pallas" if jax.default_backend() == "tpu" else "xla"
        return self.impl

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        dt = self.dtype or x.dtype
        scale = self.param("scale", self.scale_init, (C,), jnp.float32)
        bias = self.param("bias", self.bias_init, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (C,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones, None, (C,), jnp.float32)

        x = x.astype(dt)
        red = tuple(range(x.ndim - 1))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
            rstd = jax.lax.rsqrt(var + self.epsilon)
            if self.frozen_affine:
                scale = jax.lax.stop_gradient(scale)
                bias = jax.lax.stop_gradient(bias)
            return ((x - mean.astype(dt)) * rstd.astype(dt)) * scale.astype(dt) + bias.astype(dt)

        impl = self._impl()
        interpret = jax.default_backend() == "cpu"
        custom_path = self.stats_stride > 1 or self.grad_stride > 1 or impl == "pallas"

        if impl == "pallas":
            from argus_tpu.ops.pallas.bn_reduce import fused_stats

            # stop_gradient BEFORE the kernel: the custom path treats stats as
            # constants anyway, and pallas_call has no JVP rule to trace through
            s, q, n = fused_stats(
                jax.lax.stop_gradient(x), stride=self.stats_stride, interpret=interpret
            )
            mean = s / n
            var = jnp.maximum(q / n - jnp.square(mean), 0.0)
        else:
            xs = _block_subsample(x, self.stats_stride) if custom_path else x
            xs32 = xs.astype(jnp.float32)
            mean = jnp.mean(xs32, red)
            # fast-variance form (E[x^2] - E[x]^2), same as flax use_fast_variance
            var = jnp.maximum(jnp.mean(jnp.square(xs32), red) - jnp.square(mean), 0.0)

        if not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1.0 - self.momentum) * var

        rstd = jax.lax.rsqrt(var + self.epsilon)
        if custom_path:
            mean = jax.lax.stop_gradient(mean)
            rstd = jax.lax.stop_gradient(rstd)
            return _bn_apply_subgrad(x, mean, rstd, scale, bias, self.grad_stride, impl, interpret)
        return ((x - mean.astype(dt)) * rstd.astype(dt)) * scale.astype(dt) + bias.astype(dt)

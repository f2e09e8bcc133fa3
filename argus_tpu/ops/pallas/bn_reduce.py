"""Pallas BatchNorm reduction kernels: fused sum/sum-of-squares statistics and the
backward (sum dy, sum dy*xhat) pass, with block-granular subsampling.

Why: the flagship train step burns ~49% of its time in XLA `convert_reduce_fusion`
kernels re-reading conv activations for BN statistics and BN-backward reductions
(CLAUDE.md profile). Measured on v5e (.bench/bench_reduce.py):

  * XLA's full sum+sumsq reduce runs at ~415 GB/s (half of HBM peak);
  * XLA's STRIDED reduce (`x[:, ::4]`) collapses to ~130 GB/s — strided reads
    break DMA efficiency, so subsampling via slicing made the step SLOWER.

These kernels fix both: one fused pass emits all reductions with double-buffered
whole-block DMA, and subsampling happens in the GRID INDEX MAP — the kernel simply
never visits 3 of every 4 row-blocks, so the skipped bytes are never read and the
read blocks stream at full DMA width. Input layout: activations viewed as (M, C)
rows (a free reshape of NHWC when W is a multiple of the sublane tile).

Channels < 128 lanes are folded pairwise into the lane axis ((M, 64) is bitcast to
(M/2, 128)) so no lane is padded; callers un-fold the (f*C,) output by summing the
f groups.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_factor(C: int) -> int:
    """Lane-fold factor: view (M, C) as (M/f, f*C) so f*C >= 128 (no lane padding)."""
    f = 1
    while C * f < 128:
        f *= 2
    return f


def _block_rows(M: int, Cf: int, stride: int) -> int:
    """Rows per block: ~1 MB bf16 blocks (double-buffered DMA), a power of two that
    divides M/stride's block count."""
    target = max(8, (1 << 20) // (Cf * 2))
    m_t = 8
    while m_t * 2 <= target and (M % (m_t * 2 * stride)) == 0 and (M // (m_t * 2 * stride)) >= 1:
        m_t *= 2
    return m_t


def _stats_kernel(x_ref, sum_ref, sq_ref, acc_ref):
    i = pl.program_id(0)
    blk = x_ref[...].astype(jnp.float32)  # (m_t, Cf)
    s = jnp.sum(blk, axis=0, keepdims=True)
    q = jnp.sum(blk * blk, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        acc_ref[0:1] = s
        acc_ref[1:2] = q

    @pl.when(i > 0)
    def _acc():
        acc_ref[0:1] += s
        acc_ref[1:2] += q

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        sum_ref[...] = acc_ref[0:1]
        sq_ref[...] = acc_ref[1:2]


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def fused_stats(x: jnp.ndarray, stride: int = 1, interpret: bool = False):
    """Fused per-channel (sum, sum_sq) over all leading axes of x (..., C), in f32.

    stride > 1 subsamples at ROW-BLOCK granularity via the grid index map: the
    kernel visits every `stride`-th ~1 MB block, so subsampled bytes are never
    read from HBM (full DMA efficiency — unlike an XLA strided slice). Returns
    (sum, sum_sq, n_rows_visited); estimates are over the visited rows.
    """
    C = x.shape[-1]
    M = x.size // C
    f = _fold_factor(C)
    Cf = C * f
    xm = x.reshape(M // f, Cf)
    m_t = _block_rows(M // f, Cf, stride)
    n_blocks = (M // f) // m_t
    grid = max(1, n_blocks // stride)

    # stride==1 promises EXACT statistics (norm.py contract); if the block size
    # doesn't tile M exactly the grid would silently drop trailing rows — use a
    # plain XLA reduction instead (subsampled strides tolerate block granularity
    # by construction: estimates are over the visited rows, which we report).
    if stride == 1 and n_blocks * m_t != M // f:
        x32 = x.reshape(M, C).astype(jnp.float32)
        return jnp.sum(x32, 0), jnp.sum(jnp.square(x32), 0), M

    out_shape = [
        jax.ShapeDtypeStruct((1, Cf), jnp.float32),
        jax.ShapeDtypeStruct((1, Cf), jnp.float32),
    ]
    s, q = pl.pallas_call(
        _stats_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((m_t, Cf), lambda i: (i * stride, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, Cf), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cf), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2, Cf), jnp.float32)],
        interpret=interpret,
    )(xm)
    # un-fold the lane groups: (1, f*C) -> (f, C) -> (C,)
    s = s.reshape(f, C).sum(0)
    q = q.reshape(f, C).sum(0)
    n_rows = grid * m_t * f
    return s, q, n_rows


def _bwd_kernel(x_ref, dy_ref, mr_ref, sum_dy_ref, sum_dyxh_ref, acc_ref):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    mean = mr_ref[0:1]  # (1, Cf)
    rstd = mr_ref[1:2]
    xhat = (x - mean) * rstd
    s_dy = jnp.sum(dy, axis=0, keepdims=True)
    s_dyxh = jnp.sum(dy * xhat, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        acc_ref[0:1] = s_dy
        acc_ref[1:2] = s_dyxh

    @pl.when(i > 0)
    def _acc():
        acc_ref[0:1] += s_dy
        acc_ref[1:2] += s_dyxh

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        sum_dy_ref[...] = acc_ref[0:1]
        sum_dyxh_ref[...] = acc_ref[1:2]


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def fused_bn_bwd_reduce(
    x: jnp.ndarray,
    dy: jnp.ndarray,
    mean: jnp.ndarray,
    rstd: jnp.ndarray,
    stride: int = 1,
    interpret: bool = False,
):
    """Fused per-channel (sum dy, sum dy*xhat) where xhat=(x-mean)*rstd, in f32.

    One pass over (x, dy) instead of XLA's separate reduce fusions; same
    block-granular subsampling as `fused_stats`. Returns (sum_dy, sum_dy_xhat,
    n_rows_visited)."""
    C = x.shape[-1]
    M = x.size // C
    f = _fold_factor(C)
    Cf = C * f
    xm = x.reshape(M // f, Cf)
    dym = dy.reshape(M // f, Cf)
    # fold mean/rstd to match the lane grouping: (C,) -> (f*C,) by tiling
    mr = jnp.stack([jnp.tile(mean.astype(jnp.float32), f), jnp.tile(rstd.astype(jnp.float32), f)])
    m_t = _block_rows(M // f, Cf, stride)
    n_blocks = (M // f) // m_t
    grid = max(1, n_blocks // stride)

    # same exactness guard as fused_stats: stride==1 must not drop trailing rows
    if stride == 1 and n_blocks * m_t != M // f:
        x32 = x.reshape(M, C).astype(jnp.float32)
        dy32 = dy.reshape(M, C).astype(jnp.float32)
        xhat = (x32 - mean.astype(jnp.float32)) * rstd.astype(jnp.float32)
        return jnp.sum(dy32, 0), jnp.sum(dy32 * xhat, 0), M

    out_shape = [
        jax.ShapeDtypeStruct((1, Cf), jnp.float32),
        jax.ShapeDtypeStruct((1, Cf), jnp.float32),
    ]
    s_dy, s_dyxh = pl.pallas_call(
        _bwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((m_t, Cf), lambda i: (i * stride, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_t, Cf), lambda i: (i * stride, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Cf), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Cf), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cf), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2, Cf), jnp.float32)],
        interpret=interpret,
    )(xm, dym, mr)
    s_dy = s_dy.reshape(f, C).sum(0)
    s_dyxh = s_dyxh.reshape(f, C).sum(0)
    n_rows = grid * m_t * f
    return s_dy, s_dyxh, n_rows

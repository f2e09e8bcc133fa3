"""Fused Pallas STEM kernel: conv7x7/s2 + frozen-BN affine + relu + maxpool3x3/s2.

The last XLA conv in the fused backbone chain. Measured cost of the XLA stem
region in the otherwise-fused step: ~27 ms of 100 (17 ms of conv/pool fusions +
10 ms of pure layout-copy passes at the conv custom-call boundaries,
outputs/traces/step_fusev2) — for ~2% of the model FLOPs. This kernel removes
the convs AND the boundary copies.

TPU formulation (the 7x7-over-3-channels conv is MXU-hostile as-is: K = 3):

  * The caller feeds a 4x4 space-to-depth view of the image: (N, 64, 64, 48).
    A stride-2 7x7 conv becomes, for each output-pixel PARITY (p, q) of the
    2x2 output pixels per s2d block, a 3x3 conv over s2d blocks — nine
    (rows, 48) @ (48, 256) MXU matmuls where the 256 output channels pack
    (parity_y, parity_x, c): K grows 3 -> 48 and COUT 64 -> 256.
  * Weight packing (`pack_stem_weights`): zero-pad the 7x7 kernel to 8x8 with
    the pad row/col FIRST (window offsets become [-4, 3], reproducing torch's
    (3,3) padding exactly — same trick as models/resnet.py
    conv1_kernel_to_s2d), then one advanced-indexing gather builds the
    (9, 48, 256) packed weights. The gather is plain jnp, so autodiff maps the
    kernel's dW straight back to the (7,7,3,64) conv_init parameter.
  * The frozen-BN affine folds into the packed weights/bias (scale tiled over
    the 4 parities).
  * Maxpool 3x3/s2/pad-1 runs IN-KERNEL on the parity-packed conv output:
    conv row 2u-1 is packed row (u-1, p=1), 2u is (u, 0), 2u+1 is (u, 1) — so
    the pool is a 9-way elementwise max over shifted lane-slices. Zero padding
    is exact here: relu output is >= 0, so pad cells never win a max that
    -inf padding (torch semantics) would have lost.
  * Backward: the image needs NO gradient (it is data), so the backward is
    wgrad-only — read the fwd-saved parity-packed conv+relu output yg (saving
    it beat recomputing the conv in-kernel: 9.5 -> ~6 ms at flagship shapes,
    the same trade block_fused's saved-residual backward won), route the pool
    cotangent through first-match take-masks (select-and-scatter tie
    semantics), mask by relu, and accumulate dW = tap^T @ dacc in f32 scratch
    across the sequential grid.

Reference being fused: the torchvision ResNet stem (argus/models.py:43
backbone); flax path in models/resnet.py (conv_init + norm_init + relu +
max_pool). Equivalence vs that path is pinned in tests/test_stem_fused.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from argus_tpu.ops.pallas.block_fused import _interp, _use_pallas

_VMEM_LIMIT = 110 * 1024 * 1024

# s2d block offsets of the 3x3 block-conv (row-major)
_OFFS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]
# pool terms in XLA select-and-scatter tie order (window rows 2u-1, 2u, 2u+1):
# (block shift dA, parity p) = (-1, 1), (0, 0), (0, 1); same for columns
_POOL_TERMS = [(-1, 1), (0, 0), (0, 1)]


def pack_stem_weights(k7, scale, bias, mean, var, eps, dtype):
    """(7,7,3,64) conv kernel + frozen-BN buffers -> packed (9,48,256) weights
    (dtype) and (1,256) f32 bias. Differentiable w.r.t. k7.

    W[t, r, o] = K[4*dy + sy - 2*p + 8, 4*dx + sx - 2*q + 8, ci, c] with t
    indexing _OFFS, r = (sy*4 + sx)*3 + ci (space_to_depth channel order),
    o = (p*2 + q)*64 + c, and K the 7x7 kernel zero-padded pad-row-FIRST to
    8x8 (window offsets [-4, 3] = torch (3,3) padding) then by 4 on every
    side (out-of-window taps land in the zero margin). Built from 36 STATIC
    4x4 slices + concats — an advanced-indexing gather here measured
    1.40 ms/step inside the train program (tiny-table gathers are ~1000x
    slower than layout ops on TPU; trace outputs/traces/step_stem2)."""
    c = scale * jax.lax.rsqrt(var + eps)  # (64,)
    beff = bias - mean * c
    k8 = jnp.pad(k7.astype(jnp.float32), ((1, 0), (1, 0), (0, 0), (0, 0)))
    K = jnp.pad(k8, ((4, 4), (4, 4), (0, 0), (0, 0)))  # (16, 16, 3, 64)
    rows = []
    for dy, dx in _OFFS:
        parity_blocks = []
        for p in (0, 1):
            for q in (0, 1):
                s, u = 4 * dy - 2 * p + 8, 4 * dx - 2 * q + 8
                blk = K[s : s + 4, u : u + 4]  # (4, 4, 3, 64): (sy, sx, ci, c)
                parity_blocks.append(blk.reshape(48, 64))
        rows.append(jnp.concatenate(parity_blocks, axis=-1))  # (48, 256)
    W = jnp.stack(rows)  # (9, 48, 256)
    c_packed = jnp.tile(c, 4)  # (256,) parity-major
    W = (W * c_packed[None, None, :]).astype(dtype)
    b_packed = jnp.tile(beff, 4)[None].astype(jnp.float32)  # (1, 256)
    return W, b_packed


def _conv_packed(x4p, w, G, HS, WS):
    """x4p: (G, HS+2, WS+2, 48) zero-padded s2d input; w: (9, 48, 256).
    Returns the parity-packed conv as f32 (G*HS*WS, 256).

    im2col formulation: lane-concatenate the 9 shifted taps into (R, 432) and
    run ONE K=432 matmul. Nine separate K=48 matmuls leave 80 of the MXU's 128
    K-rows idle; measured 5.75 -> 3.55 ms isolated at flagship stem geometry
    (1.62x, .bench/bench_im2col.py). The wgrad keeps the per-tap form — the
    batched-taps wgrad measured SLOWER there (0.89x)."""
    R = G * HS * WS
    cat = jnp.concatenate(
        [
            x4p[:, 1 + dy : 1 + dy + HS, 1 + dx : 1 + dx + WS, :].reshape(R, 48)
            for dy, dx in _OFFS
        ],
        axis=-1,
    )  # (R, 9*48) — tap-major, matching w.reshape(432, 256) row order
    return jnp.dot(cat, w.reshape(9 * 48, 256), preferred_element_type=jnp.float32)


def _pool_terms(yg_p, HS, WS):
    """yg_p: (G, HS+1, WS+1, 256) start-padded relu output. Yields the 9 pool
    terms ((G, HS, WS, 64) slice, dA, p, dB, q) in tie order."""
    for dA, p in _POOL_TERMS:
        for dB, q in _POOL_TERMS:
            o = (p * 2 + q) * 64
            yield (
                yg_p[:, 1 + dA : 1 + dA + HS, 1 + dB : 1 + dB + WS, o : o + 64],
                dA, p, dB, q,
            )


def _forward_math(x4, w, b, G, HS, WS):
    """Shared fwd math on a (G, HS, WS, 48) block: returns (pool, yg, x4p)."""
    x4p = jnp.pad(x4, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = _conv_packed(x4p, w, G, HS, WS)
    y = jnp.maximum(acc + b, 0.0).astype(x4.dtype)
    yg = y.reshape(G, HS, WS, 256)
    yg_p = jnp.pad(yg, ((0, 0), (1, 0), (1, 0), (0, 0)))
    pool = None
    for term, *_ in _pool_terms(yg_p, HS, WS):
        pool = term if pool is None else jnp.maximum(pool, term)
    return pool, yg, x4p


def _forward_math_packed(x4, w, b, G, HS, WS):
    """No-save forward with PAIR-PACKED pool output (G, HS, WS/2, 128):
    out[..., j, r*64+c] = pool[..., 2j+r, c]. Feeds the packed frozen stage-0
    chain (stage_fused._chain_fwd_packed) directly, so neither the stem's
    64-lane output tiles (half-empty (8,128) HBM tiles) nor the consumer-side
    relayout exist. The stride-2 column selection rides the merged-lane parity
    view (_stride2_tap's accepted idiom: yg has 256 lanes, merged 512); the
    only lane-size-changing op is ONE explicit 64||64 concat on the result."""
    x4p = jnp.pad(x4, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = _conv_packed(x4p, w, G, HS, WS)
    y = jnp.maximum(acc + b, 0.0).astype(x4.dtype)
    yg = y.reshape(G, HS, WS, 256)
    # pad W by (1, 1): start-pad for the pool window, end-pad so the W dim is
    # even for the parity view (the end column is only read by the s=2 taps,
    # whose window covers col WS-1 = real data; the pad col itself is never a
    # window member for any in-range output)
    ygp = jnp.pad(yg, ((0, 0), (1, 0), (1, 1), (0, 0)))
    v = ygp.reshape(G, HS + 1, (WS + 2) // 2, 512)
    pools = []
    for r in (0, 1):
        pool = None
        for dA, p in _POOL_TERMS:
            for dB, q in _POOL_TERMS:
                o = (p * 2 + q) * 64
                m, qq = divmod(1 + r + dB, 2)
                t = v[
                    :, 1 + dA : 1 + dA + HS, m : m + WS // 2,
                    qq * 256 + o : qq * 256 + o + 64,
                ]
                pool = t if pool is None else jnp.maximum(pool, t)
        pools.append(pool)
    return jnp.concatenate(pools, axis=-1)  # (G, HS, WS/2, 128)


def _stem_fwd_kernel(x4_ref, w_ref, b_ref, out_ref, *, G, HS, WS):
    pool, _, _ = _forward_math(x4_ref[...], w_ref[...], b_ref[...], G, HS, WS)
    out_ref[...] = pool


def _stem_fwd_packed_kernel(x4_ref, w_ref, b_ref, out_ref, *, G, HS, WS):
    out_ref[...] = _forward_math_packed(
        x4_ref[...], w_ref[...], b_ref[...], G, HS, WS
    )


def _stem_fwd_save_kernel(x4_ref, w_ref, b_ref, out_ref, yg_ref, *, G, HS, WS):
    """Training forward: also materializes the parity-packed conv+relu output
    yg so the backward skips the conv recompute (same trade as block_fused's
    saved-residuals backward, which beat its recompute variant on-chip)."""
    pool, yg, _ = _forward_math(x4_ref[...], w_ref[...], b_ref[...], G, HS, WS)
    out_ref[...] = pool
    yg_ref[...] = yg


def _stem_bwd_kernel(x4_ref, g_ref, out_ref, yg_ref, dw_ref, a_ref, *, G, HS, WS):
    """Wgrad-only backward from SAVED activations: no conv recompute — reads
    the fwd-saved yg (parity-packed conv+relu) and the pool output, routes the
    pool cotangent through first-match take-masks, masks by relu, accumulates
    dW in f32 scratch across the sequential grid."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)

    x4p = jnp.pad(x4_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    yg = yg_ref[...]
    yg_p = jnp.pad(yg, ((0, 0), (1, 0), (1, 0), (0, 0)))
    g = g_ref[...].astype(jnp.float32)  # (G, HS, WS, 64)
    pool_f = out_ref[...].astype(jnp.float32)

    # pool backward: first-match take masks, scattered into parity slices
    taken = jnp.zeros((G, HS, WS, 64), jnp.float32)
    dsl = {(p, q): jnp.zeros((G, HS, WS, 64), jnp.float32) for p in (0, 1) for q in (0, 1)}
    for term, dA, p, dB, q in _pool_terms(yg_p, HS, WS):
        take = (term.astype(jnp.float32) == pool_f).astype(jnp.float32) * (1.0 - taken)
        taken = taken + take
        contrib = g * take
        # packed coords [A, B] = [u + dA, v + dB]; dA, dB in {-1, 0} -> shift
        # by (-dA, -dB), zero-filling the far edge (A = -1 hits the pool pad)
        if dA == -1:
            contrib = jnp.pad(contrib[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
        if dB == -1:
            contrib = jnp.pad(contrib[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
        dsl[(p, q)] = dsl[(p, q)] + contrib

    R = G * HS * WS
    dpacked = jnp.concatenate(
        [dsl[(0, 0)], dsl[(0, 1)], dsl[(1, 0)], dsl[(1, 1)]], axis=-1
    ).reshape(R, 256)  # o = (p*2+q)*64 + c ordering
    # relu mask (f32 compare; pre > 0 <=> relu output > 0)
    mask = (yg.reshape(R, 256).astype(jnp.float32) > 0.0).astype(jnp.float32)
    dacc = (dpacked * mask).astype(x4_ref.dtype)
    for t, (dy, dx) in enumerate(_OFFS):
        tap = x4p[:, 1 + dy : 1 + dy + HS, 1 + dx : 1 + dx + WS, :].reshape(R, 48)
        a_ref[t] += jax.lax.dot_general(
            tap, dacc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = a_ref[...]


def _stem_fwd_pallas(x4, w, b, interpret: bool, G: int = 1):
    N, HS, WS, _ = x4.shape
    kernel = functools.partial(_stem_fwd_kernel, G=G, HS=HS, WS=WS)
    return pl.pallas_call(
        kernel,
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G, HS, WS, 48), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, 48, 256), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 256), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((G, HS, WS, 64), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, HS, WS, 64), x4.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x4, w, b)


def _stem_fwd_packed_pallas(x4, w, b, interpret: bool, G: int = 1):
    N, HS, WS, _ = x4.shape
    kernel = functools.partial(_stem_fwd_packed_kernel, G=G, HS=HS, WS=WS)
    return pl.pallas_call(
        kernel,
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G, HS, WS, 48), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, 48, 256), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 256), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((G, HS, WS // 2, 128), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, HS, WS // 2, 128), x4.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x4, w, b)


def _stem_fwd_save_pallas(x4, w, b, interpret: bool, G: int = 1):
    N, HS, WS, _ = x4.shape
    kernel = functools.partial(_stem_fwd_save_kernel, G=G, HS=HS, WS=WS)
    return pl.pallas_call(
        kernel,
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G, HS, WS, 48), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((9, 48, 256), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 256), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G, HS, WS, 64), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((G, HS, WS, 256), lambda i: (i, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, HS, WS, 64), x4.dtype),
            jax.ShapeDtypeStruct((N, HS, WS, 256), x4.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x4, w, b)


def _stem_bwd_pallas(x4, g, out, yg, interpret: bool, G: int = 1, n_images=None):
    """`n_images`: only the first n_images of the batch contribute (the
    subsampled-wgrad path) — implemented by SHRINKING THE GRID, not slicing
    the operands: a [::k] (or even [:n]) batch slice of these batch-minor
    layouts lowers to a while-loop of dynamic-slices that cost more than the
    saved matmuls (trace outputs/traces/step_grad4: 1.5 ms `while` + 1.25 ms
    dynamic-slice fusions). The kernel only DMAs blocks the grid touches."""
    N, HS, WS, _ = x4.shape
    n = N if n_images is None else n_images
    kernel = functools.partial(_stem_bwd_kernel, G=G, HS=HS, WS=WS)
    return pl.pallas_call(
        kernel,
        grid=(n // G,),
        in_specs=[
            pl.BlockSpec((G, HS, WS, 48), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((G, HS, WS, 64), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((G, HS, WS, 64), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((G, HS, WS, 256), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((9, 48, 256), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((9, 48, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((9, 48, 256), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x4, g, out, yg)


# ─────────────────────────── XLA fallback (reference math) ───────────────────────────


def _xla_stem_pool(x4, w, b):
    """Same math in plain jnp at full batch (CPU path / autodiff reference)."""
    N, HS, WS, _ = x4.shape
    pool, _, _ = _forward_math(x4, w, b, N, HS, WS)
    return pool


# ─────────────────────────── public op (custom VJP) ───────────────────────────


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _stem_pool(x4, w, b, impl, interpret, gsz=1, grad_stride=1, packed_out=False):
    if _use_pallas(impl):
        if packed_out:
            return _stem_fwd_packed_pallas(x4, w, b, _interp(interpret), gsz)
        return _stem_fwd_pallas(x4, w, b, _interp(interpret), gsz)
    out = _xla_stem_pool(x4, w, b)
    if packed_out:
        n, hs, ws, c = out.shape
        out = out.reshape(n, hs, ws // 2, 2 * c)  # linear-order identity
    return out


def _stem_pool_fwd(x4, w, b, impl, interpret, gsz=1, grad_stride=1, packed_out=False):
    # packed_out is frozen-stem-only (the caller gates on frozen_stages >= 1,
    # which stop-gradients every input) — a differentiated packed stem would
    # need a packed-cotangent backward that does not exist
    assert not packed_out, "packed_out stem is forward-only (frozen stem)"
    if _use_pallas(impl):
        # save yg (conv+relu, parity-packed) so the backward skips the conv
        # recompute; the no-save forward stays the primal for eval/inference
        out, yg = _stem_fwd_save_pallas(x4, w, b, _interp(interpret), gsz)
        return out, (x4, out, yg, w, b)
    return _xla_stem_pool(x4, w, b), (x4, None, None, w, b)


def _stem_pool_bwd(impl, interpret, gsz, grad_stride, packed_out, resids, g):
    """Subsampled stem weight-grad (grad_stride > 1): compute dW on the FIRST
    N/grad_stride images of the batch and scale — the stem backward is ~70%
    maxpool-cotangent ROUTING for <2.5% of model FLOPs
    (.bench/bench_stem_bwd.py), and a contiguous-prefix subsample of a
    SHUFFLED batch is as unbiased as any other (same design as ops/norm.py
    bn_grad_stride). Implemented grid-side in the Pallas path — operand
    slicing measured slower than the saved matmuls (see _stem_bwd_pallas)."""
    x4, out, yg, w, b = resids
    n = x4.shape[0] // grad_stride
    if _use_pallas(impl):
        dw = _stem_bwd_pallas(
            x4, g, out, yg, _interp(interpret), gsz,
            n_images=None if grad_stride == 1 else n,
        )
    else:
        if grad_stride > 1:
            x4c, gc = x4[:n], g[:n]
        else:
            x4c, gc = x4, g
        # autodiff of the fallback, discarding the (unneeded) image gradient
        _, vjp = jax.vjp(lambda wv: _xla_stem_pool(x4c, wv, b), w)
        (dw,) = vjp(gc)
    if grad_stride > 1:
        dw = dw * float(grad_stride)
    # the image is data (no gradient consumer); the bias is a frozen buffer
    return jnp.zeros_like(x4), dw.astype(w.dtype), jnp.zeros_like(b)


_stem_pool.defvjp(_stem_pool_fwd, _stem_pool_bwd)


def fused_stem_pool(
    x: jnp.ndarray,
    k7: jnp.ndarray,  # (7, 7, 3, 64) conv_init kernel
    scale, bias, mean, var,  # frozen norm_init buffers, each (64,)
    *,
    eps: float = 1e-5,
    impl: str = "auto",
    interpret: Optional[bool] = None,
    gsz: int = 1,
    grad_stride: int = 1,
    packed_out: bool = False,
) -> jnp.ndarray:
    """Full fused stem: NHWC image (N, H, W, 3) -> (N, H/4, W/4, 64), or the
    PAIR-PACKED (N, H/4, W/8, 128) view of the same values when `packed_out`
    (column pairs in lanes — the layout the packed frozen stage-0 chain
    consumes; frozen-stem/forward-only).

    Space-to-depth happens here in XLA. On TPU it rides a one-hot stride-4
    conv (space_to_depth_conv): the reshape/transpose formulation with C=3 in
    the lane dim measured 14 ms at flagship shapes vs <1 ms for the conv form
    (trace outputs/traces/step_stem1)."""
    from argus_tpu.models.resnet import space_to_depth, space_to_depth_conv

    n, h, w_, c = x.shape
    assert h % 8 == 0 and w_ % 8 == 0 and c == 3 and k7.shape == (7, 7, 3, 64), (
        x.shape, k7.shape,
    )
    s2d = space_to_depth_conv if jax.default_backend() == "tpu" else space_to_depth
    x4 = s2d(x, 4)  # (N, H/4, W/4, 48)
    W, b = pack_stem_weights(k7, scale, bias, mean, var, eps, x.dtype)
    # the subsample must divide the batch (shape-init batches are tiny);
    # fall back to the exact wgrad otherwise — shapes are static, so this
    # resolves at trace time
    if x4.shape[0] % (max(grad_stride, 1) * gsz) != 0:
        grad_stride = 1
    return _stem_pool(x4, W, b, impl, interpret, gsz, grad_stride, packed_out)

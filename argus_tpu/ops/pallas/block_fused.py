"""Whole-bottleneck-block fused Pallas kernels (frozen-BN fine-tune mode).

The per-site pointwise kernels (ops/pallas/pointwise.py) lost to XLA because
every Pallas/XLA-conv boundary pays a layout-copy pass. Fusing the ENTIRE
stride-1 bottleneck block — conv1x1 -> bn -> relu -> conv3x3 -> bn -> relu ->
conv1x1 -> bn -> +identity -> relu — into one kernel removes the interior
boundaries: one image per grid step, all interiors VMEM-resident, the 3x3 as
nine shifted MXU matmuls over a zero-padded copy. Measured forward head-to-head
at stage-0 geometry (N=256, 64x64x256): 4.65 ms fused vs 6.71 ms XLA (1.44x,
.bench/bench_blockfwd.py) — the decision experiment for this design.

Backward is ONE kernel pass per block with in-VMEM recompute (remat without the
HBM tax): read (x, g, out), recompute h1/h2 from x, then
    m3  = g * (out > 0)
    dh2 = m3 @ w3^T               dw3 += h2^T @ m3
    m2  = dh2 * (h2 > 0)
    dh1 = conv2^T(m2)             dw2[ky,kx] += shift(h1)^T @ m2
    m1  = dh1 * (h1 > 0)
    dx  = m1 @ w1^T + m3          dw1 += x^T @ m1      (identity residual)
writing dx once — where XLA materializes and re-reads every mask/gradient
tensor between conv custom-calls. Weight-grad accumulators live in VMEM f32
scratch across the sequential grid.

Applies to stride-1 identity-residual blocks only (12 of ResNet-50's 16);
stride-2/projection blocks stay on the XLA path. Requires frozen affine
(bn_frozen + bn_frozen_affine): the BN affines are folded into (w_eff, b_eff)
as in pointwise.py. Mosaic constraints: f32 compare only, no bool-vector
select — masks are computed as f32 0/1 factors.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 110 * 1024 * 1024


def _relu_mask_mul(v, ref_vals):
    """v * (ref_vals > 0) with f32 compare (no bf16 vector compare on v5e)."""
    mask = (ref_vals.astype(jnp.float32) > 0.0).astype(jnp.float32)
    return (v.astype(jnp.float32) * mask).astype(v.dtype)


# ───────────────────────────────── forward ─────────────────────────────────


def _conv3x3_shifted(h1, w2_ref, G, H, W, F):
    """3x3 'SAME' conv of (G*H*W, F) rows as nine shifted MXU matmuls over a
    per-image zero-padded copy; f32 accumulator. G images share the grid step so
    deep stages (stage 3: 8x8 = 64 rows/image) still fill the MXU (VERDICT r2 #1)."""
    padded = jnp.pad(h1.reshape(G, H, W, F), ((0, 0), (1, 1), (1, 1), (0, 0)))
    h2 = jnp.zeros((G * H * W, F), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            shifted = padded[:, ky : ky + H, kx : kx + W].reshape(G * H * W, F)
            h2 = h2 + jnp.dot(shifted, w2_ref[ky, kx], preferred_element_type=jnp.float32)
    return h2, padded


# ─────────────────────── pair-packed conv2 (F < 128) ───────────────────────
#
# At stage-0 geometry (F = 64) the shifted form issues K=64/N=64 matmuls that
# the v5e MXU runs at ~17-19 TF/s — the 128x128 array is 3/4 idle. Packing two
# adjacent COLUMNS into one row of 2F = 128 channels makes every conv2 matmul
# (rows/2, 128) @ (128, 128): 2x the raw FLOPs (half the packed weight blocks
# are structural zeros) at ~6x the issue rate — measured 4.69 -> 2.13 ms
# isolated at stage-0 conv2 geometry (.bench/bench_mxu_inkernel.py). Mosaic
# rejects the lane-merging (R,64)->(R/2,128) shape cast, so the repack is a
# sublane-split reshape + lane concat, and the parity crossover between the
# two packed columns lives entirely in the (2F, 2F) weight blocks.
#
# Layout: packed[h, j, q*F + c] = orig[h, 2j + q, c].  A 3x3 conv becomes a
# 3x3 conv over packed blocks with W2p[ky, b][(q,ci), (p,co)] = w2[ky, dx]
# where dx = 2b + q - p when |dx| <= 1, else zero: for output parity p and
# original tap dx, the source column 2j+p+dx lands in packed block j+b,
# parity q, with b = floor((p+dx)/2), q = (p+dx) mod 2 — unique per (p, dx).
# Edge blocks are exact: out-of-range original columns are covered either by
# the packed zero padding (one block per side) or by a structural zero weight.


_PACK_IMPL = os.environ.get("ARGUS_PACK2_IMPL", "reshape")


def _pack_pair_rows(v, C):
    """(R, C) rows in W-fastest order -> (R//2, 2C): adjacent column pairs
    side by side in lanes. W must be even so pairs never straddle rows.

    Default form: the row-major layout identity (R, C) == (R/2, 2, C) ==
    (R/2, 2C) as a rank-keeping reshape chain — Mosaic accepts merged lane
    views up to 1024 lanes when a spatial dim is kept (the same identity
    proj_fused's stride-2 taps ride); the direct 2D (R, C) -> (R/2, 2C)
    shape cast is rejected. ARGUS_PACK2_IMPL=concat selects the explicit
    slice+lane-concat fallback."""
    R = v.shape[0]
    a = v.reshape(R // 2, 2, C)
    if _PACK_IMPL == "reshape":
        return a.reshape(R // 2, 2 * C)
    return jnp.concatenate([a[:, 0, :], a[:, 1, :]], axis=-1)


def _unpack_pair_rows(vp, C):
    """Inverse of _pack_pair_rows: (R//2, 2C) -> (R, C)."""
    Rh = vp.shape[0]
    if _PACK_IMPL == "reshape":
        return vp.reshape(Rh, 2, C).reshape(2 * Rh, C)
    a = jnp.stack([vp[:, :C], vp[:, C:]], axis=1)  # (R//2, 2, C)
    return a.reshape(2 * Rh, C)


def pack_w2_pairs(w2):
    """(3, 3, F, F) conv kernel -> (9, 2F, 2F) pair-packed weights, tap index
    t = 3*ky + b with block-column offset b-1. Plain jnp (static slices and
    concats), differentiable; runs OUTSIDE the kernels."""
    F = w2.shape[-1]
    zeros = jnp.zeros((F, F), w2.dtype)
    taps = []
    for ky in range(3):
        for b in (-1, 0, 1):
            blocks = [[zeros, zeros], [zeros, zeros]]  # [q][p]
            for q in (0, 1):
                for p in (0, 1):
                    dx = 2 * b + q - p
                    if -1 <= dx <= 1:
                        blocks[q][p] = w2[ky, dx + 1]
            taps.append(
                jnp.concatenate(
                    [
                        jnp.concatenate([blocks[0][0], blocks[0][1]], axis=1),
                        jnp.concatenate([blocks[1][0], blocks[1][1]], axis=1),
                    ],
                    axis=0,
                )
            )
    return jnp.stack(taps)  # (9, 2F, 2F)


def unpack_dw2_pairs(dW2p, F):
    """Route a pair-packed weight-grad (9, 2F, 2F) back to (3, 3, F, F): the
    transpose of pack_w2_pairs — each original tap's grad is the sum of the
    two packed blocks (p = 0, 1) that carried it."""
    rows = []
    for ky in range(3):
        row = []
        for dxi in range(3):
            acc = None
            for b in (-1, 0, 1):
                for q in (0, 1):
                    for p in (0, 1):
                        if 2 * b + q - p == dxi - 1:
                            blk = dW2p[3 * ky + b + 1, q * F : (q + 1) * F, p * F : (p + 1) * F]
                            acc = blk if acc is None else acc + blk
            row.append(acc)
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def _conv3x3_packed(h1p, w2p_ref, G, H, Wp, F2):
    """3x3 conv in pair-packed space: (G*H*Wp, F2=2F) rows, w2p (9, 2F, 2F).
    Returns f32 (G*H*Wp, F2)."""
    padded = jnp.pad(h1p.reshape(G, H, Wp, F2), ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((G * H * Wp, F2), jnp.float32)
    for ky in range(3):
        for b in range(3):
            tap = padded[:, ky : ky + H, b : b + Wp].reshape(G * H * Wp, F2)
            acc = acc + jnp.dot(tap, w2p_ref[3 * ky + b], preferred_element_type=jnp.float32)
    return acc, padded


def _flip_transpose_w2(w2):
    """w2'[ky, kx] = w2[2-ky, 2-kx]^T — the kernel whose forward conv equals
    conv2's input-gradient (transposed conv)."""
    return w2[::-1, ::-1].transpose(0, 1, 3, 2)


def _pair_packed(F, W):
    """Packed conv2 applies where the native F underfills the MXU and columns
    pair cleanly.

    DEFAULT OFF (negative result, docs/ROUND3_NOTES.md): the packed form wins
    2.2x in an isolated probe with a pre-packed HBM layout, but Mosaic only
    lane-regroups WHOLE 128-lane tiles — every in-kernel route from 64-lane
    h1 to the 128-lane packed form (2D/4D/5D reshape, stack, interleave) is
    rejected with 'unsupported shape cast' (.bench/probe_reshapes*.py,
    probe_pack5.py, probe_unpack.py; the accepted proj_fused stride-2 views
    all have F >= 128), except an explicit lane concat whose shuffle cost and
    full-tile-only unpack erase the win. The math stays (exercised in
    interpret-mode tests); ARGUS_PACK2=1 re-enables for experiments."""
    return os.environ.get("ARGUS_PACK2", "0") == "1" and F < 128 and W % 2 == 0


def _conv2_relu(h1, w2_ref, b2_ref, G, H, W, F, packed):
    """conv2 + bias + relu, dispatching between the shifted and pair-packed
    forms; returns (R, F) in h1's dtype."""
    dt = h1.dtype
    if packed:
        h1p = _pack_pair_rows(h1, F)
        h2p, _ = _conv3x3_packed(h1p, w2_ref, G, H, W // 2, 2 * F)
        b2p = jnp.concatenate([b2_ref[...], b2_ref[...]], axis=-1).astype(jnp.float32)
        h2p = jnp.maximum(h2p + b2p, 0.0).astype(dt)
        return _unpack_pair_rows(h2p, F)
    h2, _ = _conv3x3_shifted(h1, w2_ref, G, H, W, F)
    return jnp.maximum(h2 + b2_ref[...].astype(jnp.float32), 0.0).astype(dt)


def _conv2_grads(h1, m2, w2_ref, a2_ref, G, H, W, F, packed):
    """conv2's weight-grad (accumulated into a2_ref) and input-grad (returned,
    f32 (R, F)). In packed mode w2_ref holds the PAIR-PACKED FLIP-TRANSPOSED
    weights (9, 2F, 2F) — the input-grad is then a plain packed conv — and
    a2_ref accumulates the packed weight-grad (9, 2F, 2F), routed back to
    (3, 3, F, F) by unpack_dw2_pairs outside the kernel."""
    R = G * H * W
    if packed:
        Wp, F2 = W // 2, 2 * F
        h1p = _pack_pair_rows(h1, F)
        m2p = _pack_pair_rows(m2, F)
        dh1p, _ = _conv3x3_packed(m2p, w2_ref, G, H, Wp, F2)
        h1pp = jnp.pad(h1p.reshape(G, H, Wp, F2), ((0, 0), (1, 1), (1, 1), (0, 0)))
        for ky in range(3):
            for b in range(3):
                tap = h1pp[:, ky : ky + H, b : b + Wp].reshape(R // 2, F2)
                a2_ref[3 * ky + b] += jax.lax.dot_general(
                    tap, m2p, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
        return _unpack_pair_rows(dh1p, F)
    padded = jnp.pad(h1.reshape(G, H, W, F), ((0, 0), (1, 1), (1, 1), (0, 0)))
    m2_padded = jnp.pad(m2.reshape(G, H, W, F), ((0, 0), (1, 1), (1, 1), (0, 0)))
    dh1 = jnp.zeros((R, F), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            h1_shift = padded[:, ky : ky + H, kx : kx + W].reshape(R, F)
            a2_ref[ky, kx] += jax.lax.dot_general(
                h1_shift, m2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            m2_shift = m2_padded[:, 2 - ky : 2 - ky + H, 2 - kx : 2 - kx + W].reshape(R, F)
            dh1 = dh1 + jax.lax.dot_general(
                m2_shift, w2_ref[ky, kx], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return dh1


def _fwd_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref,
    *, G, H, W, CIN, F, packed=False,
):
    COUT = CIN
    x = x_ref[...].reshape(G * H * W, CIN)
    h1 = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[...].astype(jnp.float32), 0.0).astype(x.dtype)
    h2 = _conv2_relu(h1, w2_ref, b2_ref, G, H, W, F, packed)
    y = jnp.dot(h2, w3_ref[...], preferred_element_type=jnp.float32)
    y = y + b3_ref[...].astype(jnp.float32) + x.astype(jnp.float32)  # identity residual
    out_ref[...] = jnp.maximum(y, 0.0).astype(x.dtype).reshape(G, H, W, COUT)


def _w2_operand(w2, F, W):
    """(w2 operand, its BlockSpec, packed flag) for the forward kernels."""
    if _pair_packed(F, W):
        return pack_w2_pairs(w2), pl.BlockSpec((9, 2 * F, 2 * F), lambda i: (0, 0, 0)), True
    return w2, pl.BlockSpec((3, 3, F, F), lambda i: (0, 0, 0, 0)), False


def _block_fwd_pallas(x, w1, b1, w2, b2, w3, b3, interpret: bool, g: int = 1):
    N, H, W, CIN = x.shape
    F = w1.shape[1]
    G = g
    assert N % G == 0, (N, G)
    w2op, w2spec, packed = _w2_operand(w2, F, W)
    kernel = functools.partial(_fwd_kernel, G=G, H=H, W=W, CIN=CIN, F=F, packed=packed)
    return pl.pallas_call(
        kernel,
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G, H, W, CIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((CIN, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            w2spec,
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((F, CIN), lambda i: (0, 0)),
            pl.BlockSpec((1, CIN), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((G, H, W, CIN), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, CIN), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, w1, b1, w2op, b2, w3, b3)


# ────────────────────── forward with saved residuals ──────────────────────


def _fwd_save_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref, h1_ref, h2_ref,
    *, G, H, W, CIN, F, packed=False,
):
    x = x_ref[...].reshape(G * H * W, CIN)
    h1 = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[...].astype(jnp.float32), 0.0).astype(x.dtype)
    h1_ref[...] = h1.reshape(G, H, W, F)
    h2 = _conv2_relu(h1, w2_ref, b2_ref, G, H, W, F, packed)
    h2_ref[...] = h2.reshape(G, H, W, F)
    y = jnp.dot(h2, w3_ref[...], preferred_element_type=jnp.float32)
    y = y + b3_ref[...].astype(jnp.float32) + x.astype(jnp.float32)
    out_ref[...] = jnp.maximum(y, 0.0).astype(x.dtype).reshape(G, H, W, CIN)


def _block_fwd_save_pallas(x, w1, b1, w2, b2, w3, b3, interpret: bool, g: int = 1):
    N, H, W, CIN = x.shape
    F = w1.shape[1]
    G = g
    assert N % G == 0, (N, G)
    w2op, w2spec, packed = _w2_operand(w2, F, W)
    kernel = functools.partial(
        _fwd_save_kernel, G=G, H=H, W=W, CIN=CIN, F=F, packed=packed
    )
    return pl.pallas_call(
        kernel,
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G, H, W, CIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((CIN, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            w2spec,
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((F, CIN), lambda i: (0, 0)),
            pl.BlockSpec((1, CIN), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G, H, W, CIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((G, H, W, F), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((G, H, W, F), lambda i: (i, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W, CIN), x.dtype),
            jax.ShapeDtypeStruct((N, H, W, F), x.dtype),
            jax.ShapeDtypeStruct((N, H, W, F), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, w1, b1, w2op, b2, w3, b3)


def _bwd_saved_kernel(
    x_ref, g_ref, out_ref, h1_ref, h2_ref, w1_ref, w2_ref, w3_ref,
    dx_ref, dw1_ref, dw2_ref, dw3_ref,
    a1_ref, a2_ref, a3_ref, *, G, H, W, CIN, F, packed=False,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        a1_ref[:] = jnp.zeros_like(a1_ref)
        a2_ref[:] = jnp.zeros_like(a2_ref)
        a3_ref[:] = jnp.zeros_like(a3_ref)

    dt = x_ref.dtype
    R = G * H * W
    x = x_ref[...].reshape(R, CIN)
    h1 = h1_ref[...].reshape(R, F)
    h2 = h2_ref[...].reshape(R, F)
    g = g_ref[...].reshape(R, CIN)
    m3 = _relu_mask_mul(g, out_ref[...].reshape(R, CIN))
    dh2 = jax.lax.dot_general(
        m3, w3_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    a3_ref[:] += jax.lax.dot_general(
        h2, m3, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m2 = _relu_mask_mul(dh2.astype(dt), h2)
    dh1 = _conv2_grads(h1, m2, w2_ref, a2_ref, G, H, W, F, packed)
    m1 = _relu_mask_mul(dh1.astype(dt), h1)
    dx = jax.lax.dot_general(
        m1, w1_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    a1_ref[:] += jax.lax.dot_general(
        x, m1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dx_ref[...] = (dx + m3.astype(jnp.float32)).astype(dt).reshape(G, H, W, CIN)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw1_ref[...] = a1_ref[...]
        dw2_ref[...] = a2_ref[...]
        dw3_ref[...] = a3_ref[...]


def _block_bwd_saved_pallas(x, g, out, h1, h2, w1, w2, w3, interpret: bool, gsz: int = 1):
    """Returns (dx, dw1, dw2, dw3); in packed mode dw2 comes back PAIR-PACKED
    (9, 2F, 2F) — the caller routes it through unpack_dw2_pairs."""
    N, H, W, CIN = x.shape
    F = w1.shape[1]
    G = gsz
    assert N % G == 0, (N, G)
    packed = _pair_packed(F, W)
    if packed:
        # dgrad = plain packed conv with the flip-transposed kernel
        w2op = pack_w2_pairs(_flip_transpose_w2(w2))
        w2spec = pl.BlockSpec((9, 2 * F, 2 * F), lambda i: (0, 0, 0))
        dw2_shape = (9, 2 * F, 2 * F)
        dw2_spec = pl.BlockSpec(dw2_shape, lambda i: (0, 0, 0))
    else:
        w2op = w2
        w2spec = pl.BlockSpec((3, 3, F, F), lambda i: (0, 0, 0, 0))
        dw2_shape = (3, 3, F, F)
        dw2_spec = pl.BlockSpec(dw2_shape, lambda i: (0, 0, 0, 0))
    kernel = functools.partial(
        _bwd_saved_kernel, G=G, H=H, W=W, CIN=CIN, F=F, packed=packed
    )
    return pl.pallas_call(
        kernel,
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G, H, W, CIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((G, H, W, CIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((G, H, W, CIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((G, H, W, F), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((G, H, W, F), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((CIN, F), lambda i: (0, 0)),
            w2spec,
            pl.BlockSpec((F, CIN), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G, H, W, CIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((CIN, F), lambda i: (0, 0)),
            dw2_spec,
            pl.BlockSpec((F, CIN), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W, CIN), x.dtype),
            jax.ShapeDtypeStruct((CIN, F), jnp.float32),
            jax.ShapeDtypeStruct(dw2_shape, jnp.float32),
            jax.ShapeDtypeStruct((F, CIN), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((CIN, F), jnp.float32),
            pltpu.VMEM(dw2_shape, jnp.float32),
            pltpu.VMEM((F, CIN), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, g, out, h1, h2, w1, w2op, w3)


# ───────────────────────────────── backward ─────────────────────────────────


def _bwd_kernel(
    x_ref, g_ref, out_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    dx_ref, dw1_ref, dw2_ref, dw3_ref,
    a1_ref, a2_ref, a3_ref, *, G, H, W, CIN, F,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        a1_ref[:] = jnp.zeros_like(a1_ref)
        a2_ref[:] = jnp.zeros_like(a2_ref)
        a3_ref[:] = jnp.zeros_like(a3_ref)

    dt = x_ref.dtype
    R = G * H * W
    x = x_ref[...].reshape(R, CIN)
    # recompute interiors in VMEM (remat without HBM traffic)
    h1 = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[...].astype(jnp.float32), 0.0).astype(dt)
    h2, padded = _conv3x3_shifted(h1, w2_ref, G, H, W, F)
    h2 = jnp.maximum(h2 + b2_ref[...].astype(jnp.float32), 0.0).astype(dt)

    g = g_ref[...].reshape(R, CIN)
    m3 = _relu_mask_mul(g, out_ref[...].reshape(R, CIN))
    # conv3 grads
    dh2 = jax.lax.dot_general(
        m3, w3_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    a3_ref[:] += jax.lax.dot_general(
        h2, m3, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m2 = _relu_mask_mul(dh2.astype(dt), h2)
    # conv2 transpose: dh1[p] = sum_k m2 shifted by -k @ w2[k]^T; and
    # dw2[ky,kx] += shift(h1, ky, kx)^T @ m2  (same shifts as forward)
    m2_padded = jnp.pad(m2.reshape(G, H, W, F), ((0, 0), (1, 1), (1, 1), (0, 0)))
    dh1 = jnp.zeros((R, F), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            h1_shift = padded[:, ky : ky + H, kx : kx + W].reshape(R, F)
            a2_ref[ky, kx] += jax.lax.dot_general(
                h1_shift, m2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            # transpose conv: flip the shift direction (2-ky, 2-kx)
            m2_shift = m2_padded[:, 2 - ky : 2 - ky + H, 2 - kx : 2 - kx + W].reshape(R, F)
            dh1 = dh1 + jax.lax.dot_general(
                m2_shift, w2_ref[ky, kx], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    m1 = _relu_mask_mul(dh1.astype(dt), h1)
    # conv1 grads + identity-residual skip grad in the same write
    dx = jax.lax.dot_general(
        m1, w1_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    a1_ref[:] += jax.lax.dot_general(
        x, m1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dx_ref[...] = (dx + m3.astype(jnp.float32)).astype(dt).reshape(G, H, W, CIN)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw1_ref[...] = a1_ref[...]
        dw2_ref[...] = a2_ref[...]
        dw3_ref[...] = a3_ref[...]


def _block_bwd_pallas(x, g, out, w1, b1, w2, b2, w3, b3, interpret: bool, gsz: int = 1):
    N, H, W, CIN = x.shape
    F = w1.shape[1]
    G = gsz
    assert N % G == 0, (N, G)
    kernel = functools.partial(_bwd_kernel, G=G, H=H, W=W, CIN=CIN, F=F)
    dx, dw1, dw2, dw3 = pl.pallas_call(
        kernel,
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G, H, W, CIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((G, H, W, CIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((G, H, W, CIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((CIN, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((3, 3, F, F), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((F, CIN), lambda i: (0, 0)),
            pl.BlockSpec((1, CIN), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((G, H, W, CIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((CIN, F), lambda i: (0, 0)),
            pl.BlockSpec((3, 3, F, F), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((F, CIN), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, H, W, CIN), x.dtype),
            jax.ShapeDtypeStruct((CIN, F), jnp.float32),
            jax.ShapeDtypeStruct((3, 3, F, F), jnp.float32),
            jax.ShapeDtypeStruct((F, CIN), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((CIN, F), jnp.float32),
            pltpu.VMEM((3, 3, F, F), jnp.float32),
            pltpu.VMEM((F, CIN), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, g, out, w1, b1, w2, b2, w3, b3)
    return dx, dw1, dw2, dw3


# ─────────────────────────── public op (custom VJP) ───────────────────────────


def _use_pallas(impl: str) -> bool:
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    return jax.default_backend() == "tpu"


def _interp(interpret: Optional[bool]) -> bool:
    return (jax.default_backend() != "tpu") if interpret is None else interpret


def _xla_forward(x, w1, b1, w2, b2, w3, b3):
    N, H, W, CIN = x.shape
    F = w1.shape[1]
    # convs in the input dtype, bias-add/relu in f32 — the same structure the
    # flax model compiles to (XLA accumulates bf16 convs in f32 internally);
    # no preferred_element_type so the conv transposes differentiate cleanly
    h1 = jax.lax.conv_general_dilated(
        x, w1.reshape(1, 1, CIN, F), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h1 = jnp.maximum(h1.astype(jnp.float32) + b1, 0.0).astype(x.dtype)
    h2 = jax.lax.conv_general_dilated(
        h1, w2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    h2 = jnp.maximum(h2.astype(jnp.float32) + b2, 0.0).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        h2, w3.reshape(1, 1, F, CIN), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.maximum(y.astype(jnp.float32) + b3 + x.astype(jnp.float32), 0.0).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _block(x, w1, b1, w2, b2, w3, b3, impl: str, interpret: Optional[bool], gsz: int = 1):
    if _use_pallas(impl):
        return _block_fwd_pallas(x, w1, b1, w2, b2, w3, b3, _interp(interpret), g=gsz)
    return _xla_forward(x, w1, b1, w2, b2, w3, b3)


def _block_fwd(x, w1, b1, w2, b2, w3, b3, impl, interpret, gsz=1):
    out = _block(x, w1, b1, w2, b2, w3, b3, impl, interpret, gsz)
    return out, (x, w1, b1, w2, b2, w3, b3, out)


def _block_bwd(impl, interpret, gsz, resids, g):
    x, w1, b1, w2, b2, w3, b3, out = resids
    if _use_pallas(impl):
        dx, dw1, dw2, dw3 = _block_bwd_pallas(
            x, g, out, w1, b1, w2, b2, w3, b3, _interp(interpret), gsz=gsz
        )
    else:
        # XLA-math reference backward (same formulas, materialized tensors)
        N, H, W, CIN = x.shape
        F = w1.shape[1]
        x2 = x.reshape(-1, CIN)
        h1 = jnp.maximum(
            jnp.dot(x2, w1, preferred_element_type=jnp.float32) + b1, 0.0
        ).astype(x.dtype)
        padded = jnp.pad(h1.reshape(N, H, W, F), ((0, 0), (1, 1), (1, 1), (0, 0)))
        h2 = jnp.zeros((N * H * W, F), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                sh = padded[:, ky : ky + H, kx : kx + W].reshape(-1, F)
                h2 = h2 + jnp.dot(sh, w2[ky, kx], preferred_element_type=jnp.float32)
        h2 = jnp.maximum(h2 + b2, 0.0).astype(x.dtype)

        g2 = g.reshape(-1, CIN)
        m3 = jnp.where(out.reshape(-1, CIN) > 0, g2, jnp.zeros_like(g2))
        dh2 = jax.lax.dot_general(m3, w3, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        dw3 = jax.lax.dot_general(h2, m3, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m2 = jnp.where(h2 > 0, dh2.astype(x.dtype), jnp.zeros_like(h2))
        m2_padded = jnp.pad(m2.reshape(N, H, W, F), ((0, 0), (1, 1), (1, 1), (0, 0)))
        dh1 = jnp.zeros((N * H * W, F), jnp.float32)
        dw2 = []
        for ky in range(3):
            row = []
            for kx in range(3):
                h1s = padded[:, ky : ky + H, kx : kx + W].reshape(-1, F)
                row.append(
                    jax.lax.dot_general(h1s, m2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
                )
                m2s = m2_padded[:, 2 - ky : 2 - ky + H, 2 - kx : 2 - kx + W].reshape(-1, F)
                dh1 = dh1 + jax.lax.dot_general(
                    m2s, w2[ky, kx], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
            dw2.append(jnp.stack(row))
        dw2 = jnp.stack(dw2)
        m1 = jnp.where(h1 > 0, dh1.astype(x.dtype), jnp.zeros_like(h1))
        dx = (
            jax.lax.dot_general(m1, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            + m3.astype(jnp.float32)
        ).astype(x.dtype)
        dw1 = jax.lax.dot_general(x2, m1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dx = dx.reshape(x.shape)
    zb = lambda b: jnp.zeros_like(b)
    return (
        dx,
        dw1.astype(w1.dtype),
        zb(b1),
        dw2.astype(w2.dtype),
        zb(b2),
        dw3.astype(w3.dtype),
        zb(b3),
    )


_block.defvjp(_block_fwd, _block_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _block_saved(
    x, w1, b1, w2, b2, w3, b3, impl: str, interpret: Optional[bool], gsz: int = 1
):
    """Saved-residuals variant: the Pallas forward emits h1/h2 so the backward
    skips the in-VMEM recompute. Measured fastest fwd+bwd at stage-0 geometry:
    9.99 ms vs 12.01 recompute vs 12.76 XLA autodiff (.bench/bench_blockbwd.py).

    The primal (non-differentiated call, e.g. eval/inference) uses the no-save
    forward — h1/h2 are only materialized in _block_saved_fwd, where the VJP
    actually consumes them (ADVICE r2: the save variant pays two dead
    stage-sized HBM writes otherwise)."""
    if _use_pallas(impl):
        return _block_fwd_pallas(x, w1, b1, w2, b2, w3, b3, _interp(interpret), g=gsz)
    return _xla_forward(x, w1, b1, w2, b2, w3, b3)


def _block_saved_fwd(x, w1, b1, w2, b2, w3, b3, impl, interpret, gsz=1):
    if _use_pallas(impl):
        out, h1, h2 = _block_fwd_save_pallas(
            x, w1, b1, w2, b2, w3, b3, _interp(interpret), g=gsz
        )
        return out, (x, w1, b1, w2, b2, w3, b3, out, h1, h2)
    out = _xla_forward(x, w1, b1, w2, b2, w3, b3)
    return out, (x, w1, b1, w2, b2, w3, b3, out, None, None)


def _block_saved_bwd(impl, interpret, gsz, resids, g):
    x, w1, b1, w2, b2, w3, b3, out, h1, h2 = resids
    if _use_pallas(impl):
        dx, dw1, dw2, dw3 = _block_bwd_saved_pallas(
            x, g, out, h1, h2, w1, w2, w3, _interp(interpret), gsz=gsz
        )
        if dw2.ndim == 3:  # pair-packed (9, 2F, 2F) weight-grad
            dw2 = unpack_dw2_pairs(dw2, w2.shape[-1])
        zb = lambda b: jnp.zeros_like(b)
        return (dx, dw1.astype(w1.dtype), zb(b1), dw2.astype(w2.dtype), zb(b2),
                dw3.astype(w3.dtype), zb(b3))
    # XLA fallback: recompute-based reference backward (same formulas)
    return _block_bwd(impl, interpret, gsz, (x, w1, b1, w2, b2, w3, b3, out), g)


_block_saved.defvjp(_block_saved_fwd, _block_saved_bwd)


def fused_bottleneck_block(
    x: jnp.ndarray,
    k1: jnp.ndarray,  # (1, 1, CIN, F)
    s1, bi1, m1, v1,  # frozen BN buffers for conv1 (each (F,))
    k2: jnp.ndarray,  # (3, 3, F, F)
    s2, bi2, m2, v2,
    k3: jnp.ndarray,  # (1, 1, F, CIN)
    s3, bi3, m3, v3,  # (CIN,)
    *,
    eps: float = 1e-5,
    impl: str = "auto",
    interpret: Optional[bool] = None,
    g: int = 1,
) -> jnp.ndarray:
    """Fused stride-1 identity-residual bottleneck block under frozen affine.

    Folds each frozen BN affine into the preceding conv's effective weights/bias
    (f32 fold, like pointwise.py), then runs the whole block as one kernel each
    way. Gradients flow to x and the three conv kernels; the BN buffers are
    frozen (zero cotangents, stop-gradiented by the caller).

    `g` = images per Pallas grid step. Deep stages have tiny per-image row
    counts (stage 3: 8x8 = 64 rows) that starve the 128-row MXU; batching g
    images per step restores full tiles. Must divide the batch."""
    w1, b1, w2, b2, w3, b3 = fold_bottleneck_params(
        x.dtype, k1, s1, bi1, m1, v1, k2, s2, bi2, m2, v2, k3, s3, bi3, m3, v3, eps=eps
    )
    return _block_saved(x, w1, b1, w2, b2, w3, b3, impl, interpret, g)


def fold_bottleneck_params(
    dtype, k1, s1, bi1, m1, v1, k2, s2, bi2, m2, v2, k3, s3, bi3, m3, v3, *, eps=1e-5
):
    """Fold the three frozen BN affines into effective conv weights/biases:
    (w1 (CIN,F), b1 (1,F), w2 (3,3,F,F), b2, w3 (F,CIN), b3) — the operand
    layout of _block_saved and of the stage-chain kernels (stage_fused.py)."""
    CIN = k1.shape[-2]
    F = k1.shape[-1]

    def fold(k, s, b, m, v, cout, shape):
        c = s * jax.lax.rsqrt(v + eps)
        w = (k.reshape(*shape).astype(jnp.float32) * c).astype(dtype)
        beff = (b - m * c).reshape(1, cout)
        return w, beff

    w1, b1 = fold(k1, s1, bi1, m1, v1, F, (CIN, F))
    c2 = s2 * jax.lax.rsqrt(v2 + eps)
    w2 = (k2.astype(jnp.float32) * c2).astype(dtype)
    b2 = (bi2 - m2 * c2).reshape(1, F)
    w3, b3 = fold(k3, s3, bi3, m3, v3, CIN, (F, CIN))
    return w1, b1, w2, b2, w3, b3

"""Whole-STAGE fused Pallas kernels: a projection block + K identity blocks
chained inside ONE kernel each way.

With per-block kernels (block_fused.py / proj_fused.py) every inter-block
boundary costs four stage-sized HBM passes that pure chaining removes:

  * forward: block j+1 re-READS block j's output (its input) from HBM;
  * backward: block j+1's dx is WRITTEN to HBM and re-READ by block j, and
    the boundary activation is read twice (as block j's `out` for the relu
    mask and as block j+1's `x`).

Chained, the running activation and the running cotangent stay in VMEM across
blocks; only what the backward genuinely needs from the forward is written
(each block's output — doubling as the next block's input — and the h1/h2
saved residuals, exactly as the per-block kernels already save). At flagship
shapes (B=256 images) the removed boundary traffic is ~2 GB/step for stage 0
alone (2 boundaries x 4 passes x 2 MB x 256 images).

Weight-gradient accumulators for ALL chained blocks live in f32 VMEM scratch
across the sequential image grid, which bounds chain length by VMEM: stages
0-2 fit whole; stage 3's accumulators alone are ~60 MB so it stays on the
per-block kernels (the boundary activations there are 8x8x2048 = 0.25 MB —
the chain would save <1 ms).

The block math is identical (same op order, same dtypes, dx cast to the
compute dtype at each boundary) to the per-block kernels, so the chain is
value- and gradient-exact against the composed per-block path; pinned in
tests/test_stage_fused.py. Frozen-affine only, like the per-block kernels.

Reference architecture: the torchvision ResNet-50 stage layout the reference
model fine-tunes (argus/models.py:43).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from argus_tpu.ops.pallas.block_fused import (
    _conv2_relu,
    _conv3x3_packed,
    _conv3x3_shifted,
    _flip_transpose_w2,
    _interp,
    _pack_pair_rows,
    _pair_packed,
    _relu_mask_mul,
    _unpack_pair_rows,
    _use_pallas,
    pack_w2_pairs,
    unpack_dw2_pairs,
)
from argus_tpu.ops.pallas.proj_fused import (
    _dh1_scatter,
    _proj_fwd_core,
    _scatter2,
    _subsample2,
    _taps,
)

_VMEM_LIMIT = 110 * 1024 * 1024

# ─────────────────────────── block math cores ───────────────────────────
# Array-level (not ref-level) forward/backward math, shared by the chain
# kernels below. Same operations in the same order as the per-block kernels
# (block_fused._fwd_save_kernel / _bwd_saved_kernel, proj_fused counterparts).


def _id_fwd_core(x4, w1, b1, w2, b2, w3, b3, G, H, W, CIN, F, packed=False):
    """Identity bottleneck forward on a (G, H, W, CIN) array; returns
    (out(G,H,W,CIN), h1 2D, h2 2D). `packed`: w2 holds the PAIR-PACKED
    (9, 2F, 2F) weights (block_fused.pack_w2_pairs)."""
    x = x4.reshape(G * H * W, CIN)
    h1 = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1.astype(jnp.float32), 0.0).astype(x.dtype)
    # _conv2_relu indexes its operands with [...] / [t] — valid on arrays too
    h2 = _conv2_relu(h1, w2, b2, G, H, W, F, packed)
    y = jnp.dot(h2, w3, preferred_element_type=jnp.float32)
    y = y + b3.astype(jnp.float32) + x.astype(jnp.float32)
    out = jnp.maximum(y, 0.0).astype(x.dtype).reshape(G, H, W, CIN)
    return out, h1, h2


def _id_bwd_core(x4, g4, out4, h1_2d, h2_2d, w1, w2, w3, G, H, W, CIN, F, packed=False):
    """Identity bottleneck backward; returns (dx(G,H,W,CIN) f32, dw1, dw2, dw3).
    `packed`: w2 holds the PAIR-PACKED FLIP-TRANSPOSED (9, 2F, 2F) weights and
    dw2 comes back pair-packed (9, 2F, 2F) — unpack_dw2_pairs outside."""
    dt = x4.dtype
    R = G * H * W
    x = x4.reshape(R, CIN)
    h1 = h1_2d.reshape(R, F)
    h2 = h2_2d.reshape(R, F)
    g = g4.reshape(R, CIN)
    m3 = _relu_mask_mul(g, out4.reshape(R, CIN))
    dh2 = jax.lax.dot_general(
        m3, w3, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw3 = jax.lax.dot_general(
        h2, m3, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m2 = _relu_mask_mul(dh2.astype(dt), h2)
    if packed:
        Wp, F2 = W // 2, 2 * F
        h1p = _pack_pair_rows(h1, F)
        m2p = _pack_pair_rows(m2, F)
        dh1p, _ = _conv3x3_packed(m2p, w2, G, H, Wp, F2)
        dh1 = _unpack_pair_rows(dh1p, F)
        h1pp = jnp.pad(h1p.reshape(G, H, Wp, F2), ((0, 0), (1, 1), (1, 1), (0, 0)))
        dw2 = jnp.stack(
            [
                jax.lax.dot_general(
                    h1pp[:, ky : ky + H, b : b + Wp].reshape(R // 2, F2), m2p,
                    (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
                for ky in range(3)
                for b in range(3)
            ]
        )  # (9, 2F, 2F) pair-packed
    else:
        padded = jnp.pad(h1.reshape(G, H, W, F), ((0, 0), (1, 1), (1, 1), (0, 0)))
        m2_padded = jnp.pad(m2.reshape(G, H, W, F), ((0, 0), (1, 1), (1, 1), (0, 0)))
        dh1 = jnp.zeros((R, F), jnp.float32)
        dw2 = []
        for ky in range(3):
            row = []
            for kx in range(3):
                h1_shift = padded[:, ky : ky + H, kx : kx + W].reshape(R, F)
                row.append(
                    jax.lax.dot_general(
                        h1_shift, m2, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
                m2_shift = m2_padded[:, 2 - ky : 2 - ky + H, 2 - kx : 2 - kx + W].reshape(R, F)
                dh1 = dh1 + jax.lax.dot_general(
                    m2_shift, w2[ky, kx], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            dw2.append(row)
        dw2 = jnp.stack([jnp.stack(row) for row in dw2])  # (3, 3, F, F)
    m1 = _relu_mask_mul(dh1.astype(dt), h1)
    dx = jax.lax.dot_general(
        m1, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw1 = jax.lax.dot_general(
        x, m1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dx = (dx + m3.astype(jnp.float32)).reshape(G, H, W, CIN)
    return dx, dw1, dw2, dw3


def _proj_bwd_core(x4, g4, out4, h1_2d, h2_2d, w1, w2, w3, wsc, G, H, W, CIN, F, COUT, S):
    """Projection bottleneck backward; returns (dx(G,H,W,CIN) f32, dw1, dw2,
    dw3, dwsc)."""
    dt = x4.dtype
    Ho, Wo = H // S, W // S
    R, Ro = G * H * W, G * Ho * Wo
    x = x4.reshape(R, CIN)
    h1 = h1_2d.reshape(R, F)
    h2 = h2_2d.reshape(Ro, F)
    gc = g4.reshape(Ro, COUT)
    m3 = _relu_mask_mul(gc, out4.reshape(Ro, COUT))
    dh2 = jax.lax.dot_general(
        m3, w3, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw3 = jax.lax.dot_general(
        h2, m3, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    xs = x if S == 1 else _subsample2(x4, G, Ho, Wo, CIN)
    dwsc = jax.lax.dot_general(
        xs, m3, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dxs = jax.lax.dot_general(
        m3, wsc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m2 = _relu_mask_mul(dh2.astype(dt), h2)
    padded = jnp.pad(h1.reshape(G, H, W, F), ((0, 0), (1, 1), (1, 1), (0, 0)))
    C = [[None] * 3 for _ in range(3)]
    dw2 = []
    for ky in range(3):
        row = []
        for kx in range(3):
            sh = _taps(padded, ky, kx, G, H, W, Ho, Wo, F, S)
            row.append(
                jax.lax.dot_general(
                    sh, m2, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
            C[ky][kx] = jax.lax.dot_general(
                m2, w2[ky, kx], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(G, Ho, Wo, F)
        dw2.append(row)
    dh1 = _dh1_scatter(C, G, Ho, Wo, F, S, H, W)
    m1 = _relu_mask_mul(dh1.astype(dt), h1)
    dx = jax.lax.dot_general(
        m1, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dw1 = jax.lax.dot_general(
        x, m1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if S == 1:
        dx = (dx + dxs).reshape(G, H, W, CIN)
    else:
        dx = dx.reshape(G, H, W, CIN) + _scatter2(dxs, G, Ho, Wo, CIN)
    dw2 = jnp.stack([jnp.stack(row) for row in dw2])
    return dx, dw1, dw2, dw3, dwsc


# ─────────────────────────── chain kernels ───────────────────────────
#
# A chain = [proj?] + K identity blocks at one stage geometry. Operand layout
# (all built programmatically):
#   fwd inputs : x, [proj w1,b1,w2,b2,w3,b3,wsc,bsc], (w1,b1,w2,b2,w3,b3)*K
#   fwd outputs: out, bnd_0..bnd_{B-2}, (h1_b, h2_b)*B          (B = #blocks)
#   bwd inputs : x, g, out, bnd_*, (h1_b, h2_b)*B, [proj w1,w2,w3,wsc], (w1,w2,w3)*K
#   bwd outputs: dx, [proj dw1,dw2,dw3,dwsc], (dw1,dw2,dw3)*K
# bnd_b is block b's output = block b+1's input; `out` is the last block's.


def _chain_geometry(has_proj, H, W, S):
    """Returns (Ho, Wo): the chain-output spatial dims."""
    if has_proj:
        return H // S, W // S
    return H, W


def _make_fwd_kernel(has_proj, K, G, H, W, CIN, F, COUT, S, save, packed=False):
    Ho, Wo = _chain_geometry(has_proj, H, W, S)
    nblocks = (1 if has_proj else 0) + K

    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        pw = [next(it) for _ in range(8)] if has_proj else None
        idw = [[next(it) for _ in range(6)] for _ in range(K)]
        out_ref = next(it)
        bnd_refs = [next(it) for _ in range(nblocks - 1)] if save else []
        h_refs = [(next(it), next(it)) for _ in range(nblocks)] if save else []

        b = 0
        if has_proj:
            out2d, h1, h2 = _proj_fwd_core(
                x_ref, *pw, G=G, H=H, W=W, CIN=CIN, F=F, COUT=COUT, S=S
            )
            cur = out2d.reshape(G, Ho, Wo, COUT)
            if save:
                h_refs[0][0][...] = h1.reshape(G, H, W, F)
                h_refs[0][1][...] = h2.reshape(G, Ho, Wo, F)
                if nblocks > 1:
                    bnd_refs[0][...] = cur
            b = 1
        else:
            cur = x_ref[...]
        for j in range(K):
            cur, h1, h2 = _id_fwd_core(
                cur, idw[j][0][...], idw[j][1][...], idw[j][2], idw[j][3][...],
                idw[j][4][...], idw[j][5][...], G, Ho, Wo, COUT, F, packed=packed,
            )
            if save:
                h_refs[b][0][...] = h1.reshape(G, Ho, Wo, F)
                h_refs[b][1][...] = h2.reshape(G, Ho, Wo, F)
                if b < nblocks - 1:
                    bnd_refs[b][...] = cur
            b += 1
        out_ref[...] = cur

    return kernel


def _make_bwd_kernel(has_proj, K, G, H, W, CIN, F, COUT, S, packed=False):
    Ho, Wo = _chain_geometry(has_proj, H, W, S)
    nblocks = (1 if has_proj else 0) + K
    n_dw = (4 if has_proj else 0) + 3 * K

    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        g_ref = next(it)
        out_ref = next(it)
        bnd_refs = [next(it) for _ in range(nblocks - 1)]
        h_refs = [(next(it), next(it)) for _ in range(nblocks)]
        pw = [next(it) for _ in range(4)] if has_proj else None
        idw = [[next(it) for _ in range(3)] for _ in range(K)]
        dx_ref = next(it)
        dw_refs = [next(it) for _ in range(n_dw)]
        a_refs = [next(it) for _ in range(n_dw)]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            for a in a_refs:
                a[:] = jnp.zeros_like(a)

        dt = x_ref.dtype
        g = g_ref[...]
        # identity blocks, last to first
        for j in reversed(range(K)):
            b = j + (1 if has_proj else 0)
            out_b = out_ref[...] if b == nblocks - 1 else bnd_refs[b][...]
            x_b = x_ref[...] if b == 0 else bnd_refs[b - 1][...]
            dx, dw1, dw2, dw3 = _id_bwd_core(
                x_b, g, out_b, h_refs[b][0][...], h_refs[b][1][...],
                idw[j][0][...], idw[j][1], idw[j][2][...], G, Ho, Wo, COUT, F,
                packed=packed,
            )
            base = (4 if has_proj else 0) + 3 * j
            a_refs[base][:] += dw1
            a_refs[base + 1][:] += dw2
            a_refs[base + 2][:] += dw3
            g = dx.astype(dt)  # match the per-block composition's dtype flow
        if has_proj:
            out_b = out_ref[...] if nblocks == 1 else bnd_refs[0][...]
            dx, dw1, dw2, dw3, dwsc = _proj_bwd_core(
                x_ref[...], g, out_b, h_refs[0][0][...], h_refs[0][1][...],
                pw[0][...], pw[1], pw[2][...], pw[3][...],
                G, H, W, CIN, F, COUT, S,
            )
            a_refs[0][:] += dw1
            a_refs[1][:] += dw2
            a_refs[2][:] += dw3
            a_refs[3][:] += dwsc
            g = dx.astype(dt)
        dx_ref[...] = g

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            for dw_ref, a in zip(dw_refs, a_refs):
                dw_ref[...] = a[...]

    return kernel


def _img_spec(G, H, W, C):
    return pl.BlockSpec((G, H, W, C), lambda i: (i, 0, 0, 0))


def _w_spec(shape):
    nd = len(shape)
    if nd == 2:
        return pl.BlockSpec(shape, lambda i: (0, 0))
    if nd == 3:  # pair-packed (9, 2F, 2F) conv2 weights
        return pl.BlockSpec(shape, lambda i: (0, 0, 0))
    return pl.BlockSpec(shape, lambda i: (0, 0, 0, 0))


def _proj_w_shapes(CIN, F, COUT):
    return [(CIN, F), (1, F), (3, 3, F, F), (1, F), (F, COUT), (1, COUT), (CIN, COUT), (1, COUT)]


def _id_w_shapes(C, F, packed=False):
    w2s = (9, 2 * F, 2 * F) if packed else (3, 3, F, F)
    return [(C, F), (1, F), w2s, (1, F), (F, C), (1, C)]


def _chain_fwd_pallas(x, pw, idws, S, interpret, G, save):
    N, H, W, CIN = x.shape
    has_proj = pw is not None
    K = len(idws)
    F = (pw[0] if has_proj else idws[0][0]).shape[1]
    COUT = pw[4].shape[1] if has_proj else CIN
    Ho, Wo = _chain_geometry(has_proj, H, W, S)
    nblocks = (1 if has_proj else 0) + K
    dt = x.dtype

    packed = _pair_packed(F, Wo)
    in_specs = [_img_spec(G, H, W, CIN)]
    operands = [x]
    if has_proj:
        in_specs += [_w_spec(s) for s in _proj_w_shapes(CIN, F, COUT)]
        operands += list(pw)
    for idw in idws:
        in_specs += [_w_spec(s) for s in _id_w_shapes(COUT, F, packed)]
        operands += [
            idw[0], idw[1],
            pack_w2_pairs(idw[2]) if packed else idw[2],
            idw[3], idw[4], idw[5],
        ]

    out_specs = [_img_spec(G, Ho, Wo, COUT)]
    out_shape = [jax.ShapeDtypeStruct((N, Ho, Wo, COUT), dt)]
    if save:
        for _ in range(nblocks - 1):
            out_specs.append(_img_spec(G, Ho, Wo, COUT))
            out_shape.append(jax.ShapeDtypeStruct((N, Ho, Wo, COUT), dt))
        for b in range(nblocks):
            h1_hw = (H, W) if (has_proj and b == 0) else (Ho, Wo)
            out_specs += [_img_spec(G, *h1_hw, F), _img_spec(G, Ho, Wo, F)]
            out_shape += [
                jax.ShapeDtypeStruct((N, *h1_hw, F), dt),
                jax.ShapeDtypeStruct((N, Ho, Wo, F), dt),
            ]

    kernel = _make_fwd_kernel(has_proj, K, G, H, W, CIN, F, COUT, S, save, packed)
    outs = pl.pallas_call(
        kernel,
        grid=(N // G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)
    return outs if save else outs[0]


# ──────────── fully-packed no-save forward chain (F < 128, S == 1) ────────────
#
# Frozen stages run forward-only, and stage 0's F = 64 matmuls underfill the
# MXU there: conv2's nine shifted (R,64)@(64,64) matmuls issue at ~16 TF/s
# useful and the 1x1 legs carry K=64 or N=64 (docs/ROUND3_NOTES.md session-2
# shape table). The round-3 pair-packed conv2 could not ship inside the
# save/backward kernels because Mosaic rejects every route from the 64-lane h1
# to the 128-lane packed form (block_fused._pair_packed). The no-save forward
# admits a formulation with NO sub-128-lane cast anywhere:
#
#   * the chain input arrives pair-packed from HBM: one one-hot stride-(1,2)
#     conv at the chain entry (the space_to_depth_conv trick — rides the conv
#     custom-call tiling instead of a catastrophic small-C relayout);
#   * the 1x1 convs use block-diagonal packed weights, so h1/h2 are BORN
#     packed — (Rh, 2CIN)@(2CIN, 2F) and (Rh, 2F)@(2F, 2COUT) are full-lane
#     matmuls (2x the useful FLOPs in the zero blocks; the bet is issue rate,
#     and N=64 legs measured 5-10% of peak);
#   * conv2 is the measured-2.2x pair-packed form (block_fused helpers);
#   * the residual adds in packed space (identical q-major lane layout);
#   * the exit unpack (Rh, 2COUT) -> (R, COUT) is a >=128-lane regroup, the
#     class Mosaic accepts (proj_fused stride-2 views, _interleave2).
#
# Probe: .bench/probe_pack_chain.py. Packed weights are built outside the
# kernel from the folded weights (tiny static concats, zero gathers).


def _packed_fwd_ok(F, S, W_out, CIN, COUT):
    return (
        S == 1
        and W_out % 2 == 0
        and F < 128
        and (2 * F) % 128 == 0
        and (2 * CIN) % 128 == 0
        and (2 * COUT) % 128 == 0
        and os.environ.get("ARGUS_PACK_CHAIN", "1") == "1"
    )


def _blockdiag2(w):
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [jnp.concatenate([w, z], 1), jnp.concatenate([z, w], 1)], 0
    )


def _pack_bias2(b):
    return jnp.concatenate([b, b], -1)


def _pack_cols_conv(x):
    """(N, H, W, C) -> (N, H, W/2, 2C): adjacent column pairs side by side in
    lanes (packed[n,h,j,q*C+c] = x[n,h,2j+q,c]). Unlike space-to-depth, this
    permutation is LINEAR-ORDER PRESERVING, so a plain reshape does it — and
    on-chip the reshape is effectively free (measured 2.21 ms through a Pallas
    consumer vs 3.27 unpacked / 3.08 via a one-hot stride-(1,2) conv + layout
    copy, .bench/probe_pack_feed.py: C=64 arrays waste half of every (8,128)
    HBM tile, so the 128-lane view also DMAs ~1.5x faster than the source)."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w // 2, 2 * c)


def _id_fwd_core_packed(xp, w1p, b1p, w2p, b2p, w3p, b3p, G, H, Wp, F2):
    """Identity bottleneck forward on pair-packed 2D rows xp (G*H*Wp, 2CIN);
    same op order and dtype flow as _id_fwd_core."""
    h1 = jnp.dot(xp, w1p, preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1p.astype(jnp.float32), 0.0).astype(xp.dtype)
    h2, _ = _conv3x3_packed(h1, w2p, G, H, Wp, F2)
    h2 = jnp.maximum(h2 + b2p.astype(jnp.float32), 0.0).astype(xp.dtype)
    y = jnp.dot(h2, w3p, preferred_element_type=jnp.float32)
    y = y + b3p.astype(jnp.float32) + xp.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(xp.dtype)


def _proj_fwd_core_packed(xp, w1p, b1p, w2p, b2p, w3p, b3p, wscp, bscp, G, H, Wp, F2):
    """Projection bottleneck (S=1) forward on pair-packed rows; mirrors
    _proj_fwd_core's op order."""
    h1 = jnp.dot(xp, w1p, preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1p.astype(jnp.float32), 0.0).astype(xp.dtype)
    h2, _ = _conv3x3_packed(h1, w2p, G, H, Wp, F2)
    h2 = jnp.maximum(h2 + b2p.astype(jnp.float32), 0.0).astype(xp.dtype)
    y = jnp.dot(h2, w3p, preferred_element_type=jnp.float32)
    y = y + jnp.dot(xp, wscp, preferred_element_type=jnp.float32)
    y = y + b3p.astype(jnp.float32) + bscp.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(xp.dtype)


def _make_fwd_kernel_packed(has_proj, K, G, H, Wp, CIN, F, COUT):
    F2 = 2 * F

    def kernel(*refs):
        it = iter(refs)
        x_ref = next(it)
        pw = [next(it) for _ in range(8)] if has_proj else None
        idw = [[next(it) for _ in range(6)] for _ in range(K)]
        out_ref = next(it)
        cur = x_ref[...].reshape(G * H * Wp, 2 * CIN)
        if has_proj:
            cur = _proj_fwd_core_packed(
                cur, pw[0][...], pw[1][...], pw[2], pw[3][...], pw[4][...],
                pw[5][...], pw[6][...], pw[7][...], G, H, Wp, F2,
            )
        for j in range(K):
            cur = _id_fwd_core_packed(
                cur, idw[j][0][...], idw[j][1][...], idw[j][2], idw[j][3][...],
                idw[j][4][...], idw[j][5][...], G, H, Wp, F2,
            )
        # exit unpack: (Rh, 2*COUT) -> (G, H, 2*Wp, COUT), >=128-lane regroup
        out_ref[...] = cur.reshape(G, H, Wp, 2, COUT).reshape(G, H, 2 * Wp, COUT)

    return kernel


def _chain_fwd_packed(x, pw, idws, interpret, G, pre_packed=False):
    """No-save forward chain in pair-packed layout; x is the UNPACKED
    (N, H, W, CIN) input, or — with `pre_packed` — the already-packed
    (N, H, W/2, 2*CIN) view (e.g. the packed-output fused stem). Returns the
    unpacked (N, H, W, COUT) output."""
    if pre_packed:
        xp = x
        N, H, Wp, C2 = x.shape
        W, CIN = 2 * Wp, C2 // 2
    else:
        N, H, W, CIN = x.shape
        Wp = W // 2
        xp = _pack_cols_conv(x)
    has_proj = pw is not None
    K = len(idws)
    F = (pw[0] if has_proj else idws[0][0]).shape[1]
    COUT = pw[4].shape[1] if has_proj else CIN

    in_specs = [_img_spec(G, H, Wp, 2 * CIN)]
    operands = [xp]
    if has_proj:
        w1, b1, w2, b2, w3, b3, wsc, bsc = pw
        in_specs += [
            _w_spec(s)
            for s in [
                (2 * CIN, 2 * F), (1, 2 * F), (9, 2 * F, 2 * F), (1, 2 * F),
                (2 * F, 2 * COUT), (1, 2 * COUT), (2 * CIN, 2 * COUT), (1, 2 * COUT),
            ]
        ]
        operands += [
            _blockdiag2(w1), _pack_bias2(b1), pack_w2_pairs(w2), _pack_bias2(b2),
            _blockdiag2(w3), _pack_bias2(b3), _blockdiag2(wsc), _pack_bias2(bsc),
        ]
    for idw in idws:
        w1, b1, w2, b2, w3, b3 = idw
        in_specs += [
            _w_spec(s)
            for s in [
                (2 * COUT, 2 * F), (1, 2 * F), (9, 2 * F, 2 * F), (1, 2 * F),
                (2 * F, 2 * COUT), (1, 2 * COUT),
            ]
        ]
        operands += [
            _blockdiag2(w1), _pack_bias2(b1), pack_w2_pairs(w2), _pack_bias2(b2),
            _blockdiag2(w3), _pack_bias2(b3),
        ]

    kernel = _make_fwd_kernel_packed(has_proj, K, G, H, Wp, CIN, F, COUT)
    return pl.pallas_call(
        kernel,
        grid=(N // G,),
        in_specs=in_specs,
        out_specs=_img_spec(G, H, W, COUT),
        out_shape=jax.ShapeDtypeStruct((N, H, W, COUT), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)


def _chain_bwd_pallas(x, g, out, bnds, h1s, h2s, pw, idws, S, interpret, G):
    N, H, W, CIN = x.shape
    has_proj = pw is not None
    K = len(idws)
    F = (pw[0] if has_proj else idws[0][0]).shape[1]
    COUT = pw[2].shape[1] if has_proj else CIN
    Ho, Wo = _chain_geometry(has_proj, H, W, S)
    nblocks = (1 if has_proj else 0) + K
    dt = x.dtype

    in_specs = [
        _img_spec(G, H, W, CIN),
        _img_spec(G, Ho, Wo, COUT),
        _img_spec(G, Ho, Wo, COUT),
    ]
    operands = [x, g, out]
    for b in bnds:
        in_specs.append(_img_spec(G, Ho, Wo, COUT))
        operands.append(b)
    for b in range(nblocks):
        h1_hw = (H, W) if (has_proj and b == 0) else (Ho, Wo)
        in_specs += [_img_spec(G, *h1_hw, F), _img_spec(G, Ho, Wo, F)]
        operands += [h1s[b], h2s[b]]
    packed = _pair_packed(F, Wo)
    dw_shapes = []
    if has_proj:
        shapes = [(CIN, F), (3, 3, F, F), (F, COUT), (CIN, COUT)]
        in_specs += [_w_spec(s) for s in shapes]
        operands += list(pw)
        dw_shapes += shapes
    id_w2s = (9, 2 * F, 2 * F) if packed else (3, 3, F, F)
    for idw in idws:
        shapes = [(COUT, F), id_w2s, (F, COUT)]
        in_specs += [_w_spec(s) for s in shapes]
        # packed: the conv2 operand is the pair-packed FLIP-TRANSPOSED kernel
        # (the input-grad is then a plain packed conv); wgrad needs no weights
        operands += [
            idw[0],
            pack_w2_pairs(_flip_transpose_w2(idw[1])) if packed else idw[1],
            idw[2],
        ]
        dw_shapes += shapes

    out_specs = [_img_spec(G, H, W, CIN)] + [_w_spec(s) for s in dw_shapes]
    out_shape = [jax.ShapeDtypeStruct((N, H, W, CIN), dt)] + [
        jax.ShapeDtypeStruct(s, jnp.float32) for s in dw_shapes
    ]
    scratch = [pltpu.VMEM(s, jnp.float32) for s in dw_shapes]

    kernel = _make_bwd_kernel(has_proj, K, G, H, W, CIN, F, COUT, S, packed)
    return pl.pallas_call(
        kernel,
        grid=(N // G,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*operands)


# ─────────────────────────── XLA fallback (reference math) ───────────────────────────


def _xla_id_forward(x, w1, b1, w2, b2, w3, b3):
    N, H, W, CIN = x.shape
    F = w1.shape[1]
    h1 = jnp.maximum(
        jnp.einsum("nhwc,cf->nhwf", x, w1, preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32),
        0.0,
    ).astype(x.dtype)
    h2 = jax.lax.conv_general_dilated(
        h1, w2, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    h2 = jnp.maximum(h2.astype(jnp.float32) + b2.astype(jnp.float32), 0.0).astype(x.dtype)
    y = jnp.einsum("nhwf,fc->nhwc", h2, w3, preferred_element_type=jnp.float32)
    return jnp.maximum(y + b3.astype(jnp.float32) + x.astype(jnp.float32), 0.0).astype(x.dtype)


def _xla_chain(x, pw, idws, S):
    from argus_tpu.ops.pallas.proj_fused import _xla_forward

    cur = x
    if pw is not None:
        cur = _xla_forward(cur, *pw, S)
    for idw in idws:
        cur = _xla_id_forward(cur, *idw)
    return cur


# ─────────────────────────── public op (custom VJP) ───────────────────────────


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _stage_chain(x, pw, idws, S, impl, interpret, gsz, x_packed=False):
    if x_packed:
        # x is the pair-packed (N, H, W/2, 2*CIN) view (packed-output stem);
        # frozen-only, so only this primal ever sees it
        assert S == 1, "packed chain input requires a stride-1 stage"
        if _use_pallas(impl):
            return _chain_fwd_packed(
                x, pw, idws, _interp(interpret), gsz, pre_packed=True
            )
        n, h, wp, c2 = x.shape
        return _xla_chain(x.reshape(n, h, 2 * wp, c2 // 2), pw, idws, S)
    if _use_pallas(impl):
        F = (pw[0] if pw is not None else idws[0][0]).shape[1]
        COUT = pw[4].shape[1] if pw is not None else x.shape[3]
        if _packed_fwd_ok(F, S, x.shape[2] // S, x.shape[3], COUT):
            # frozen/no-grad path only (the primal): F < 128 stages run the
            # pair-packed full-lane forward — see the section comment above
            return _chain_fwd_packed(x, pw, idws, _interp(interpret), gsz)
        return _chain_fwd_pallas(x, pw, idws, S, _interp(interpret), gsz, save=False)
    return _xla_chain(x, pw, idws, S)


def _stage_chain_fwd(x, pw, idws, S, impl, interpret, gsz, x_packed=False):
    assert not x_packed, "packed chain input is forward-only (frozen stages)"
    if _use_pallas(impl):
        nblocks = (1 if pw is not None else 0) + len(idws)
        outs = _chain_fwd_pallas(x, pw, idws, S, _interp(interpret), gsz, save=True)
        out = outs[0]
        bnds = tuple(outs[1:nblocks])
        hs = outs[nblocks:]
        h1s = tuple(hs[0::2])
        h2s = tuple(hs[1::2])
        return out, (x, pw, idws, out, bnds, h1s, h2s)
    out = _xla_chain(x, pw, idws, S)
    return out, (x, pw, idws, None, None, None, None)


def _stage_chain_bwd(S, impl, interpret, gsz, x_packed, resids, g):
    x, pw, idws, out, bnds, h1s, h2s = resids
    has_proj = pw is not None
    if _use_pallas(impl):
        grads = _chain_bwd_pallas(
            x, g, out, list(bnds), list(h1s), list(h2s),
            (pw[0], pw[2], pw[4], pw[6]) if has_proj else None,
            [(w[0], w[2], w[4]) for w in idws],
            S, _interp(interpret), gsz,
        )
        dx = grads[0]
        dws = list(grads[1:])
        F = (pw[0] if has_proj else idws[0][0]).shape[1]
        dws = [unpack_dw2_pairs(d, F) if d.ndim == 3 else d for d in dws]
    else:
        def f(xv, pwv, idwsv):
            return _xla_chain(xv, pwv, idwsv, S)

        _, vjp = jax.vjp(f, x, pw, idws)
        dx_f, dpw_f, didws_f = vjp(g)
        # frozen-affine contract (same as the per-block ops): the folded biases
        # come from frozen BN buffers — their cotangents are defined as zero
        if has_proj:
            dpw_f = tuple(
                jnp.zeros_like(pw[i]) if i % 2 == 1 else dpw_f[i] for i in range(8)
            )
        didws_f = tuple(
            tuple(jnp.zeros_like(idws[j][i]) if i % 2 == 1 else didws_f[j][i] for i in range(6))
            for j in range(len(idws))
        )
        return dx_f, dpw_f, didws_f
    dt_w = (pw[0] if has_proj else idws[0][0]).dtype
    if has_proj:
        dw1, dw2, dw3, dwsc = dws[:4]
        dpw = (
            dw1.astype(dt_w), jnp.zeros_like(pw[1]), dw2.astype(dt_w),
            jnp.zeros_like(pw[3]), dw3.astype(dt_w), jnp.zeros_like(pw[5]),
            dwsc.astype(dt_w), jnp.zeros_like(pw[7]),
        )
        dws = dws[4:]
    else:
        dpw = None
    didws = tuple(
        (
            dws[3 * j].astype(dt_w), jnp.zeros_like(idws[j][1]),
            dws[3 * j + 1].astype(dt_w), jnp.zeros_like(idws[j][3]),
            dws[3 * j + 2].astype(dt_w), jnp.zeros_like(idws[j][5]),
        )
        for j in range(len(idws))
    )
    return dx, dpw, didws


_stage_chain.defvjp(_stage_chain_fwd, _stage_chain_bwd)


def fused_stage(
    x: jnp.ndarray,
    proj_folded: Optional[Tuple],  # (w1,b1,w2,b2,w3,b3,wsc,bsc) or None
    id_folded: Sequence[Tuple],  # [(w1,b1,w2,b2,w3,b3), ...]
    *,
    stride: int = 2,
    impl: str = "auto",
    interpret: Optional[bool] = None,
    g: int = 1,
    chain_cap: int = 3,
    x_packed: bool = False,
) -> jnp.ndarray:
    """Run a whole ResNet stage (projection entry + identity blocks) as fused
    Pallas chain kernels. Weights are the FOLDED effective weights (frozen BN
    affines already folded in — block_fused.fold_* helpers).

    `chain_cap` bounds the blocks per kernel: 4-block bodies drove the remote
    Mosaic compile past its practical envelope (the stage-1 proj+3id chain sat
    >40 min before the compile service dropped the connection —
    docs/ROUND3_NOTES.md), so longer stages split into consecutive <=cap
    chains (proj rides the first; later groups are pure identity chains). Each
    split boundary keeps its HBM round-trip; everything inside a group stays
    VMEM-resident."""
    ids = list(id_folded)
    nblocks = (1 if proj_folded is not None else 0) + len(ids)
    if x_packed:
        # packed input comes from the packed-output stem, which only engages
        # for frozen stages — and frozen stages chain whole (cap=block_count)
        assert nblocks <= chain_cap, "packed-input stages must chain whole"
        return _stage_chain(
            x, proj_folded, tuple(ids), stride, impl, interpret, g, True
        )
    if nblocks <= chain_cap:
        return _stage_chain(x, proj_folded, tuple(ids), stride, impl, interpret, g)
    head = chain_cap - (1 if proj_folded is not None else 0)
    x = _stage_chain(x, proj_folded, tuple(ids[:head]), stride, impl, interpret, g)
    # identity geometry after the stage entry: recompute the grid size so deep
    # stages keep their multi-image MXU grids
    from argus_tpu.models.resnet import _grid_images

    g_id = _grid_images(x.shape[0], x.shape[1], x.shape[2], x.shape[3])
    for start in range(head, len(ids), chain_cap):
        group = tuple(ids[start : start + chain_cap])
        x = _stage_chain(x, None, group, 1, impl, interpret, g_id)
    return x

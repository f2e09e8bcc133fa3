"""The WHOLE augmentation stack as ONE Pallas TPU kernel.

The XLA augmentation path is correct but byte-hungry: spaghetti arcs (10 mask
passes), planckian gains, 4 color-jiggle stages (each with clips, two needing a
gray-mean reduce), gaussian+motion blur, and the plasma shadow each stream the
(N, 3, H, W) batch through HBM — ~10+ full passes, measured ~9 ms of the 143 ms
flagship step (trace: docs/ROUND2_NOTES.md). This kernel keeps ONE image resident
in VMEM and applies the entire pipeline in registers: one HBM read of the image,
one write, plus a tiny read of the 64x64 plasma base field (upsampled in-kernel by
two MXU matmuls with precomputed bilinear resize matrices).

Parameter sampling stays OUTSIDE (jax.random in XLA) and is shared with the
unfused path (ops/augment.py `_arc_params`/`_planckian_gains`/`_jiggle_params`/
`_gaussian_taps`/`_motion_kernel`/`_plasma_params`), so both paths produce the
same augmentation up to dtype-accumulation noise — the equivalence is tested in
tests/test_augment_fused.py. Per-image scalars ride in ONE packed SMEM array
(layout below); the color-jiggle application order (sampled once per batch,
kornia same_on_batch semantics — argus/data.py:72) is compiled by `jiggle_plan`
into a static hue position (selecting one of 4 kernel variants via an XLA
switch) plus 3 SMEM affine-op selectors.

Border handling for the blur follows ops/pallas/blur.py: edge replication
(kornia reflect-pads; a 2 px border difference).

SMEM row layout, per image (f32):
    [ arcs: n_arcs x 10 | planckian gains: 3 | jiggle b,c,s,h: 4 |
      gauss taps: 5 | motion 3x3: 9 | blur gates: 2 | plasma intensity, quantity: 2 ]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from argus_tpu.ops.pallas.blur import _pad_edge


def _luma(x):
    """ITU-R 601 luma of a (3, H, W) image, keeping dtype."""
    return (
        jnp.asarray(0.299, x.dtype) * x[0]
        + jnp.asarray(0.587, x.dtype) * x[1]
        + jnp.asarray(0.114, x.dtype) * x[2]
    )


def _clip01(x):
    return jnp.clip(x, jnp.asarray(0.0, x.dtype), jnp.asarray(1.0, x.dtype))


def _hue_shift(x, shift):
    """(3, H, W) RGB -> HSV -> +shift on H -> RGB, clipped. Mirrors
    ops/augment._rgb_to_hsv/_hsv_to_rgb on a single image. Computed in f32:
    Mosaic has no bf16 vector comparisons."""
    out_dt = x.dtype
    x = x.astype(jnp.float32)
    shift = shift.astype(jnp.float32)
    r, g, b = x[0], x[1], x[2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    one = jnp.asarray(1.0, x.dtype)
    zero = jnp.asarray(0.0, x.dtype)
    safe_delta = jnp.where(delta == 0, one, delta)
    s = jnp.where(maxc == 0, zero, delta / jnp.where(maxc == 0, one, maxc))
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    # branch by channel ORDERING, never equality vs the recomputed max — see
    # ops/augment._rgb_to_hsv: consumer fusion can recompute a channel with
    # and without FMA, so `maxc == g` can miss by 1 ulp and fall through to
    # the wrong sextant formula (caught by test_jiggle_plan_all_orders)
    is_r = (r >= g) & (r >= b)
    h = jnp.where(is_r, bc - gc, jnp.where(g >= b, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(delta == 0, zero, h)
    h = (h / 6.0) % 1.0

    h = (h + shift) % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (one - s)
    q = v * (one - s * f)
    t = v * (one - s * (one - f))
    i_mod = jnp.mod(i, 6.0)

    def pick(vals):
        # nested where instead of jnp.select: select lowers to an argmax over
        # stacked bools, which Mosaic can't reduce
        out = vals[5]
        for k in range(4, -1, -1):
            out = jnp.where(i_mod == k, vals[k], out)
        return out

    r2 = pick([v, q, p, p, t, v])
    g2 = pick([t, v, v, q, p, p])
    b2 = pick([p, p, t, v, v, q])
    return _clip01(jnp.stack([r2, g2, b2])).astype(out_dt)


def jiggle_plan(order: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compile the sampled color-jiggle order into a branch-free kernel plan.

    brightness/contrast/saturation are all instances of ONE affine form
        clip(alpha*x + beta*luma(x) + gamma*mean(luma(x)))
    with (alpha, beta, gamma) = (bf,0,0) / (cf,0,1-cf) / (sf,1-sf,0); hue is
    the only nonlinear op. Any sampled order therefore factors as
        [affine passes 0..p-1] o hue o [affine passes p..2]
    i.e. exactly 3 affine passes plus hue at position p. The kernel family is
    specialized on p (4 variants dispatched by an XLA lax.switch OUTSIDE the
    kernel, so only the selected variant executes) while the 3 affine passes
    stay selector-driven. This replaces the 4-way in-kernel lax.switch per
    slot, whose all-branch VPU execution cost ~0.9 ms/step; a first attempt
    that kept p dynamic by padding to 6 affine passes recovered NOTHING
    (5.232 vs 5.228 ms — the identity passes pay full luma+mean cost), which
    is why p must be static (.bench/bench_aug_phases.py).

    Only the ORDER is per-batch (kornia same_on_batch, argus/data.py:72); the
    factors are per-image, so the plan carries op SELECTORS and the kernel
    resolves each pass's scalars per image from SMEM.

    Args:
        order: (4,) int32 permutation of 0..3 (0=brightness, 1=contrast,
            2=saturation, 3=hue).
    Returns:
        (hue_pos scalar int32, (1, 3) int32 affine op selectors in sampled
        relative order).
    """
    p = jnp.argmax(order == 3)  # hue position in the sampled order
    sel = jnp.where(order == 3, 3, order)
    # stable-sort the 3 affine ops ahead of the hue slot (relative order kept)
    aff = sel[jnp.argsort(sel == 3, stable=True)][:3]
    return p.astype(jnp.int32), aff[None].astype(jnp.int32)


def _make_kernel(n_arcs: int, phases: str = "awjbp", hue_pos: int = 0):
    A = n_arcs * 10  # scalar offsets into the packed SMEM row
    PO, JO, GO, MO, BO, QO = A, A + 3, A + 7, A + 12, A + 21, A + 23

    def kernel(img_ref, field_ref, mh_ref, mwt_ref, w_ref, order_ref, jp_ref, out_ref):
        i = pl.program_id(0)
        x = img_ref[0]  # (3, H, W)
        H, W = x.shape[1], x.shape[2]
        dt = x.dtype

        def w(k):
            return w_ref[i, k]  # f32 SMEM scalar (cast at the vector op)

        # ── spaghetti arcs (ops/augment.spaghetti_arcs math) ──
        if n_arcs > 0 and "a" in phases:
            # Mosaic iota is integer-only; cast after
            yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(jnp.float32)
            xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(jnp.float32)
            occ = jnp.zeros((H, W), jnp.bool_)
            for a in range(n_arcs):
                cx, cy, irx, iry, hws, ux, uy, vx, vy, wide = (w(10 * a + k) for k in range(10))
                dx = (xx - cx) * irx
                dy = (yy - cy) * iry
                # squared-radius ring test (matches ops/augment.spaghetti_arcs):
                # saves a per-pixel sqrt per arc on the VPU
                rho2 = dx * dx + dy * dy
                lo = jnp.maximum(1.0 - hws, 0.0)
                on_ring = (rho2 > lo * lo) & (rho2 < (1.0 + hws) * (1.0 + hws))
                cu = ux * dy - uy * dx
                cv = dx * vy - dy * vx
                # select-free (Mosaic can't arith.select i1 vectors): wide sweeps
                # take the OR branch, narrow ones the AND branch
                pos_u, pos_v = cu >= 0, cv >= 0
                in_sweep = (pos_u & pos_v) | ((wide > 0.5) & (pos_u | pos_v))
                occ = occ | (on_ring & in_sweep)
            x = jnp.where(occ[None], jnp.zeros((), dt), x)

        # ── planckian white balance ──
        if "w" in phases:
            x = _clip01(
                jnp.stack([x[c] * w(PO + c).astype(dt) for c in range(3)])
            )

        # ── color jiggle in the sampled order ──
        # scalars stay f32 (Mosaic has no bf16 scalar ALU); cast at the vector op
        bf, cf, sf, hf = (w(JO + k) for k in range(4))

        def do_brightness(img):
            return _clip01(img * bf.astype(dt))

        def do_contrast(img):
            # Mosaic reduces only in f32; ALL scalar math in f32, one cast at the end
            mean32 = jnp.mean(_luma(img).astype(jnp.float32))
            return _clip01(cf.astype(dt) * img + ((1.0 - cf) * mean32).astype(dt))

        def do_saturation(img):
            gray = _luma(img)[None]
            return _clip01(sf.astype(dt) * img + (1.0 - sf).astype(dt) * gray)

        def do_hue(img):
            return _hue_shift(img, hf)

        def unified(img, r):
            # one jiggle_plan affine pass: clip(a*img + b*luma + g*mean(luma)).
            # jp_ref[0, r] selects WHICH op this pass is (per-batch); the
            # factors are per-image SMEM scalars — resolved with scalar selects,
            # zero vector control flow. Arithmetic mirrors do_brightness/
            # contrast/saturation exactly (adding the zeroed terms is exact:
            # img >= 0, so v + 0.0 == v).
            op = jp_ref[0, r]
            one = jnp.float32(1.0)
            zero = jnp.float32(0.0)
            a = jnp.where(op == 0, bf, jnp.where(op == 1, cf, sf))
            b_ = jnp.where(op == 2, one - sf, zero)
            g_ = jnp.where(op == 1, one - cf, zero)
            lum = _luma(img)
            m32 = jnp.mean(lum.astype(jnp.float32))
            return _clip01(
                a.astype(dt) * img + b_.astype(dt) * lum[None] + (g_ * m32).astype(dt)
            )

        if "J" in phases:  # fixed-order variant: isolates the order-dispatch cost
            x = do_hue(do_saturation(do_contrast(do_brightness(x))))
        elif "S" in phases:  # legacy lax.switch form (attribution benches only)
            for slot in range(4):
                x = jax.lax.switch(
                    order_ref[0, slot], (do_brightness, do_contrast, do_saturation, do_hue), x
                )
        elif "j" in phases:
            # hue at STATIC position hue_pos (this kernel variant); 3
            # selector-affine passes in the sampled relative order
            for r in range(3):
                if r == hue_pos:
                    x = do_hue(x)
                x = unified(x, r)
            if hue_pos == 3:
                x = do_hue(x)

        # ── gaussian (5-tap separable) then motion (3x3) blur, both gated ──
        if "b" in phases:
            xp = _pad_edge(x, 2, axis=1)
            g = jnp.zeros_like(x)
            for k in range(5):
                g = g + w(GO + k).astype(dt) * xp[:, k : k + H, :]
            gp = _pad_edge(g, 2, axis=2)
            g2 = jnp.zeros_like(x)
            for k in range(5):
                g2 = g2 + w(GO + k).astype(dt) * gp[:, :, k : k + W]
            ggate = w(BO)
            g2 = ggate.astype(dt) * g2 + (1.0 - ggate).astype(dt) * x

            mp = _pad_edge(_pad_edge(g2, 1, axis=1), 1, axis=2)
            mblur = jnp.zeros_like(x)
            for ky in range(3):
                for kx in range(3):
                    mblur = mblur + w(MO + 3 * ky + kx).astype(dt) * mp[:, ky : ky + H, kx : kx + W]
            mgate = w(BO + 1)
            x = mgate.astype(dt) * mblur + (1.0 - mgate).astype(dt) * g2

        # ── plasma shadow: in-kernel bilinear upsample (two MXU matmuls) ──
        if "p" in phases:
            field = field_ref[0]  # (S, S) f32
            up = jnp.dot(
                jnp.dot(mh_ref[...], field, preferred_element_type=jnp.float32),
                mwt_ref[...],
                preferred_element_type=jnp.float32,
            )  # (H, W)
            fmin = jnp.min(up)
            fmax = jnp.max(up)
            plasma = (up - fmin) / jnp.maximum(fmax - fmin, 1e-6)
            shade = jnp.where(plasma < w(QO + 1), 1.0, 0.0) * w(QO)
            x = _clip01(x + shade[None].astype(dt))
        out_ref[0] = x

    return kernel


@functools.partial(jax.jit, static_argnames=("n_arcs", "interpret", "phases"))
def fused_augment(
    images: jnp.ndarray,
    field: jnp.ndarray,
    mh: jnp.ndarray,
    mwt: jnp.ndarray,
    packed: jnp.ndarray,
    order: jnp.ndarray,
    n_arcs: int,
    interpret: bool = False,
    phases: str = "awjbp",
) -> jnp.ndarray:
    """Run the fused augmentation kernel.

    Args:
        images: (N, 3, H, W) float, [0, 1].
        field: (N, S, S) f32 plasma base field (ops/augment._plasma_params).
        mh: (H, S) f32 bilinear row-resize matrix; mwt: (S, W) f32 column one.
        packed: (N, n_arcs*10 + 25) f32 per-image scalars (module docstring).
        order: (1, 4) int32 color-jiggle application order.
        n_arcs: number of spaghetti arcs baked into `packed`.
    """
    N, C, H, W = images.shape
    S = field.shape[-1]
    # branch-free jiggle plan from the per-batch order (factors stay per-image)
    hue_pos, jp = jiggle_plan(order[0])

    def run(hp):
        def branch(images, field, mh, mwt, packed, order, jp):
            return pl.pallas_call(
                _make_kernel(n_arcs, phases, hue_pos=hp),
                grid=(N,),
                in_specs=[
                    pl.BlockSpec((1, C, H, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, S, S), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((H, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((S, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, C, H, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((N, C, H, W), images.dtype),
                interpret=interpret,
            )(images, field, mh, mwt, packed, order, jp)

        return branch

    if "j" in phases and "J" not in phases and "S" not in phases:
        # hue position is baked into each kernel variant; the XLA switch runs
        # only the selected branch (true conditional on TPU, unlike in-kernel
        # lax.switch whose branches all execute on the VPU)
        return jax.lax.switch(
            hue_pos, [run(hp) for hp in range(4)], images, field, mh, mwt, packed, order, jp
        )
    return run(0)(images, field, mh, mwt, packed, order, jp)

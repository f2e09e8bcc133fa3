"""FULLY-PACKED identity-block forward probe (stage-0 geometry, CIN=256 F=64).

The round-3 pair-packed conv2 negative result was an IN-KERNEL REPACK problem:
Mosaic rejects every route from 64-lane h1 to the 128-lane packed form. This
probe tests the variant that has no sub-128-lane cast anywhere: the block
input arrives PAIR-PACKED from HBM (one one-hot conv at the chain entry), the
1x1 convs use block-diagonal packed weights so h1/h2 are BORN packed
(full-lane matmuls: (Rh,512)@(512,128) and (Rh,128)@(128,512) instead of the
N=64 / K=64 underfills), conv2 is the measured-2.2x pair-packed form, and the
residual adds in packed space. The only lane-size-changing cast is the CHAIN
EXIT unpack (Rh,512)->(R,256), which is a whole-tile regroup (F >= 128, the
class Mosaic accepts for proj_fused's stride-2 views).

Useful-FLOP accounting: conv1 + conv2 + conv3 of the identity bottleneck.
The packed 1x1s execute 2x the useful FLOPs (half the block-diag is zeros);
conv2 executes 2x (structural-zero weight blocks) — the bet is issue rate.

Usage:
  JAX_PLATFORMS=cpu python .bench/probe_pack_chain.py check   # interpret-mode equivalence
  python .bench/probe_pack_chain.py                           # real-chip timing
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from argus_tpu.ops.pallas.block_fused import (
    _conv3x3_packed,
    _conv3x3_shifted,
    pack_w2_pairs,
)

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

INTERP_EARLY = len(sys.argv) > 1 and sys.argv[1] == "check"
NIMG, H, W = (2 if INTERP_EARLY else 256), 64, 64
CIN, F = 256, 64
R, Rh, Wp = H * W, H * W // 2, W // 2
C2, F2 = 2 * CIN, 2 * F
DT = jnp.bfloat16
INTERP = len(sys.argv) > 1 and sys.argv[1] == "check"


def k_base(x_ref, w1, b1, w2, b2, w3, b3, o_ref):
    x = x_ref[...].reshape(R, CIN)
    h1 = jnp.dot(x, w1[...], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1[...].astype(jnp.float32), 0.0).astype(DT)
    h2, _ = _conv3x3_shifted(h1, w2, 1, H, W, F)
    h2 = jnp.maximum(h2 + b2[...].astype(jnp.float32), 0.0).astype(DT)
    y = jnp.dot(h2, w3[...], preferred_element_type=jnp.float32)
    y = y + b3[...].astype(jnp.float32) + x.astype(jnp.float32)
    o_ref[...] = jnp.maximum(y, 0.0).astype(DT).reshape(1, H, W, CIN)


def _packed_core(xp_ref, w1p, b1p, w2p, b2p, w3p, b3p):
    xp = xp_ref[...].reshape(Rh, C2)
    h1p = jnp.dot(xp, w1p[...], preferred_element_type=jnp.float32)
    h1p = jnp.maximum(h1p + b1p[...].astype(jnp.float32), 0.0).astype(DT)
    h2p, _ = _conv3x3_packed(h1p, w2p, 1, H, Wp, F2)
    h2p = jnp.maximum(h2p + b2p[...].astype(jnp.float32), 0.0).astype(DT)
    yp = jnp.dot(h2p, w3p[...], preferred_element_type=jnp.float32)
    yp = yp + b3p[...].astype(jnp.float32) + xp.astype(jnp.float32)
    return jnp.maximum(yp, 0.0).astype(DT)


def k_packed(xp_ref, w1p, b1p, w2p, b2p, w3p, b3p, o_ref):
    o_ref[...] = _packed_core(xp_ref, w1p, b1p, w2p, b2p, w3p, b3p).reshape(
        1, H, Wp, C2
    )


def k_packed_unpack2d(xp_ref, w1p, b1p, w2p, b2p, w3p, b3p, o_ref):
    out = _packed_core(xp_ref, w1p, b1p, w2p, b2p, w3p, b3p)
    o_ref[...] = out.reshape(Rh, 2, CIN).reshape(R, CIN).reshape(1, H, W, CIN)


def k_packed_unpack5d(xp_ref, w1p, b1p, w2p, b2p, w3p, b3p, o_ref):
    out = _packed_core(xp_ref, w1p, b1p, w2p, b2p, w3p, b3p)
    o_ref[...] = out.reshape(1, H, Wp, 2, CIN).reshape(1, H, W, CIN)


def make(kernel, in_packed, out_packed):
    ih = (H, Wp, C2) if in_packed else (H, W, CIN)
    oh = (H, Wp, C2) if out_packed else (H, W, CIN)
    wspecs = [
        pl.BlockSpec(s, lambda i, n=len(s): (0,) * n)
        for s in (
            [(C2, F2), (1, F2), (9, F2, F2), (1, F2), (F2, C2), (1, C2)]
            if in_packed
            else [(CIN, F), (1, F), (3, 3, F, F), (1, F), (F, CIN), (1, CIN)]
        )
    ]
    return jax.jit(
        pl.pallas_call(
            kernel,
            grid=(NIMG,),
            in_specs=[pl.BlockSpec((1, *ih), lambda i: (i, 0, 0, 0))] + wspecs,
            out_specs=pl.BlockSpec((1, *oh), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NIMG, *oh), DT),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
            interpret=INTERP,
        )
    )


def blockdiag(w):
    a, b = w.shape
    z = jnp.zeros((a, b), w.dtype)
    return jnp.concatenate(
        [jnp.concatenate([w, z], 1), jnp.concatenate([z, w], 1)], 0
    )


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (NIMG if not INTERP else 2, H, W, CIN)), DT)
w1 = jnp.asarray(rng.normal(0, 0.05, (CIN, F)), DT)
b1 = jnp.asarray(rng.normal(0, 0.1, (1, F)), DT)
w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, F, F)), DT)
b2 = jnp.asarray(rng.normal(0, 0.1, (1, F)), DT)
w3 = jnp.asarray(rng.normal(0, 0.05, (F, CIN)), DT)
b3 = jnp.asarray(rng.normal(0, 0.1, (1, CIN)), DT)

# packed operands (host-side packing of x stands in for the one-hot conv)
xp = jnp.asarray(np.asarray(x).reshape(x.shape[0], H, Wp, C2))
w1p = blockdiag(w1)
b1p = jnp.concatenate([b1, b1], -1)
w2p = pack_w2_pairs(w2).astype(DT)
b2p = jnp.concatenate([b2, b2], -1)
w3p = blockdiag(w3)
b3p = jnp.concatenate([b3, b3], -1)

pw = (w1p, b1p, w2p, b2p, w3p, b3p)
uw = (w1, b1, w2, b2, w3, b3)

if INTERP:
    ref = np.asarray(make(k_base, False, False)(x, *uw), np.float32)
    got_p = np.asarray(make(k_packed, True, True)(xp, *pw), np.float32)
    got_p = got_p.reshape(NIMG, H, W, CIN)  # host unpack
    err = np.max(np.abs(got_p - ref))
    print(f"packed    vs base: max abs err {err:.6f}")
    for name, k in (("unpack2d", k_packed_unpack2d), ("unpack5d", k_packed_unpack5d)):
        got = np.asarray(make(k, True, False)(xp, *pw), np.float32)
        print(f"{name}  vs base: max abs err {np.max(np.abs(got - ref)):.6f}")
    sys.exit(0)


def timed(fn, xin, ws, n=30):
    r = fn(xin, *ws)
    float(jnp.sum(r[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(xin, *ws)
    float(jnp.sum(r[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


FL = 2.0 * NIMG * R * (CIN * F + 9 * F * F + F * CIN)
for name, kern, inp, outp in [
    ("base          ", k_base, False, False),
    ("packed        ", k_packed, True, True),
    ("packed_unp5d  ", k_packed_unpack5d, True, False),
    ("packed_unp2d  ", k_packed_unpack2d, True, False),
]:
    f = make(kern, inp, outp)
    try:
        ms = timed(f, xp if inp else x, pw if inp else uw)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        continue
    print(f"{name}: {ms:6.2f} ms  useful {FL / ms / 1e9:6.1f} TF/s", flush=True)

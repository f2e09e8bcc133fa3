"""In-VMEM matmul-shape probe at stage-0 conv2 geometry: every variant reads
the same (1, 64, 64, 64) block per grid step (256 steps), builds operands in
VMEM, and differs only in matmul shape. Decides whether W-pair channel
packing (64ch x 2 cols -> 128ch, 2x FLOPs at K=N=128) beats the native
N=64 shapes that the standalone probe measured at ~5-10% of peak.

Cases:
  shift64   9x (4096,64)@(64,64)          current conv2 form
  im2col    1x (4096,576)@(576,64)        tap concat
  pack128   reshape->(2048,128); 9x (2048,128)@(128,128)   2x FLOPs
  packcol   reshape + concat -> (2048,1152)@(1152,128)     2x FLOPs, one dot
  reshape   reshape->(2048,128) copy out  relayout cost alone
  conv1n    (4096,256)@(256,64)           conv1 native
  conv1p    (4096,256)@(256,128)->reshape (2048, ...) n/a; use (2048,512)@(512,128)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

NIMG, H, W, C = 256, 64, 64, 64
R = H * W
DT = jnp.bfloat16
_OFFS = [(ky, kx) for ky in range(3) for kx in range(3)]


def taps(xp):
    return [xp[0, ky : ky + H, kx : kx + W].reshape(R, C) for ky, kx in _OFFS]


def k_shift64(x_ref, w_ref, o_ref):
    xp = jnp.pad(x_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((R, C), jnp.float32)
    for t, tap in enumerate(taps(xp)):
        acc = acc + jnp.dot(tap, w_ref[t, :C, :C], preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(DT).reshape(1, H, W, C)


def k_im2col(x_ref, w_ref, o_ref):
    xp = jnp.pad(x_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    cat = jnp.concatenate(taps(xp), axis=-1)
    acc = jnp.dot(cat, w_ref[...].reshape(9 * 128, 128)[: 9 * C, :C],
                  preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(DT).reshape(1, H, W, C)


# Pair-packed variants: input ALREADY stored (N, H, W/2, 128) in HBM — Mosaic
# rejects the in-kernel (1,64,64,64)->(2048,128) shape cast (lane-dim change),
# so the packed layout must live at the HBM level. Conv taps in packed space
# are plain block shifts; parity crossover lives in the (128,128) weights.
def k_pack128(x_ref, w_ref, o_ref):
    xp = jnp.pad(x_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((R // 2, 2 * C), jnp.float32)
    for t, (ky, kx) in enumerate(_OFFS):
        tap = xp[0, ky : ky + H, kx : kx + W // 2, :].reshape(R // 2, 2 * C)
        acc = acc + jnp.dot(tap, w_ref[t], preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(DT).reshape(1, H, W // 2, 2 * C)


def k_packcol(x_ref, w_ref, o_ref):
    xp = jnp.pad(x_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    cat = jnp.concatenate(
        [
            xp[0, ky : ky + H, kx : kx + W // 2, :].reshape(R // 2, 2 * C)
            for ky, kx in _OFFS
        ],
        axis=-1,
    )  # (2048, 1152)
    acc = jnp.dot(cat, w_ref[...].reshape(9 * 2 * C, 2 * C),
                  preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(DT).reshape(1, H, W // 2, 2 * C)


def make(kernel, wshape, packed=False):
    hw = (H, W // 2, 2 * C) if packed else (H, W, C)
    return jax.jit(
        pl.pallas_call(
            kernel,
            grid=(NIMG,),
            in_specs=[
                pl.BlockSpec((1, *hw), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec(wshape, lambda i: (0,) * len(wshape)),
            ],
            out_specs=pl.BlockSpec((1, *hw), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((NIMG, *hw), DT),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        )
    )


def timed(fn, x, w, n=30):
    r = fn(x, w)
    float(jnp.sum(r[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(x, w)
    float(jnp.sum(r[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (NIMG, H, W, C)), DT)
xpk = jnp.asarray(rng.normal(0, 1, (NIMG, H, W // 2, 2 * C)), DT)
w128 = jnp.asarray(rng.normal(0, 0.05, (9, 128, 128)), DT)

# conv-equivalent FLOPs (the useful work, not the padded-zero work)
FL = 2.0 * NIMG * R * 9 * C * C
for name, kern, wsh, flops, packed in [
    ("shift64 ", k_shift64, (9, 128, 128), FL, False),
    ("im2col  ", k_im2col, (9, 128, 128), FL, False),
    ("pack128 ", k_pack128, (9, 128, 128), FL, True),
    ("packcol ", k_packcol, (9, 128, 128), FL, True),
]:
    f = make(kern, wsh, packed)
    ms = timed(f, xpk if packed else x, w128)
    tf = flops / (ms / 1e3) / 1e12
    print(f"{name}: {ms:6.2f} ms  useful {tf:6.1f} TF/s", flush=True)

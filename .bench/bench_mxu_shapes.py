"""Bare Pallas matmul throughput vs (M, K, N, G): separates per-grid-step
overhead from MXU shape penalties at the flagship's awkward geometries
(N=64 outputs at stage 0 / the stem). Each case: grid of 256/G steps, one
(G*M, K) @ (K, N) f32-accum matmul per step, bf16 operands.

Usage: python .bench/bench_mxu_shapes.py
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

NIMG = 256
DT = jnp.bfloat16


def mm_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jnp.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def make(M, K, N, G):
    return jax.jit(
        pl.pallas_call(
            mm_kernel,
            grid=(NIMG // G,),
            in_specs=[
                pl.BlockSpec((G * M, K), lambda i: (i, 0)),
                pl.BlockSpec((K, N), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((G * M, N), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((NIMG * M, N), DT),
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
# (M_per_img, K, N, G)  — per-IMAGE M; the grid covers 256 images total
CASES = [
    (4096, 576, 64, 1),   # stage0 conv2 im2col shape
    (4096, 576, 64, 4),   # same, 4 images per grid step
    (4096, 576, 128, 1),  # N padded to one full lane tile
    (4096, 576, 256, 1),  # stem im2col shape
    (4096, 256, 64, 1),   # stage0 conv1
    (4096, 64, 256, 1),   # stage0 conv3
    (4096, 512, 512, 1),  # healthy control (stage-1-ish)
]
for M, K, N, G in CASES:
    x = jnp.asarray(rng.normal(0, 1, (NIMG * M // 1, K)), DT)
    w = jnp.asarray(rng.normal(0, 0.05, (K, N)), DT)
    f = make(M, K, N, G)
    ms = timed(f, x, w)
    tf = 2.0 * NIMG * M * K * N / (ms / 1e3) / 1e12
    print(
        f"M={M:5d} K={K:4d} N={N:4d} G={G}:  {ms:6.2f} ms  {tf:6.1f} TF/s "
        f"({tf / 197 * 100:4.1f}% peak)",
        flush=True,
    )

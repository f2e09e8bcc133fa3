"""Decision experiment for round 3's 'whole-residual-stage Pallas kernel' lever:
a fused bottleneck-block FORWARD (conv1x1 -> bn -> relu -> conv3x3 -> bn -> relu
-> conv1x1 -> bn -> +residual -> relu) as ONE Pallas kernel, one image per grid
step, everything VMEM-resident (stage-0 geometry: 64x64 spatial, 256->64->64->256
channels, frozen-BN affines folded into the weights).

Bytes: XLA materializes h1/h2/y3 (+ mask-packs) between conv custom-calls
(~12 MB/img of traffic); the fused kernel reads x+residual and writes out
(~6 MB/img). If the kernel can't beat XLA's forward chain here — its best case,
zero layout interference measured at the boundaries separately — the
whole-stage project is not worth a round.

Usage: python .bench/bench_blockfwd.py [N=256]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
H = W = 64
CIN, F, COUT = 256, 64, 256  # stage-0 bottleneck
DT = jnp.bfloat16


def _kernel(x_ref, r_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref):
    x = x_ref[0].reshape(H * W, CIN)  # (4096, 256)
    # conv1 (1x1) + affine + relu
    h1 = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[...].astype(jnp.float32), 0.0).astype(DT)
    h1 = h1.reshape(H, W, F)
    # conv2 (3x3, pad 1) as 9 shifted matmuls, accumulated in f32; shifts via a
    # zero-padded copy + static slices (concat + slice — Mosaic-friendly)
    padded = jnp.pad(h1, ((1, 1), (1, 1), (0, 0)))
    h2 = jnp.zeros((H * W, F), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            shifted = padded[ky : ky + H, kx : kx + W].reshape(H * W, F)
            h2 = h2 + jnp.dot(
                shifted, w2_ref[ky, kx], preferred_element_type=jnp.float32
            )
    h2 = jnp.maximum(h2 + b2_ref[...].astype(jnp.float32), 0.0).astype(DT)
    # conv3 (1x1) + affine + residual + relu
    y = jnp.dot(h2, w3_ref[...], preferred_element_type=jnp.float32)
    y = y + b3_ref[...].astype(jnp.float32) + r_ref[0].reshape(H * W, COUT).astype(jnp.float32)
    out_ref[0] = jnp.maximum(y, 0.0).astype(DT).reshape(H, W, COUT)


@jax.jit
def fused_block(x, res, w1, b1, w2, b2, w3, b3):
    return pl.pallas_call(
        _kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H, W, CIN), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, H, W, COUT), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((CIN, F), lambda i: (0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((3, 3, F, F), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((F, COUT), lambda i: (0, 0)),
            pl.BlockSpec((1, COUT), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W, COUT), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, COUT), DT),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x, res, w1, b1, w2, b2, w3, b3)


@jax.jit
def xla_block(x, res, w1, b1, w2, b2, w3, b3):
    h1 = jax.lax.conv_general_dilated(
        x, w1.reshape(1, 1, CIN, F), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.float32,
    )
    h1 = jnp.maximum(h1 + b1, 0.0).astype(DT)
    h2 = jax.lax.conv_general_dilated(
        h1, w2.transpose(0, 1, 2, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.float32,
    )
    h2 = jnp.maximum(h2 + b2, 0.0).astype(DT)
    y = jax.lax.conv_general_dilated(
        h2, w3.reshape(1, 1, F, COUT), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=jnp.float32,
    )
    return jnp.maximum(y + b3 + res.astype(jnp.float32), 0.0).astype(DT)


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (N, H, W, CIN)), DT)
res = jnp.asarray(rng.normal(0, 1, (N, H, W, COUT)), DT)
w1 = jnp.asarray(rng.normal(0, 0.05, (CIN, F)), DT)
w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, F, F)), DT)
w3 = jnp.asarray(rng.normal(0, 0.05, (F, COUT)), DT)
b1 = jnp.asarray(rng.normal(0, 0.1, (1, F)), jnp.float32)
b2 = jnp.asarray(rng.normal(0, 0.1, (1, F)), jnp.float32)
b3 = jnp.asarray(rng.normal(0, 0.1, (1, COUT)), jnp.float32)

for name, fn in (("xla", xla_block), ("pallas-fused", fused_block)):
    t0 = time.perf_counter()
    out = fn(x, res, w1, b1, w2, b2, w3, b3)
    s = float(jnp.sum(out.astype(jnp.float32)))
    print(f"{name}: compile {time.perf_counter()-t0:.0f}s  checksum {s:.1f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(20):
        out = fn(x, res, w1, b1, w2, b2, w3, b3)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / 20
    print(f"{name}: {dt*1e3:.2f} ms for N={N} block fwd", flush=True)

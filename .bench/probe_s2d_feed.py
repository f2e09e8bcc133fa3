"""Price the augment->stem feed chain: the augment kernel emits channel-first
(N, 3, H, W); the fused stem consumes a space-to-depth (N, H/4, W/4, 48) in
Pallas default layout. Current chain: transpose to NHWC (copy.218, 0.76 ms at
B=256) -> one-hot stride-4 conv (fusion.383, 0.82) -> layout copy (copy.245,
1.56). Variants:

  nhwc    : transpose + NHWC-dims conv (current)
  nchw    : one-hot conv with ("NCHW","HWIO","NHWC") dims straight from the
            channel-first array (no explicit transpose)

Usage: python .bench/probe_s2d_feed.py
"""
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

N, H, W = 512, 256, 256
DT = jnp.bfloat16
HS, WS = H // 4, W // 4


def s2d_kernel(c):
    """(4,4,C,16C) one-hot: out[(sy*4+sx)*C + ci] = x[4u+sy, 4v+sx, ci]."""
    k = np.zeros((4, 4, c, 16 * c), np.float32)
    for sy in range(4):
        for sx in range(4):
            for ci in range(c):
                k[sy, sx, ci, (sy * 4 + sx) * c + ci] = 1.0
    return k


K = jnp.asarray(s2d_kernel(3), DT)


def consumer():
    def kernel(x_ref, o_ref):
        x = x_ref[...].reshape(-1, 48)
        s = jnp.sum(x.astype(jnp.float32), axis=0, keepdims=True)
        o_ref[...] = jnp.pad(s, ((0, 0), (0, 128 - 48)))

    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, HS, WS, 48), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )


def route_nhwc(x_cf):
    x = jnp.transpose(x_cf, (0, 2, 3, 1))  # the train-loop transpose-back
    y = jax.lax.conv_general_dilated(
        x, K, (4, 4), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return consumer()(y)


def route_nchw(x_cf):
    y = jax.lax.conv_general_dilated(
        x_cf, K, (4, 4), "VALID", dimension_numbers=("NCHW", "HWIO", "NHWC")
    )
    return consumer()(y)


rng = np.random.default_rng(0)
x_cf = jnp.asarray(rng.random((N, 3, H, W)), DT)

for name, fn in [("nhwc", jax.jit(route_nhwc)), ("nchw", jax.jit(route_nchw))]:
    try:
        r = fn(x_cf)
        float(jnp.sum(r))
        t0 = time.perf_counter()
        for _ in range(30):
            r = fn(x_cf)
        float(jnp.sum(r))
        ms = (time.perf_counter() - t0) / 30 * 1e3
        print(f"{name}: {ms:6.3f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

a = np.asarray(jax.jit(route_nhwc)(x_cf))
b = np.asarray(jax.jit(route_nchw)(x_cf))
print("values equal:", np.allclose(a, b, atol=1e-2))

"""Fused-stem kernel timing: pallas stem (conv7x7/s2+BN+relu+maxpool, fwd+wgrad)
vs the XLA stem autodiff at flagship geometry (N=256, 256x256, bf16), isolated.

The trace said the XLA stem region costs ~27 ms of the 100 ms fused step
(17 ms compute + 10 ms boundary copies); this isolates the kernel-vs-kernel
comparison (boundary copies excluded — those only vanish end-to-end).
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.ops.pallas.stem_fused import fused_stem_pool

N, HW = 256, 256
DT = jnp.bfloat16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (N, HW, HW, 3)), DT)
k7 = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 64)), jnp.float32)
scale = jnp.asarray(rng.uniform(0.5, 1.5, (64,)), jnp.float32)
bias = jnp.asarray(rng.normal(0, 0.3, (64,)), jnp.float32)
mean = jnp.asarray(rng.normal(0, 0.3, (64,)), jnp.float32)
var = jnp.asarray(rng.uniform(0.5, 1.5, (64,)), jnp.float32)


def timed(fn, n=20):
    v, g = fn(k7)
    float(v)
    t0 = time.perf_counter()
    for _ in range(n):
        v, g = fn(k7)
    float(v)
    return (time.perf_counter() - t0) / n * 1e3


GS = [int(a) for a in sys.argv[1:]] or [1]


def make_pallas_vg(gsz):
    @jax.jit
    def pallas_vg(k7v):
        def loss(k7v):
            out = fused_stem_pool(x, k7v, scale, bias, mean, var, impl="pallas", gsz=gsz)
            return jnp.sum(out.astype(jnp.float32))
        return jax.value_and_grad(loss)(k7v)
    return pallas_vg


@jax.jit
def xla_vg(k7v):
    def loss(k7v):
        y = jax.lax.conv_general_dilated(
            x, k7v.astype(DT), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        c = scale * jax.lax.rsqrt(var + 1e-5)
        y = jnp.maximum(y.astype(jnp.float32) * c + (bias - mean * c), 0.0).astype(DT)
        out = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )
        return jnp.sum(out.astype(jnp.float32))
    return jax.value_and_grad(loss)(k7v)


def timed_fwd(fn, n=20):
    v = fn(k7)
    float(v)
    t0 = time.perf_counter()
    for _ in range(n):
        v = fn(k7)
    float(v)
    return (time.perf_counter() - t0) / n * 1e3


tx = timed(xla_vg)
for gsz in GS:
    tp = timed(make_pallas_vg(gsz))

    @jax.jit
    def pallas_f(k7v, gsz=gsz):
        return jnp.sum(
            fused_stem_pool(x, k7v, scale, bias, mean, var, impl="pallas", gsz=gsz).astype(jnp.float32)
        )

    tf = timed_fwd(pallas_f)
    print(
        f"stem N={N} {HW}x{HW} G={gsz}: pallas {tp:.2f} ms (fwd {tf:.2f})  "
        f"xla {tx:.2f} ms  ({tx/tp:.2f}x)",
        flush=True,
    )

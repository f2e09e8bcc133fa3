"""Round-3 decision experiment, part 2: fused whole-block BACKWARD (in-VMEM
recompute, single pass) vs XLA autodiff of the same block. Stage-0 geometry.
Usage: python .bench/bench_blockbwd.py [N=256]
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.ops.pallas.block_fused import (
    _block,
    _block_bwd_saved_pallas,
    _block_fwd_save_pallas,
    _xla_forward,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
H = W = 64
CIN, F = 256, 64
DT = jnp.bfloat16

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (N, H, W, CIN)), DT)
w1 = jnp.asarray(rng.normal(0, 0.05, (CIN, F)), DT)
w2 = jnp.asarray(rng.normal(0, 0.05, (3, 3, F, F)), DT)
w3 = jnp.asarray(rng.normal(0, 0.05, (F, CIN)), DT)
b1 = jnp.asarray(rng.normal(0, 0.1, (1, F)), jnp.float32)
b2 = jnp.asarray(rng.normal(0, 0.1, (1, F)), jnp.float32)
b3 = jnp.asarray(rng.normal(0, 0.1, (1, CIN)), jnp.float32)


@jax.jit
def grads_autodiff(x, w1, w2, w3):
    def f(x, w1, w2, w3):
        return jnp.sum(_xla_forward(x, w1, b1, w2, b2, w3, b3).astype(jnp.float32))

    return jax.grad(f, argnums=(0, 1, 2, 3))(x, w1, w2, w3)


@jax.jit
def grads_fused(x, w1, w2, w3):
    def f(x, w1, w2, w3):
        return jnp.sum(_block(x, w1, b1, w2, b2, w3, b3, "pallas", False).astype(jnp.float32))

    return jax.grad(f, argnums=(0, 1, 2, 3))(x, w1, w2, w3)


@jax.jit
def grads_fused_saved(x, w1, w2, w3):
    # saved-residuals variant: fwd emits h1/h2, bwd skips the recompute
    out, h1, h2 = _block_fwd_save_pallas(x, w1, b1, w2, b2, w3, b3, False)
    g = jnp.ones_like(out)
    dx, dw1, dw2, dw3 = _block_bwd_saved_pallas(x, g, out, h1, h2, w1, w2, w3, False)
    return dx, dw1, dw2, dw3


for name, fn in (
    ("xla-autodiff fwd+bwd", grads_autodiff),
    ("pallas-fused fwd+bwd", grads_fused),
    ("pallas-saved fwd+bwd", grads_fused_saved),
):
    t0 = time.perf_counter()
    g = fn(x, w1, w2, w3)
    cs = float(jnp.sum(jnp.abs(g[0].astype(jnp.float32)))) + float(jnp.sum(jnp.abs(g[1])))
    print(f"{name}: compile {time.perf_counter()-t0:.0f}s  checksum {cs:.1f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(20):
        g = fn(x, w1, w2, w3)
    float(jnp.sum(g[1]))
    dt = (time.perf_counter() - t0) / 20
    print(f"{name}: {dt*1e3:.2f} ms for N={N}", flush=True)

"""Stem backward decomposition: the trace shows the stem wgrad custom call at
6.44 ms/step while its 9 wgrad matmuls alone measure ~3.9 ms isolated — where
do the other ~2.5 ms go? Variants of the real kernel:

  full   — the shipped _stem_bwd_kernel (first-match pool routing + mask + wgrad)
  nopool — pool routing stubbed (g routed to parity (0,0) unshifted); keeps
           relu mask + wgrad. The delta bounds the pool-backward VPU cost.
  nomm   — pool routing + mask kept, the 9 wgrad matmuls replaced by one
           per-image (48,256) outer product; bounds the matmul cost.

Usage: python .bench/bench_stem_bwd.py
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

from argus_tpu.ops.pallas import stem_fused as SF

N, HS, WS = 256, 64, 64
DT = jnp.bfloat16


def _wgrad(x4p, dacc, a_ref, R):
    for t, (dy, dx) in enumerate(SF._OFFS):
        tap = x4p[:, 1 + dy : 1 + dy + HS, 1 + dx : 1 + dx + WS, :].reshape(R, 48)
        a_ref[t] += jax.lax.dot_general(
            tap, dacc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )


def kernel_nopool(x4_ref, g_ref, out_ref, yg_ref, dw_ref, a_ref, *, G):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)

    x4p = jnp.pad(x4_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    yg = yg_ref[...]
    g = g_ref[...].astype(jnp.float32)
    R = G * HS * WS
    zeros = jnp.zeros((G, HS, WS, 64), jnp.float32)
    dpacked = jnp.concatenate([g, zeros, zeros, zeros], axis=-1).reshape(R, 256)
    mask = (yg.reshape(R, 256).astype(jnp.float32) > 0.0).astype(jnp.float32)
    dacc = (dpacked * mask).astype(x4_ref.dtype)
    _wgrad(x4p, dacc, a_ref, R)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = a_ref[...]


def kernel_nomm(x4_ref, g_ref, out_ref, yg_ref, dw_ref, a_ref, *, G):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)

    x4p = jnp.pad(x4_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    yg = yg_ref[...]
    yg_p = jnp.pad(yg, ((0, 0), (1, 0), (1, 0), (0, 0)))
    g = g_ref[...].astype(jnp.float32)
    pool_f = out_ref[...].astype(jnp.float32)
    taken = jnp.zeros((G, HS, WS, 64), jnp.float32)
    dsl = {(p, q): jnp.zeros((G, HS, WS, 64), jnp.float32) for p in (0, 1) for q in (0, 1)}
    for term, dA, p, dB, q in SF._pool_terms(yg_p, HS, WS):
        take = (term.astype(jnp.float32) == pool_f).astype(jnp.float32) * (1.0 - taken)
        taken = taken + take
        contrib = g * take
        if dA == -1:
            contrib = jnp.pad(contrib[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
        if dB == -1:
            contrib = jnp.pad(contrib[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
        dsl[(p, q)] = dsl[(p, q)] + contrib
    R = G * HS * WS
    dpacked = jnp.concatenate(
        [dsl[(0, 0)], dsl[(0, 1)], dsl[(1, 0)], dsl[(1, 1)]], axis=-1
    ).reshape(R, 256)
    mask = (yg.reshape(R, 256).astype(jnp.float32) > 0.0).astype(jnp.float32)
    dacc = (dpacked * mask).astype(x4_ref.dtype)
    # one cheap matmul standing in for the nine wgrads
    a_ref[0] += jax.lax.dot_general(
        x4p[:, 1 : 1 + HS, 1 : 1 + WS, :].reshape(R, 48), dacc,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = a_ref[...]


def run(kernel_fn):
    f = pl.pallas_call(
        functools.partial(kernel_fn, G=1),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, HS, WS, 48), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, HS, WS, 64), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, HS, WS, 64), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, HS, WS, 256), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((9, 48, 256), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((9, 48, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((9, 48, 256), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )
    return jax.jit(f)


def timed(fn, args, n=30):
    r = fn(*args)
    float(jnp.sum(r[0, 0, :8]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(jnp.sum(r[0, 0, :8]))
    return (time.perf_counter() - t0) / n * 1e3


rng = np.random.default_rng(0)
x4 = jnp.asarray(rng.normal(0, 1, (N, HS, WS, 48)), DT)
g = jnp.asarray(rng.normal(0, 1, (N, HS, WS, 64)), DT)
out = jnp.asarray(np.abs(rng.normal(0, 1, (N, HS, WS, 64))), DT)
yg = jnp.asarray(np.maximum(rng.normal(0, 1, (N, HS, WS, 256)), 0), DT)

full = run(functools.partial(SF._stem_bwd_kernel, HS=HS, WS=WS))
print(f"full  : {timed(full, (x4, g, out, yg)):6.2f} ms", flush=True)
print(f"nopool: {timed(run(kernel_nopool), (x4, g, out, yg)):6.2f} ms", flush=True)
print(f"nomm  : {timed(run(kernel_nomm), (x4, g, out, yg)):6.2f} ms", flush=True)

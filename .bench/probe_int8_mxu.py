"""Probe: does Mosaic lower int8 dot_general to the v5e MXU at 2x bf16 rate?

Times a K-looped matmul kernel at flagship chain geometries, bf16 vs int8
(int32 accumulate). If int8 lands ~2x, the frozen no-save forward chains
(fwd-only, stop-gradient upstream) can run their matmuls in int8 with
per-tensor scales — quant/dequant stays in VMEM so the round-3 standalone-conv
negative result (quant passes eating the win in HBM) does not apply.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")


def _mm_kernel(x_ref, w_ref, o_ref, *, reps, acc_dtype):
    x = x_ref[...]
    w = w_ref[...]

    def body(i, acc):
        # fold the loop index into x so the compiler can't hoist the dot
        xi = x + x.dtype.type(0) if x.dtype == jnp.int8 else x
        return acc + jax.lax.dot_general(
            xi, w, (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype
        )

    acc = jax.lax.fori_loop(0, reps, body, jnp.zeros(o_ref.shape, acc_dtype))
    o_ref[...] = acc


def run(M, K, N, dtype, acc_dtype, reps=400, iters=8):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 127, (M, K), np.int8))
        w = jnp.asarray(rng.integers(-127, 127, (K, N), np.int8))
    else:
        x = jnp.asarray(rng.standard_normal((M, K)), dtype)
        w = jnp.asarray(rng.standard_normal((K, N)), dtype)
    fn = pl.pallas_call(
        functools.partial(_mm_kernel, reps=reps, acc_dtype=acc_dtype),
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
    )
    f = jax.jit(fn)
    o = f(x, w)
    _ = float(jnp.asarray(o, jnp.float32)[0, 0])  # force through tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(x, w)
    _ = float(jnp.asarray(o, jnp.float32)[0, 0])
    dt = (time.perf_counter() - t0) / iters
    tf = 2 * M * K * N * reps / dt / 1e12
    return dt * 1e3, tf


if __name__ == "__main__":
    for (M, K, N) in [(2048, 512, 512), (4096, 256, 64), (2048, 1024, 256)]:
        try:
            ms_b, tf_b = run(M, K, N, jnp.bfloat16, jnp.float32)
            print(f"bf16 ({M},{K})@({K},{N}): {ms_b:.3f} ms, {tf_b:.1f} TF/s", flush=True)
        except Exception as e:
            print(f"bf16 ({M},{K},{N}) FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        try:
            ms_i, tf_i = run(M, K, N, jnp.int8, jnp.int32)
            print(f"int8 ({M},{K})@({K},{N}): {ms_i:.3f} ms, {tf_i:.1f} TOP/s", flush=True)
        except Exception as e:
            print(f"int8 ({M},{K},{N}) FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

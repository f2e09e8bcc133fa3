"""Price three routes to hand a Pallas kernel the pair-packed (N,64,32,128)
view of a (N,64,64,64) array: one-hot stride-(1,2) conv (current), plain
jnp.reshape (linear-order identity — maybe a bitcast, maybe a tiled-layout
copy), and a baseline that feeds unpacked (kernel reads (N,64,64,64)).

Usage: python .bench/probe_pack_feed.py
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

from argus_tpu.ops.pallas.stage_fused import _pack_cols_conv

N, H, W, C = 512, 64, 64, 64
DT = jnp.bfloat16


def consumer(hw):
    def kernel(x_ref, o_ref):
        x = x_ref[...].reshape(-1, hw[-1])
        s = jnp.sum(x.astype(jnp.float32), axis=0, keepdims=True)
        if s.shape[1] < 128:
            s = jnp.pad(s, ((0, 0), (0, 128 - s.shape[1])))
        o_ref[...] = s[:, :128]

    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, *hw), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 1, (N, H, W, C)), DT)

routes = {
    "unpacked": jax.jit(lambda v: consumer((H, W, C))(v)),
    "conv_pack": jax.jit(lambda v: consumer((H, W // 2, 2 * C))(_pack_cols_conv(v))),
    "reshape_pack": jax.jit(
        lambda v: consumer((H, W // 2, 2 * C))(v.reshape(N, H, W // 2, 2 * C))
    ),
}

for name, fn in routes.items():
    r = fn(x)
    float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(30):
        r = fn(x)
    float(jnp.sum(r))
    ms = (time.perf_counter() - t0) / 30 * 1e3
    print(f"{name:14s}: {ms:6.3f} ms", flush=True)

# value check: reshape == conv pack
a = np.asarray(_pack_cols_conv(x))
b = np.asarray(x.reshape(N, H, W // 2, 2 * C))
print("pack forms equal:", np.array_equal(a, b))

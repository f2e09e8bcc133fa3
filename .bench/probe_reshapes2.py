"""Round 2: isolate each primitive needed for a FULLY-2D packed conv2.

  p1 merge2d   : (4096,64) -> (2048,128) after a dot       [proven OK round 1]
  p2 split2d   : (2048,128) -> (4096,64) after a dot, then dot
  p3 rowext    : zero-row concat + 9 shifted row slices + iota mask + dots
  p4 iota      : broadcasted_iota-derived (rows,1) mask multiply

Usage: python .bench/probe_reshapes2.py
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

H, W, F = 64, 64, 64
R, Rh, F2, Wp = H * W, H * W // 2, 2 * F, W // 2
DT = jnp.bfloat16


def k_split2d(x_ref, w_ref, o_ref):
    x2 = x_ref[...].reshape(R, F)
    y = jnp.dot(x2, w_ref[:F, :F], preferred_element_type=jnp.float32)
    yp = y.astype(DT).reshape(Rh, F2)          # 2D merge (known OK)
    z = jnp.dot(yp, w_ref[...], preferred_element_type=jnp.float32)  # real op
    back = z.astype(DT).reshape(R, F)          # 2D SPLIT under test
    o_ref[...] = jnp.dot(back, w_ref[:F, :F], preferred_element_type=jnp.float32).astype(DT).reshape(1, H, W, F)


def k_iota_mask(x_ref, w_ref, o_ref):
    x2 = x_ref[...].reshape(R, F)
    y = jnp.dot(x2, w_ref[:F, :F], preferred_element_type=jnp.float32)
    yp = y.astype(DT).reshape(Rh, F2)
    j = jax.lax.broadcasted_iota(jnp.int32, (Rh, 1), 0) % Wp
    mask = (j != 0).astype(jnp.float32)
    t = (yp.astype(jnp.float32) * mask).astype(DT)
    o_ref[...] = t.reshape(R, F).reshape(1, H, W, F)


def k_rowext(x_ref, w_ref, o_ref):
    x2 = x_ref[...].reshape(R, F)
    y = jnp.dot(x2, w_ref[:F, :F], preferred_element_type=jnp.float32)
    yp = y.astype(DT).reshape(Rh, F2)
    z = jnp.zeros((Wp + 1, F2), DT)
    ext = jnp.concatenate([z, yp, z], axis=0)
    j = jax.lax.broadcasted_iota(jnp.int32, (Rh, 1), 0) % Wp
    ml = (j != 0).astype(jnp.float32)
    mr = (j != Wp - 1).astype(jnp.float32)
    acc = jnp.zeros((Rh, F2), jnp.float32)
    for ky in range(3):
        for b in range(3):
            s = (ky - 1) * Wp + (b - 1) + (Wp + 1)
            tap = ext[s : s + Rh]
            if b == 0:
                tap = (tap.astype(jnp.float32) * ml).astype(DT)
            if b == 2:
                tap = (tap.astype(jnp.float32) * mr).astype(DT)
            acc = acc + jnp.dot(tap, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(DT).reshape(R, F).reshape(1, H, W, F)


def probe(name, kernel):
    f = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[
            pl.BlockSpec((1, H, W, F), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((F2, F2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W, F), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((4, H, W, F), DT),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )
    x = jax.ShapeDtypeStruct((4, H, W, F), DT)
    w = jax.ShapeDtypeStruct((F2, F2), DT)
    try:
        t0 = time.perf_counter()
        jax.jit(f).lower(x, w).compile()
        print(f"{name:12s}: OK ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e)
        if "The MLIR operation involved:" in msg:
            op = msg.split("The MLIR operation involved:")[1].strip().splitlines()[0]
        else:
            op = msg[:120].replace("\n", " ")
        print(f"{name:12s}: FAIL {op}", flush=True)


for name, kern in [("split2d", k_split2d), ("iota_mask", k_iota_mask), ("rowext", k_rowext)]:
    probe(name, kern)

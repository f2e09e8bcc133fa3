"""Probe lane-constant unpack routes for (Rh, 2F) -> (R, F) at F=64:
  u1: lane slices -> (G,H,Wp,F) -> stack axis=3 -> (G,H,W,F) row merge
  u2: same but stack axis=2 equivalent via transpose-free H-interleave control
  p1: the concat pack (known compiling) as a sanity control
AOT, chipless. Usage: python .bench/probe_unpack.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

G, H, W, F = 1, 64, 64, 64
R, Rh, Wp, F2 = H * W, H * W // 2, W // 2, 2 * F
DT = jnp.bfloat16


def k_u1(x_ref, w_ref, o_ref):
    x2 = x_ref[...].reshape(R, F)
    a = x2.reshape(Rh, 2, F)
    vp = jnp.concatenate([a[:, 0, :], a[:, 1, :]], axis=-1)  # pack (control)
    y = jnp.dot(vp, w_ref[...], preferred_element_type=jnp.float32).astype(DT)
    even = y[:, :F]
    odd = y[:, F:]
    e4 = even.reshape(G, H, Wp, F)
    o4 = odd.reshape(G, H, Wp, F)
    st = jnp.stack([e4, o4], axis=3)  # (G,H,Wp,2,F) under test
    out = st.reshape(G, H, W, F)
    o_ref[...] = out


def k_u2(x_ref, w_ref, o_ref):
    x2 = x_ref[...].reshape(R, F)
    a = x2.reshape(Rh, 2, F)
    vp = jnp.concatenate([a[:, 0, :], a[:, 1, :]], axis=-1)
    y = jnp.dot(vp, w_ref[...], preferred_element_type=jnp.float32).astype(DT)
    e4 = y[:, :F].reshape(G, H, Wp, F)
    o4 = y[:, F:].reshape(G, H, Wp, F)
    # concat along a fresh W-adjacent axis via explicit broadcast-free route:
    # pad each to (G,H,Wp,2F) at disjoint lane halves, add, then 'view' rows
    ez = jnp.pad(e4, ((0, 0), (0, 0), (0, 0), (0, F)))
    oz = jnp.pad(o4, ((0, 0), (0, 0), (0, 0), (F, 0)))
    st = ez + oz  # (G,H,Wp,2F) = packed again; interleave via 5D row path:
    v5 = st.reshape(G, H, Wp, 2, F)  # lane SPLIT 2F->(2,F) under test
    out = v5.reshape(G, H, W, F)
    o_ref[...] = out


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
    try:
        t0 = time.perf_counter()
        jax.jit(f).lower(
            jax.ShapeDtypeStruct((4, H, W, F), DT), jax.ShapeDtypeStruct((F2, F2), DT)
        ).compile()
        print(f"{name}: OK ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e)
        if "The MLIR operation involved:" in msg:
            op = msg.split("The MLIR operation involved:")[1].strip().splitlines()[0]
        else:
            op = msg[:140].replace("\n", " ")
        print(f"{name}: FAIL {op}", flush=True)


probe("u1_stack_axis3", k_u1)
probe("u2_lane_split5", k_u2)

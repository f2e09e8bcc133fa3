"""Mosaic reshape-acceptance probe: AOT-compile minimal kernels exercising
candidate repack forms for the pair-packed conv2, ~1 min each, no chip time.
Learned so far: (4096,64)->(1,64,32,128) REJECTED; (2048,64)->(2048,1,64)
(jnp.stack) REJECTED; proj_fused's pad->(G,H2//2,2,W2//2,2F) ACCEPTED.

Usage: python .bench/probe_reshapes.py
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

H, W, F = 64, 64, 64
DT = jnp.bfloat16


def k_merge4d(x_ref, o_ref):
    """(1,64,64,64) -> (1,64,32,128) straight from the block read."""
    v = x_ref[...].reshape(1, H, W // 2, 2 * F)
    o_ref[...] = (v * jnp.asarray(2, DT)).reshape(1, H, W, F)


def k_pad_merge(x_ref, o_ref):
    """pad (real op) then (1,66,66,64) -> (1,66,33,128) trailing merge."""
    p = jnp.pad(x_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    v = p.reshape(1, H + 2, (W + 2) // 2, 2 * F)
    s = v[:, 1 : 1 + H, 1 : 1 + W // 2, :]  # (1,64,32,128)
    o_ref[...] = (s * jnp.asarray(2, DT)).reshape(1, H, W, F)


def k_pad_merge5(x_ref, o_ref):
    """pad then the known-good 5D stride2-tap form (1,33,2,33,128)."""
    p = jnp.pad(x_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    v = p.reshape(1, (H + 2) // 2, 2, (W + 2) // 2, 2 * F)
    s = v[:, : H // 2, 0, : W // 2, :]  # (1,32,32,128)
    t = s * jnp.asarray(2, DT)
    o_ref[...] = jnp.concatenate([t, t], axis=1).reshape(1, H, W, F)


def k_unmerge(x_ref, o_ref):
    """packed (from a dot, real op) -> (1,64,32,128) -> lane-split back."""
    x2 = x_ref[...].reshape(H * W, F)
    y = jnp.dot(x2, jnp.eye(F, dtype=DT), preferred_element_type=jnp.float32)
    y = y.astype(DT).reshape(H * W // 2, 2 * F)  # fused: (4096,64)->(2048,128)
    o_ref[...] = y.reshape(1, H, W, F)


def k_rowsplit_then_merge(x_ref, o_ref):
    """(2048,128) result -> (1,64,32,128) rowsplit -> real op -> (1,64,64,64)."""
    x4 = x_ref[...]
    p = jnp.pad(x4, ((0, 0), (0, 0), (1, 1), (0, 0)))  # (1,64,66,64)
    v = p.reshape(1, H, (W + 2) // 2, 2 * F)  # pad-backed merge
    t = v[:, :, 1 : 1 + W // 2, :] * jnp.asarray(2, DT)  # (1,64,32,128) real op
    o_ref[...] = t.reshape(1, H, W, F)  # lane-split + row shape keep


def k_concat_pack(x_ref, o_ref):
    """2D concat pack: (4096,64)->(2048,2,64) rowsplit, slices, lane concat."""
    x2 = x_ref[...].reshape(H * W, F)
    a = x2.reshape(H * W // 2, 2, F)
    cat = jnp.concatenate([a[:, 0, :], a[:, 1, :]], axis=-1)  # (2048,128)
    t = cat * jnp.asarray(2, DT)
    b = t.reshape(H * W // 2, 2, F)  # lane-split back?
    o_ref[...] = jnp.concatenate([b[:, 0], b[:, 1]], axis=1).reshape(1, H, W, F)


def probe(name, kernel):
    f = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec((1, H, W, F), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, H, W, F), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((4, H, W, F), DT),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )
    x = jax.ShapeDtypeStruct((4, H, W, F), DT)
    try:
        t0 = time.perf_counter()
        jax.jit(f).lower(x).compile()
        print(f"{name:24s}: OK ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e)
        key = "unsupported shape cast" if "shape cast" in msg else msg[:120].replace("\n", " ")
        print(f"{name:24s}: FAIL {key}", flush=True)


for name, kern in [
    ("merge4d", k_merge4d),
    ("pad_merge", k_pad_merge),
    ("pad_merge5", k_pad_merge5),
    ("unmerge_after_dot", k_unmerge),
    ("rowsplit_then_merge", k_rowsplit_then_merge),
    ("concat_pack", k_concat_pack),
]:
    probe(name, kern)

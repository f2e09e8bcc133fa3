"""Probe the 5D pack route for the pair-packed conv2 (the only
lane-size-changing reshapes Mosaic accepts are the proj_fused stride-2 5D
patterns): pad((1,1),(2,2)) -> (G,(H+2)/2,2,(W+4)/2,2F) view -> 18 half-row
taps -> matmuls -> stack -> 5D unpack -> relu -> (R,F) -> dot. AOT-compiles
(~1 min, chipless) then (if TPU up) times it against the shifted form.

Usage: python .bench/probe_pack5.py [time]
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
R, F2, A, B = H * W, 2 * F, H // 2, W // 2
DT = jnp.bfloat16


def pack5_conv(h1_2d, w2p, G):
    """Packed 3x3 conv: (G*H*W, F) -> (G*H*W, F) f32, w2p (9, 2F, 2F)."""
    h4 = h1_2d.reshape(G, H, W, F)
    p4 = jnp.pad(h4, ((0, 0), (1, 1), (2, 2), (0, 0)))
    v5 = p4.reshape(G, (H + 2) // 2, 2, (W + 4) // 2, F2)
    accs = []
    for r_out in (0, 1):
        acc = jnp.zeros((G * A * B, F2), jnp.float32)
        for ky in range(3):
            a0 = (r_out + ky) // 2
            r_in = (r_out + ky) % 2
            for b in range(3):
                tap = v5[:, a0 : a0 + A, r_in, b : b + B, :].reshape(G * A * B, F2)
                acc = acc + jnp.dot(
                    tap, w2p[3 * ky + b], preferred_element_type=jnp.float32
                )
        accs.append(acc.reshape(G, A, B, F2))
    st = jnp.stack(accs, axis=2)  # (G, A, 2, B, 2F)
    return st.reshape(G, H, W, F)  # 5D unpack (the _interleave2 pattern)


def k_pack5(x_ref, w_ref, o_ref, *, G):
    x2 = x_ref[...].reshape(G * R, F)
    h4 = pack5_conv(x2, w_ref[...], G)
    h = jnp.maximum(h4, 0.0).astype(DT).reshape(G * R, F)  # real op between reshapes
    o_ref[...] = jnp.dot(
        h, jnp.transpose(w_ref[0, :F, :F]), preferred_element_type=jnp.float32
    ).astype(DT).reshape(G, H, W, F)


def k_shift(x_ref, w_ref, o_ref, *, G):
    x2 = x_ref[...].reshape(G * R, F)
    p4 = jnp.pad(x2.reshape(G, H, W, F), ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((G * R, F), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            tap = p4[:, ky : ky + H, kx : kx + W].reshape(G * R, F)
            acc = acc + jnp.dot(
                tap, w_ref[3 * ky + kx, :F, :F], preferred_element_type=jnp.float32
            )
    h = jnp.maximum(acc, 0.0).astype(DT)
    o_ref[...] = jnp.dot(
        h, jnp.transpose(w_ref[0, :F, :F]), preferred_element_type=jnp.float32
    ).astype(DT).reshape(G, H, W, F)


N = 256


def build(kernel):
    return jax.jit(
        pl.pallas_call(
            functools.partial(kernel, G=1),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, H, W, F), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((9, F2, F2), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, H, W, F), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, H, W, F), DT),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        )
    )


for name, kern in [("pack5", k_pack5), ("shift", k_shift)]:
    f = build(kern)
    x = jax.ShapeDtypeStruct((N, H, W, F), DT)
    w = jax.ShapeDtypeStruct((9, F2, F2), DT)
    try:
        t0 = time.perf_counter()
        f.lower(x, w).compile()
        print(f"{name:6s}: compile OK ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e)
        if "The MLIR operation involved:" in msg:
            op = msg.split("The MLIR operation involved:")[1].strip().splitlines()[0]
        else:
            op = msg[:140].replace("\n", " ")
        print(f"{name:6s}: FAIL {op}", flush=True)

if "time" in sys.argv[1:]:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (N, H, W, F)), DT)
    w = jnp.asarray(rng.normal(0, 0.05, (9, F2, F2)), DT)

    def timed(f, n=30):
        r = f(x, w)
        float(jnp.sum(r[..., :1].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(x, w)
        float(jnp.sum(r[..., :1].astype(jnp.float32)))
        return (time.perf_counter() - t0) / n * 1e3

    for name, kern in [("pack5", k_pack5), ("shift", k_shift)]:
        print(f"{name:6s}: {timed(build(kern)):6.2f} ms", flush=True)

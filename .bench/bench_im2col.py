"""MXU-shape experiment: 3x3 conv as 9 shifted matmuls vs ONE im2col matmul
(taps lane-concatenated). At F<128 the shifted form underfills the array
(K=F rows, N=F cols); the im2col form trades a VMEM lane-concat for a
K=9F contraction. Geometries: stem (48->256) and stage-0 conv2 (64->64),
plus their wgrads (M=taps*F instead of 9 separate M=F matmuls).

Usage: python .bench/bench_im2col.py [fwd wgrad]
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

N, H, W = 256, 64, 64
DT = jnp.bfloat16
_OFFS = [(ky, kx) for ky in range(3) for kx in range(3)]


def _taps(xp, H, W, CIN):
    R = H * W
    return [xp[0, ky : ky + H, kx : kx + W].reshape(R, CIN) for ky, kx in _OFFS]


# ── forward kernels: (1, H, W, CIN) -> (1, H, W, COUT) ──
def fwd_shift_kernel(x_ref, w_ref, o_ref, *, CIN, COUT):
    xp = jnp.pad(x_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((H * W, COUT), jnp.float32)
    for t, tap in enumerate(_taps(xp, H, W, CIN)):
        acc = acc + jnp.dot(tap, w_ref[t], preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype).reshape(1, H, W, COUT)


def fwd_im2col_kernel(x_ref, w_ref, o_ref, *, CIN, COUT):
    xp = jnp.pad(x_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    cat = jnp.concatenate(_taps(xp, H, W, CIN), axis=-1)  # (R, 9*CIN)
    acc = jnp.dot(cat, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype).reshape(1, H, W, COUT)


# ── wgrad kernels: saved x + dy -> dW ──
def wg_shift_kernel(x_ref, g_ref, dw_ref, a_ref, *, CIN, COUT):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)

    xp = jnp.pad(x_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    g = g_ref[...].reshape(H * W, COUT)
    for t, tap in enumerate(_taps(xp, H, W, CIN)):
        a_ref[t] += jax.lax.dot_general(
            tap, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = a_ref[...]


def wg_im2col_kernel(x_ref, g_ref, dw_ref, a_ref, *, CIN, COUT):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        a_ref[:] = jnp.zeros_like(a_ref)

    xp = jnp.pad(x_ref[...], ((0, 0), (1, 1), (1, 1), (0, 0)))
    g = g_ref[...].reshape(H * W, COUT)
    cat = jnp.concatenate(_taps(xp, H, W, CIN), axis=-1)  # (R, 9*CIN)
    a_ref[...] += jax.lax.dot_general(
        cat, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = a_ref[...]


def make_fwd(kernel, CIN, COUT, wshape):
    return jax.jit(
        pl.pallas_call(
            functools.partial(kernel, CIN=CIN, COUT=COUT),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, H, W, CIN), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec(wshape, lambda i: (0,) * len(wshape)),
            ],
            out_specs=pl.BlockSpec((1, H, W, COUT), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((N, H, W, COUT), DT),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        )
    )


def make_wg(kernel, CIN, COUT, awshape):
    return jax.jit(
        pl.pallas_call(
            functools.partial(kernel, CIN=CIN, COUT=COUT),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, H, W, CIN), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, H, W, COUT), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(awshape, lambda i: (0,) * len(awshape)),
            out_shape=jax.ShapeDtypeStruct(awshape, jnp.float32),
            scratch_shapes=[pltpu.VMEM(awshape, jnp.float32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
        )
    )


def timed(fn, *args, n=30):
    r = fn(*args)
    float(jnp.sum(r[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(jnp.sum(r[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3


rng = np.random.default_rng(0)
which = sys.argv[1:] or ["fwd", "wgrad"]

for CIN, COUT, name in [(48, 256, "stem"), (64, 64, "stage0-conv2")]:
    x = jnp.asarray(rng.normal(0, 1, (N, H, W, CIN)), DT)
    w9 = jnp.asarray(rng.normal(0, 0.05, (9, CIN, COUT)), DT)
    wcat = w9.reshape(9 * CIN, COUT)
    g = jnp.asarray(rng.normal(0, 1, (N, H, W, COUT)), DT)

    if "fwd" in which:
        fs = make_fwd(fwd_shift_kernel, CIN, COUT, (9, CIN, COUT))
        fi = make_fwd(fwd_im2col_kernel, CIN, COUT, (9 * CIN, COUT))
        a, b = fs(x, w9), fi(x, wcat)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        ts = timed(fs, x, w9)
        ti = timed(fi, x, wcat)
        print(f"{name} fwd:   shift {ts:6.2f} ms  im2col {ti:6.2f} ms  ({ts/ti:.2f}x)  maxerr {err:.2e}", flush=True)

    if "wgrad" in which:
        fs = make_wg(wg_shift_kernel, CIN, COUT, (9, CIN, COUT))
        fi = make_wg(wg_im2col_kernel, CIN, COUT, (9 * CIN, COUT))
        a, b = fs(x, g), fi(x, g)
        err = float(jnp.max(jnp.abs(a.reshape(-1) - b.reshape(-1))))
        rel = err / float(jnp.max(jnp.abs(a)))
        ts = timed(fs, x, g)
        ti = timed(fi, x, g)
        print(f"{name} wgrad: shift {ts:6.2f} ms  im2col {ti:6.2f} ms  ({ts/ti:.2f}x)  relerr {rel:.2e}", flush=True)

"""Per-stage fused-kernel timing: pallas fused block (fwd+bwd) vs pure-XLA
conv autodiff at every ResNet-50 geometry, isolated (no boundary effects).

This decides WHICH stages keep the fused kernels: the whole-chain sweep
(bench_fuse3) showed all-stage fusion losing end-to-end, so the per-stage
decomposition attributes the loss (multi-image grid overheads vs XLA's conv
emitters at each geometry).

Usage: python .bench/bench_stage_kernels.py [id|proj|both] [G overrides ...]
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.models.resnet import _grid_images
from argus_tpu.ops.pallas.block_fused import _block_saved
from argus_tpu.ops.pallas.proj_fused import _proj_block

N = 256
DT = jnp.bfloat16
ID_GEOMS = [
    ("id-stage0", 64, 64, 256, 64),
    ("id-stage1", 32, 32, 512, 128),
    ("id-stage2", 16, 16, 1024, 256),
    ("id-stage3", 8, 8, 2048, 512),
]
PROJ_GEOMS = [
    ("proj-stage0", 64, 64, 64, 64, 256, 1),
    ("proj-stage1", 64, 64, 256, 128, 512, 2),
    ("proj-stage2", 32, 32, 512, 256, 1024, 2),
    ("proj-stage3", 16, 16, 1024, 512, 2048, 2),
]
which = sys.argv[1] if len(sys.argv) > 1 else "both"

rng = np.random.default_rng(0)
mk = lambda s: jnp.asarray(rng.normal(0, 0.05, s), DT)


def timed(fn, args, n=20):
    v, g = fn(args)
    float(v)
    t0 = time.perf_counter()
    for _ in range(n):
        v, g = fn(args)
    float(v)
    return (time.perf_counter() - t0) / n * 1e3


def run_id():
    for tag, H, W, CIN, F in ID_GEOMS:
        G = _grid_images(N, H, W, CIN)
        args = (mk((N, H, W, CIN)), mk((CIN, F)), jnp.zeros((1, F), jnp.float32),
                mk((3, 3, F, F)), jnp.zeros((1, F), jnp.float32), mk((F, CIN)),
                jnp.zeros((1, CIN), jnp.float32))

        @jax.jit
        def pallas_vg(a, G=G):
            def loss(a):
                return jnp.sum(_block_saved(*a, "pallas", False, G).astype(jnp.float32))
            return jax.value_and_grad(loss)(a)

        # pure-XLA conv autodiff baseline (no custom vjp)
        @jax.jit
        def xla_vg(a):
            def loss(a):
                x, w1, b1, w2, b2, w3, b3 = a
                Cin, f = w1.shape
                h1 = jax.lax.conv_general_dilated(
                    x, w1.reshape(1, 1, Cin, f), (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h1 = jnp.maximum(h1.astype(jnp.float32) + b1, 0).astype(DT)
                h2 = jax.lax.conv_general_dilated(
                    h1, w2, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h2 = jnp.maximum(h2.astype(jnp.float32) + b2, 0).astype(DT)
                y = jax.lax.conv_general_dilated(
                    h2, w3.reshape(1, 1, f, Cin), (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                out = jnp.maximum(y.astype(jnp.float32) + b3 + x.astype(jnp.float32), 0)
                return jnp.sum(out)
            return jax.value_and_grad(loss)(a)

        tp = timed(pallas_vg, args)
        tx = timed(xla_vg, args)
        print(f"{tag} G={G}: pallas {tp:.2f} ms  xla {tx:.2f} ms  ({tx/tp:.2f}x)", flush=True)


def run_proj():
    for tag, H, W, CIN, F, COUT, S in PROJ_GEOMS:
        G = _grid_images(N, H, W, CIN)
        args = (mk((N, H, W, CIN)), mk((CIN, F)), jnp.zeros((1, F), jnp.float32),
                mk((3, 3, F, F)), jnp.zeros((1, F), jnp.float32), mk((F, COUT)),
                jnp.zeros((1, COUT), jnp.float32), mk((CIN, COUT)),
                jnp.zeros((1, COUT), jnp.float32))

        @jax.jit
        def pallas_vg(a, G=G, S=S):
            def loss(a):
                return jnp.sum(_proj_block(*a, S, "pallas", False, G).astype(jnp.float32))
            return jax.value_and_grad(loss)(a)

        @jax.jit
        def xla_vg(a, S=S):
            def loss(a):
                x, w1, b1, w2, b2, w3, b3, wsc, bsc = a
                Cin, f = w1.shape
                cout = w3.shape[1]
                h1 = jax.lax.conv_general_dilated(
                    x, w1.reshape(1, 1, Cin, f), (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h1 = jnp.maximum(h1.astype(jnp.float32) + b1, 0).astype(DT)
                h2 = jax.lax.conv_general_dilated(
                    h1, w2, (S, S), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                h2 = jnp.maximum(h2.astype(jnp.float32) + b2, 0).astype(DT)
                y = jax.lax.conv_general_dilated(
                    h2, w3.reshape(1, 1, f, cout), (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                sc = jax.lax.conv_general_dilated(
                    x, wsc.reshape(1, 1, Cin, cout), (S, S), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                out = jnp.maximum(y.astype(jnp.float32) + sc.astype(jnp.float32) + b3 + bsc, 0)
                return jnp.sum(out)
            return jax.value_and_grad(loss)(a)

        tp = timed(pallas_vg, args)
        tx = timed(xla_vg, args)
        print(f"{tag} G={G}: pallas {tp:.2f} ms  xla {tx:.2f} ms  ({tx/tp:.2f}x)", flush=True)


if which in ("id", "both"):
    run_id()
if which in ("proj", "both"):
    run_proj()

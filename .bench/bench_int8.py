"""int8-activation decision experiment (VERDICT r2/r3 lever #2).

v5e MXU does int8 at 2x bf16 peak (394 TOPS), and int8 activations halve conv
HBM reads — but every quantize step is an extra elementwise pass on an
HBM-bound step, and XLA must actually lower int8 convs to the MXU int8 path.
This microbench measures, at flagship conv geometries:
  * bf16 conv (baseline),
  * int8 conv alone (inputs pre-quantized — the steady-state cost if
    activations LIVE in int8),
  * quant -> int8 conv -> dequant inclusive (the retrofit cost).
Decision rule: int8 only graduates to a model integration + convergence A/B
if the inclusive path beats bf16 at >=1.2x on the conv-heavy geometries.

Usage: python .bench/bench_int8.py
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

# (tag, N, H, W, CIN, COUT, k, stride)
GEOMS = [
    ("stage0-3x3", 256, 64, 64, 64, 64, 3, 1),
    ("stage1-3x3", 256, 32, 32, 128, 128, 3, 1),
    ("stage2-3x3", 256, 16, 16, 256, 256, 3, 1),
    ("stage1-1x1", 256, 32, 32, 512, 128, 1, 1),
    ("stage2-1x1", 256, 16, 16, 1024, 256, 1, 1),
]


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    s = float(jnp.sum(out[0].astype(jnp.float32) if isinstance(out, tuple) else out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    # honest sync through the tunnel: fetch a scalar
    float(jnp.sum((out[0] if isinstance(out, tuple) else out).astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1e3, s


for tag, N, H, W, CIN, COUT, k, s in GEOMS:
    rng = np.random.default_rng(0)
    pad = ((k // 2, k // 2),) * 2 if k == 3 else "VALID"
    x_bf = jnp.asarray(rng.normal(0, 1, (N, H, W, CIN)), jnp.bfloat16)
    w_bf = jnp.asarray(rng.normal(0, 0.05, (k, k, CIN, COUT)), jnp.bfloat16)
    x_i8 = jnp.asarray(rng.integers(-127, 127, (N, H, W, CIN), dtype=np.int8))
    w_i8 = jnp.asarray(rng.integers(-127, 127, (k, k, CIN, COUT), dtype=np.int8))

    @jax.jit
    def conv_bf16(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (s, s), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    @jax.jit
    def conv_i8(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (s, s), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    @jax.jit
    def conv_i8_inclusive(x, w):
        # per-tensor symmetric quant of the activation + dequant of the output
        scale = jnp.max(jnp.abs(x).astype(jnp.float32)) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, w, (s, s), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return (y.astype(jnp.float32) * scale).astype(jnp.bfloat16)

    try:
        t_bf, _ = timeit(conv_bf16, x_bf, w_bf)
        t_i8, _ = timeit(conv_i8, x_i8, w_i8)
        t_inc, _ = timeit(conv_i8_inclusive, x_bf, w_i8)
        print(
            f"{tag}: bf16 {t_bf:.2f} ms | int8 {t_i8:.2f} ms ({t_bf/t_i8:.2f}x) | "
            f"quant+int8+dequant {t_inc:.2f} ms ({t_bf/t_inc:.2f}x)",
            flush=True,
        )
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

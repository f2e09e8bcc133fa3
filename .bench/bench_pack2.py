"""Pair-packed conv2 A/B at stage-0 flagship geometry: value_and_grad of the
fused identity block (_block_saved) and of the stage-0 chain (fused_stage)
under ARGUS_PACK2 / ARGUS_PACK2_IMPL. Run each mode as a separate process —
the env gates are read at import:

  ARGUS_PACK2=0                 python .bench/bench_pack2.py block chain
  ARGUS_PACK2_IMPL=reshape      python .bench/bench_pack2.py block chain
  ARGUS_PACK2_IMPL=concat       python .bench/bench_pack2.py block chain
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.ops.pallas.block_fused import _block_saved
from argus_tpu.ops.pallas.stage_fused import fused_stage

N, H, W, CIN, F, COUT = 256, 64, 64, 256, 64, 256
DT = jnp.bfloat16
rng = np.random.default_rng(0)
mk = lambda s: jnp.asarray(rng.normal(0, 0.05, s), DT)
zb = lambda c: jnp.zeros((1, c), jnp.float32)

mode = f"pack2={os.environ.get('ARGUS_PACK2', '1')} impl={os.environ.get('ARGUS_PACK2_IMPL', 'reshape')}"
which = sys.argv[1:] or ["block"]


def timed(fn, x, args, n=20):
    # x rides as an ARGUMENT: a closed-over device array is baked into the
    # HLO as a 537 MB constant and the remote compile service rejects the
    # request body (HTTP 413)
    v, g = fn(x, args)
    float(v)
    t0 = time.perf_counter()
    for _ in range(n):
        v, g = fn(x, args)
    float(v)
    return (time.perf_counter() - t0) / n * 1e3


if "block" in which:
    x = mk((N, H, W, CIN))
    idw = (mk((CIN, F)), zb(F), mk((3, 3, F, F)), zb(F), mk((F, CIN)), zb(CIN))

    @jax.jit
    def block_vg(x, params):
        def loss(params):
            out = _block_saved(x, *params, "pallas", False, int(__import__("os").environ.get("BENCH_G", 1)))
            return jnp.sum(out.astype(jnp.float32))
        return jax.value_and_grad(loss)(params)

    ms = timed(block_vg, x, idw)
    print(f"[{mode}] id-block fwd+bwd: {ms:6.2f} ms", flush=True)

if "chain" in which:
    xs = mk((N, H, W, F))  # stage-0 chain input: (N, 64, 64, 64)
    pw = (mk((F, F)), zb(F), mk((3, 3, F, F)), zb(F), mk((F, COUT)), zb(COUT),
          mk((F, COUT)), zb(COUT))
    idws = tuple(
        (mk((COUT, F)), zb(F), mk((3, 3, F, F)), zb(F), mk((F, COUT)), zb(COUT))
        for _ in range(2)
    )

    @jax.jit
    def chain_vg(xs, params):
        def loss(params):
            pwv, idwsv = params
            out = fused_stage(xs, pwv, idwsv, stride=1, impl="pallas", g=int(__import__("os").environ.get("BENCH_G", 1)))
            return jnp.sum(out.astype(jnp.float32))
        return jax.value_and_grad(loss)(params)

    ms = timed(chain_vg, xs, (pw, idws))
    print(f"[{mode}] stage0 chain fwd+bwd: {ms:6.2f} ms", flush=True)

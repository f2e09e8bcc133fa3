"""Whole-stage chain kernels vs the composed per-block fused kernels
(fwd+bwd, N=256 bf16, flagship geometries). The chain removes ~4 HBM passes
per inter-block boundary (fwd input re-read; bwd dx write+read; duplicate
out read). Usage: python .bench/bench_stage_chain.py [0 1 2 3]
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
from argus_tpu.ops.pallas.stage_fused import fused_stage

N = 256
DT = jnp.bfloat16
# stage: (H, W, CIN, F, COUT, S, n_id)
GEOMS = {
    0: (64, 64, 64, 64, 256, 1, 2),
    1: (64, 64, 256, 128, 512, 2, 3),
    2: (32, 32, 512, 256, 1024, 2, 5),
    3: (16, 16, 1024, 512, 2048, 2, 2),
}
stages = [int(a) for a in sys.argv[1:]] or [0, 1, 2]

rng = np.random.default_rng(0)
mk = lambda s: jnp.asarray(rng.normal(0, 0.05, s), DT)
zb = lambda c: jnp.zeros((1, c), jnp.float32)


def timed(fn, args, n=20):
    v, g = fn(args)
    float(v)
    t0 = time.perf_counter()
    for _ in range(n):
        v, g = fn(args)
    float(v)
    return (time.perf_counter() - t0) / n * 1e3


for s in stages:
    H, W, CIN, F, COUT, S, n_id = GEOMS[s]
    x = mk((N, H, W, CIN))
    pw = (mk((CIN, F)), zb(F), mk((3, 3, F, F)), zb(F),
          mk((F, COUT)), zb(COUT), mk((CIN, COUT)), zb(COUT))
    idws = tuple(
        (mk((COUT, F)), zb(F), mk((3, 3, F, F)), zb(F), mk((F, COUT)), zb(COUT))
        for _ in range(n_id)
    )
    G = _grid_images(N, H, W, CIN)
    Go = _grid_images(N, H // S, W // S, COUT)

    @jax.jit
    def chain_vg(params, G=G, S=S):
        def loss(params):
            pwv, idwsv = params
            out = fused_stage(x, pwv, idwsv, stride=S, impl="pallas", g=G)
            return jnp.sum(out.astype(jnp.float32))
        return jax.value_and_grad(loss)(params)

    @jax.jit
    def blocks_vg(params, G=G, Go=Go, S=S):
        def loss(params):
            pwv, idwsv = params
            cur = _proj_block(x, *pwv, S, "pallas", False, G)
            for idw in idwsv:
                cur = _block_saved(cur, *idw, "pallas", False, Go)
            return jnp.sum(cur.astype(jnp.float32))
        return jax.value_and_grad(loss)(params)

    params = (pw, idws)
    tc = timed(chain_vg, params)
    tb = timed(blocks_vg, params)
    print(
        f"stage{s} (proj+{n_id}id) G={G}/{Go}: chain {tc:.2f} ms  "
        f"per-block {tb:.2f} ms  ({tb/tc:.2f}x)",
        flush=True,
    )

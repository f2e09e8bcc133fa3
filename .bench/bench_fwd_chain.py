"""FORWARD-ONLY whole-stage chains (the frozen_stages primal path): compile
time + steady-state of the whole-stage fwd chain vs the cap-3 split vs the
composed per-block no-save forwards. The 3-block chain cap exists because the
unrolled multi-block BACKWARD broke the remote Mosaic compile; the frozen-stage
path never traces a backward, so longer fwd-only bodies may be fine — this
probe measures whether they compile and whether they win.
Usage: python .bench/bench_fwd_chain.py [stage ...]   (default 1 2)
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.models.resnet import _grid_images
from argus_tpu.ops.pallas.block_fused import fused_bottleneck_block, _block_saved
from argus_tpu.ops.pallas.proj_fused import _proj_block
from argus_tpu.ops.pallas.stage_fused import fused_stage

N = 256
DT = jnp.bfloat16
GEOMS = {
    0: (64, 64, 64, 64, 256, 1, 2),
    1: (64, 64, 256, 128, 512, 2, 3),
    2: (32, 32, 512, 256, 1024, 2, 5),
    3: (16, 16, 1024, 512, 2048, 2, 2),
}
stages = [int(a) for a in sys.argv[1:]] or [1, 2]

rng = np.random.default_rng(0)
mk = lambda s: jnp.asarray(rng.normal(0, 0.05, s), DT)
zb = lambda c: jnp.zeros((1, c), jnp.float32)


def timed(fn, x, n=20):
    t0 = time.perf_counter()
    float(jnp.sum(fn(x).astype(jnp.float32)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        v = fn(x)
    float(jnp.sum(v.astype(jnp.float32)))
    return compile_s, (time.perf_counter() - t0) / n * 1e3


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

    variants = {
        f"whole({1+n_id})": jax.jit(lambda xv, cap=1 + n_id: fused_stage(
            x=xv, proj_folded=pw, id_folded=idws, stride=S, impl="pallas", g=G,
            chain_cap=cap)),
        "split(cap3)": jax.jit(lambda xv: fused_stage(
            x=xv, proj_folded=pw, id_folded=idws, stride=S, impl="pallas", g=G,
            chain_cap=3)),
        "per-block": jax.jit(lambda xv: _per_block(xv)),
    }

    def _per_block(xv):
        cur = _proj_block(xv, *pw, S, "pallas", False, G)
        for idw in idws:
            cur = _block_saved(cur, *idw, "pallas", False, Go)
        return cur

    for name, fn in variants.items():
        try:
            c, t = timed(fn, x)
            print(f"stage{s} fwd {name:12s}: {t:7.2f} ms  (compile {c:.0f}s)", flush=True)
        except Exception as e:
            print(f"stage{s} fwd {name:12s}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

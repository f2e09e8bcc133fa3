"""Fast per-kernel VMEM/compile probe: AOT-compile each fused block kernel
(fwd+bwd) standalone at every ResNet-50 stage geometry BEFORE paying a
15-minute whole-step compile. Catches scoped-VMEM OOMs in ~a minute each.

Usage: python .bench/vmem_probe.py
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
# (tag, H, W, CIN, F) identity-block geometries
ID_GEOMS = [
    ("id-stage0", 64, 64, 256, 64),
    ("id-stage1", 32, 32, 512, 128),
    ("id-stage2", 16, 16, 1024, 256),
    ("id-stage3", 8, 8, 2048, 512),
]
# (tag, H, W, CIN, F, COUT, S) projection-block geometries (input-side H/W)
PROJ_GEOMS = [
    ("proj-stage0", 64, 64, 64, 64, 256, 1),
    ("proj-stage1", 64, 64, 256, 128, 512, 2),
    ("proj-stage2", 32, 32, 512, 256, 1024, 2),
    ("proj-stage3", 16, 16, 1024, 512, 2048, 2),
]

rng = np.random.default_rng(0)


def mk(shape):
    return jnp.asarray(rng.normal(0, 0.05, shape), DT)


for tag, H, W, CIN, F in ID_GEOMS:
    G = _grid_images(N, H, W, CIN)
    args = (mk((N, H, W, CIN)), mk((CIN, F)), jnp.zeros((1, F)), mk((3, 3, F, F)),
            jnp.zeros((1, F)), mk((F, CIN)), jnp.zeros((1, CIN)))

    def loss(a):
        return jnp.sum(_block_saved(*a, "pallas", False, G).astype(jnp.float32))

    try:
        t0 = time.perf_counter()
        jax.jit(jax.value_and_grad(loss)).lower(args).compile()
        print(f"{tag} G={G}: compile OK ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{tag} G={G}: FAIL {str(e)[:180]}", flush=True)

for tag, H, W, CIN, F, COUT, S in PROJ_GEOMS:
    G = _grid_images(N, H, W, CIN)
    args = (mk((N, H, W, CIN)), mk((CIN, F)), jnp.zeros((1, F)), mk((3, 3, F, F)),
            jnp.zeros((1, F)), mk((F, COUT)), jnp.zeros((1, COUT)),
            mk((CIN, COUT)), jnp.zeros((1, COUT)))

    def loss(a):
        return jnp.sum(_proj_block(*a, S, "pallas", False, G).astype(jnp.float32))

    try:
        t0 = time.perf_counter()
        jax.jit(jax.value_and_grad(loss)).lower(args).compile()
        print(f"{tag} G={G}: compile OK ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{tag} G={G}: FAIL {str(e)[:180]}", flush=True)

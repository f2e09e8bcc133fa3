"""On-chip value check: the packed no-save stage-0 forward chain vs the
unpacked chain, real Mosaic lowering (interpret mode already pins the math;
this guards against lowering bugs like the round-3 hue-sextant FP issue).

Usage: python .bench/check_pack_onchip.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.ops.pallas.stage_fused import fused_stage

rng = np.random.default_rng(0)
DT = jnp.bfloat16
cin, f, cout = 64, 64, 256
x = jnp.asarray(rng.normal(0, 0.5, (8, 64, 64, cin)), DT)
mk = lambda s: jnp.asarray(rng.normal(0, 0.08, s), DT)
zb = lambda c: jnp.asarray(rng.normal(0, 0.05, (1, c)), DT)
pw = (mk((cin, f)), zb(f), mk((3, 3, f, f)), zb(f),
      mk((f, cout)), zb(cout), mk((cin, cout)), zb(cout))
idws = tuple(
    (mk((cout, f)), zb(f), mk((3, 3, f, f)), zb(f), mk((f, cout)), zb(cout))
    for _ in range(2)
)


def run():
    fn = jax.jit(lambda xv: fused_stage(xv, pw, idws, stride=1, g=1, chain_cap=3))
    return np.asarray(fn(x), np.float32)


os.environ["ARGUS_PACK_CHAIN"] = "1"
out_p = run()
os.environ["ARGUS_PACK_CHAIN"] = "0"
out_u = run()
d = np.abs(out_p - out_u)
rel = d / (np.abs(out_u) + 1e-3)
print(f"max abs {d.max():.6f}  max rel {rel.max():.6f}  mean abs {d.mean():.8f}")
ok = d < 0.02 * np.abs(out_u) + 0.05  # bf16 tap-reorder noise envelope
assert ok.all(), f"PACKED CHAIN VALUE MISMATCH ON CHIP: {(~ok).sum()} elements"
print("OK")

"""Attribute the fused-augment kernel's per-step cost across its phases.

Per-call dispatch through the harness tunnel is ~2 ms, so each variant chains
REPS kernel applications inside one jit via lax.scan (output shape == input
shape) and divides. Phase letters: a=arcs, w=planckian, j=jiggle (static hue
position + selector-affine passes, the default), S=jiggle legacy in-kernel
lax.switch, J=jiggle fixed-order (the floor), b=blurs, p=plasma.

Measured 2026-08-18 (v5e-1, N=256 bf16 256x256): full stack 4.466 ms with the
static-hue-position jiggle vs 5.226 legacy switch (-0.76 ms) vs 4.269
fixed-order floor. A padded 6-affine-pass dynamic-hue variant recovered
NOTHING (5.232 ms) — identity passes pay full luma+mean cost.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")

from argus_tpu.ops.augment import (
    AugmentationConfig,
    _arc_params,
    _gaussian_taps,
    _jiggle_params,
    _motion_kernel,
    _planckian_gains,
    _plasma_params,
    _resize_matrix,
)
from argus_tpu.ops.pallas.augment_fused import fused_augment

N, H, W = 256, 256, 256
REPS = 16
cfg = AugmentationConfig()
n_arcs = cfg.num_spaghetti
keys = jax.random.split(jax.random.PRNGKey(0), 8)
f32 = jnp.float32
arc_p = _arc_params(keys[0], N, n_arcs, H, W).reshape(N, -1)
gains = _planckian_gains(keys[3], N, 0.5, jnp.bfloat16).astype(f32)
jig, order = _jiggle_params(keys[4], N // 2, 2, cfg, f32)
gw, ggate = _gaussian_taps(keys[5], N)
mk, mgate = _motion_kernel(keys[6], N)
field, intensity, quantity = _plasma_params(keys[7], N, (H, W))
packed = jnp.concatenate(
    [arc_p.astype(f32), gains, jig.astype(f32), gw.astype(f32),
     mk.reshape(N, 9).astype(f32), ggate[:, None].astype(f32),
     mgate[:, None].astype(f32), intensity[:, None].astype(f32),
     quantity[:, None].astype(f32)], axis=1)
S = field.shape[-1]
mh = jnp.asarray(_resize_matrix(H, S))
mwt = jnp.asarray(_resize_matrix(W, S)).T
order = order.astype(jnp.int32)[None]
field = field.astype(f32)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((N, 3, H, W)), jnp.bfloat16)


def timed(phases):
    @jax.jit
    def many(x):
        def body(c, _):
            return fused_augment(c, field, mh, mwt, packed, order,
                                 n_arcs=n_arcs, phases=phases), None
        y, _ = jax.lax.scan(body, x, None, length=REPS)
        return y

    y = many(img)
    _ = float(jnp.asarray(y, jnp.float32).mean())
    t0 = time.perf_counter()
    for _ in range(4):
        y = many(img)
    _ = float(jnp.asarray(y, jnp.float32).mean())
    dt = (time.perf_counter() - t0) / (4 * REPS)
    return dt * 1e3


base = timed("awjbp")
print(f"full stack (awjbp): {base:.3f} ms", flush=True)
for ph, label in [
    ("awSbp", "jiggle legacy switch"),
    ("awJbp", "jiggle fixed order"),
    ("awbp", "no jiggle"),
    ("wjbp", "no arcs"),
    ("awjp", "no blurs"),
    ("awjb", "no plasma"),
    ("ajbp", "no planckian"),
]:
    ms = timed(ph)
    print(f"{label:22s} ({ph or '-':6s}): {ms:.3f} ms  (delta {base - ms:+.3f})", flush=True)

"""Feed-path probe: augment output (channel-first) -> stem s2d input (N,64,64,48).

The r3s6 B=256 trace shows the current composition costs ~3.1 ms of pure data
movement: copy.210 (0.76, cf->NHWC transpose out of the augment kernel),
fusion.370 (0.82, the one-hot s2d lowered as a fusion with an N-minor layout)
and copy.237 (1.56, relayout of the s2d output for the stem kernel).

Variants (B=256 -> 512 camera images, bf16, real chip):
  v0: current — cf -> NHWC(B,H,W,6) transpose -> cam fold -> s2d one-hot conv
  v1: one conv custom-call straight from channel-first via NCHW dimension
      numbers (the conv engine does permutation + s2d in one pass)
  v2: v1 with the transpose expressed inside conv via feature_group_count? (n/a)
  ref: plain relayout copy of the same bytes (lower bound)
"""
import sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.models.resnet import space_to_depth_conv

B, H, W = 256, 256, 256
N = 2 * B
rng = np.random.default_rng(0)
x_cf = jnp.asarray(rng.normal(0, 1, (N, 3, H, W)), jnp.bfloat16)


def v0(x):
    # what apply_augmentation + the model do today
    nb = x.shape[0] // 2
    per = x.reshape(nb, 2, 3, H, W)
    nhwc = jnp.transpose(per, (0, 3, 4, 1, 2)).reshape(nb, H, W, 6)
    cams = jnp.transpose(nhwc.reshape(nb, H, W, 2, 3), (0, 3, 1, 2, 4)).reshape(
        2 * nb, H, W, 3
    )
    return space_to_depth_conv(cams, 4)


def _eye48(dtype):
    eye = np.zeros((4, 4, 3, 48), np.float32)
    for sy in range(4):
        for sx in range(4):
            for c in range(3):
                eye[sy, sx, c, (sy * 4 + sx) * 3 + c] = 1
    return jnp.asarray(eye, dtype)


def v1(x):
    return jax.lax.conv_general_dilated(
        x, _eye48(x.dtype), (4, 4), "VALID", dimension_numbers=("NCHW", "HWIO", "NHWC")
    )


def ref_copy(x):
    return x * jnp.bfloat16(1.0000305)  # force a full read+write, no layout change


def timed(name, fn, x, n=30):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    float(jnp.sum(f(x).astype(jnp.float32)))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        v = f(x)
    float(jnp.sum(v.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:7.3f} ms  (compile {comp:.1f}s)")
    return dt


# value check first (CPU-cheap shapes route identically on TPU)
a = np.asarray(v0(x_cf[:8]).astype(jnp.float32))
b = np.asarray(v1(x_cf[:8]).astype(jnp.float32))
print("value match v0 vs v1:", np.allclose(a, b, rtol=1e-2, atol=1e-3), np.abs(a - b).max())

timed("ref copy ", ref_copy, x_cf)
timed("v0 cur   ", v0, x_cf)
timed("v1 nchw  ", v1, x_cf)

import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from argus_tpu.ops.augment import AugmentationConfig, apply_augmentation, _gaussian_taps, _motion_kernel
from argus_tpu.ops.pallas.blur import fused_random_blur
from argus_tpu.ops.image import u8_to_f32

def timeit(fn, n=10):
    float(fn()); float(fn())
    t0=time.perf_counter()
    for _ in range(n): out=fn()
    float(out)
    return (time.perf_counter()-t0)/n

N=256; H=W=256
rng=np.random.default_rng(0)
imgs = jnp.asarray(rng.random((N,3,H,W),dtype=np.float32)).astype(jnp.bfloat16)
k1,k2 = jax.random.split(jax.random.PRNGKey(0))
gw, gg = _gaussian_taps(k1, N); mk, mg = _motion_kernel(k2, N)
gates = jnp.stack([gg, mg], 1)

# XLA path: gaussian then motion
from argus_tpu.ops.augment import gaussian_blur, motion_blur
xla = jax.jit(lambda k, x: jnp.sum(motion_blur(jax.random.fold_in(k,1), gaussian_blur(k, x))))
t = timeit(lambda: xla(jax.random.PRNGKey(3), imgs)); print(f"XLA gauss+motion bf16: {t*1e3:.2f} ms", flush=True)

pal = jax.jit(lambda x: jnp.sum(fused_random_blur(x, gw, mk, gates)))
t = timeit(lambda: pal(imgs)); print(f"PALLAS fused blur bf16: {t*1e3:.2f} ms", flush=True)

# full stack comparison
imgs_u8 = jnp.asarray(rng.integers(0,256,(N//2,H,W,6),dtype=np.uint8))
for pb in (False, True):
    cfg = AugmentationConfig(pallas_blur=pb)
    f = jax.jit(lambda k,x: jnp.sum(apply_augmentation(cfg, k, u8_to_f32(x, jnp.bfloat16), n_cams=2, train=True)))
    t = timeit(lambda: f(jax.random.PRNGKey(5), imgs_u8))
    print(f"full stack pallas_blur={pb}: {t*1e3:.2f} ms", flush=True)

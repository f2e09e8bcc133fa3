import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from argus_tpu.models import NCameraCNN, NCameraCNNConfig
from argus_tpu.ops.augment import AugmentationConfig, apply_augmentation
from argus_tpu.ops.image import u8_to_f32
from argus_tpu.train import geometric_loss_fn

def timeit(fn, n=10):
    float(fn()); float(fn())
    t0=time.perf_counter()
    for _ in range(n): out=fn()
    float(out)
    return (time.perf_counter()-t0)/n

B=128; hw=(256,256)
rng=np.random.default_rng(0)
imgs_u8 = jnp.asarray(rng.integers(0,256,(B,*hw,6),dtype=np.uint8))
poses = jnp.tile(jnp.array([0,0,0,0,0,0,1],jnp.float32),(B,1))
aug_cfg = AugmentationConfig()
key = jax.random.PRNGKey(0)

aug = jax.jit(lambda k,x: jnp.sum(apply_augmentation(aug_cfg, k, u8_to_f32(x, jnp.bfloat16), n_cams=2, train=True)))
t = timeit(lambda: aug(key, imgs_u8)); print(f"aug bf16: {t*1e3:.1f} ms", flush=True)

cfg = NCameraCNNConfig(n_cams=2, backbone="resnet50", resnet_output_dim=1024, dtype="bfloat16")
model = NCameraCNN(cfg)
v = model.init(jax.random.PRNGKey(0), jnp.zeros((1,*hw,6)), train=False)
params, bstats = v["params"], v["batch_stats"]

def loss_fn(params, x):
    pred, mut = model.apply({"params":params,"batch_stats":bstats}, x, train=True, mutable=["batch_stats"])
    return jnp.mean(geometric_loss_fn(pred, poses))

x = u8_to_f32(imgs_u8)
vg = jax.jit(lambda p, x: jax.value_and_grad(loss_fn)(p, x)[0])
t = timeit(lambda: vg(params, x)); print(f"fwd+bwd (train BN): {t*1e3:.1f} ms -> {2*B/t:.0f} img/s", flush=True)
gf3 = 2*B*5.36*3
print(f"  = {gf3/t/1e3:.1f} TFLOP/s assuming 3x fwd cost", flush=True)

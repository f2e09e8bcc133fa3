import sys; sys.path.insert(0, "/root/repo")
import time, os
import numpy as np
import jax, jax.numpy as jnp
from argus_tpu.models import NCameraCNNConfig
from argus_tpu.ops.augment import AugmentationConfig
from argus_tpu.train import create_train_state, make_train_step

class _Cfg:
    model_config = NCameraCNNConfig(n_cams=2, backbone="resnet50", resnet_output_dim=1024)
    augmentation_config = AugmentationConfig()
    use_augmentation = True
    amp = True
    max_grad_norm = 1.0
    learning_rate = 1e-4

Bs = [int(x) for x in os.environ.get("BS","128").split(",")]
for B in Bs:
    cfg=_Cfg(); hw=(256,256)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), hw)
    step = make_train_step(model, cfg, base_seed=0)
    rng = np.random.default_rng(0)
    batch = {"images": jnp.asarray(rng.integers(0,256,(B,*hw,6),dtype=np.uint8)),
             "cube_pose": jnp.tile(jnp.array([0,0,0,0,0,0,1],jnp.float32),(B,1)),
             "mask": jnp.ones((B,),jnp.float32)}
    t0=time.perf_counter(); s2, loss = step(state, batch); float(loss); del state
    print(f"B={B} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    state=s2
    state, loss = step(state, batch); float(loss)
    n=10; t0=time.perf_counter()
    for _ in range(n): state, loss = step(state, batch)
    float(loss)
    dt=(time.perf_counter()-t0)/n
    print(f"B={B}: {dt*1e3:.1f} ms/step -> {B/dt:.0f} ex/s, {2*B/dt:.0f} cam-imgs/s", flush=True)

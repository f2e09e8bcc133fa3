import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from argus_tpu.models import NCameraCNNConfig
from argus_tpu.ops.augment import AugmentationConfig
from argus_tpu.train import create_train_state, make_train_step

B=128; hw=(256,256)
rng = np.random.default_rng(0)
batch = {"images": jnp.asarray(rng.integers(0,256,(B,*hw,6),dtype=np.uint8)),
         "cube_pose": jnp.tile(jnp.array([0,0,0,0,0,0,1],jnp.float32),(B,1)),
         "mask": jnp.ones((B,),jnp.float32)}

for s2d in (False, True):
    class _Cfg:
        model_config = NCameraCNNConfig(n_cams=2, backbone="resnet50", resnet_output_dim=1024, stem_space_to_depth=s2d)
        augmentation_config = AugmentationConfig()
        use_augmentation = True
        amp = True
        max_grad_norm = 1.0
        learning_rate = 1e-4
    cfg=_Cfg()
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), hw)
    step = make_train_step(model, cfg, base_seed=0)
    t0=time.perf_counter(); state, loss = step(state, batch); float(loss)
    print(f"s2d={s2d} compile: {time.perf_counter()-t0:.0f}s", flush=True)
    state, loss = step(state, batch); float(loss)
    n=10; t0=time.perf_counter()
    for _ in range(n): state, loss = step(state, batch)
    float(loss)
    dt=(time.perf_counter()-t0)/n
    print(f"s2d={s2d}: {dt*1e3:.1f} ms/step -> {2*B/dt:.0f} cam-imgs/s", flush=True)

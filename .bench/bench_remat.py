import sys; sys.path.insert(0, "/root/repo")
import time, dataclasses
import numpy as np
import jax, jax.numpy as jnp
from argus_tpu.models import NCameraCNNConfig
from argus_tpu.models.resnet import BACKBONES
from argus_tpu.ops.augment import AugmentationConfig
from argus_tpu.train import create_train_state, make_train_step
import argus_tpu.models.pose_cnn as pc
import flax.linen as nn

B=128; hw=(256,256)
rng = np.random.default_rng(0)
batch = {"images": jnp.asarray(rng.integers(0,256,(B,*hw,6),dtype=np.uint8)),
         "cube_pose": jnp.tile(jnp.array([0,0,0,0,0,0,1],jnp.float32),(B,1)),
         "mask": jnp.ones((B,),jnp.float32)}

# monkeypatch backbone factory to set remat
orig = dict(BACKBONES)
for remat in (True,):
    import functools
    BACKBONES.clear()
    BACKBONES.update({k: (lambda f: functools.partial(f, remat=remat))(f) for k, f in orig.items()})
    class _Cfg:
        model_config = NCameraCNNConfig(n_cams=2, backbone="resnet50", resnet_output_dim=1024)
        model_type = "pose_cnn"
        augmentation_config = AugmentationConfig()
        use_augmentation = True
        amp = True
        max_grad_norm = 1.0
        learning_rate = 1e-4
    model, state = create_train_state(_Cfg(), jax.random.PRNGKey(0), hw)
    step = make_train_step(model, _Cfg(), base_seed=0)
    t0=time.perf_counter(); state, loss = step(state, batch); float(loss)
    print(f"remat={remat} compile: {time.perf_counter()-t0:.0f}s", flush=True)
    state, loss = step(state, batch); float(loss)
    n=10; t0=time.perf_counter()
    for _ in range(n): state, loss = step(state, batch)
    float(loss)
    dt=(time.perf_counter()-t0)/n
    print(f"remat={remat}: {dt*1e3:.1f} ms/step -> {2*B/dt:.0f} cam-imgs/s", flush=True)

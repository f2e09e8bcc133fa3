import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from argus_tpu.models import NCameraCNNConfig
from argus_tpu.ops.augment import AugmentationConfig
from argus_tpu.train import create_train_state, make_train_step
from argus_tpu import profiling

class _Cfg:
    model_config = NCameraCNNConfig(n_cams=2, backbone="resnet50", resnet_output_dim=1024)
    model_type = "pose_cnn"
    augmentation_config = AugmentationConfig()
    use_augmentation = True
    amp = True
    max_grad_norm = 1.0
    learning_rate = 1e-4

B=128; hw=(256,256)
model, state = create_train_state(_Cfg(), jax.random.PRNGKey(0), hw)
step = make_train_step(model, _Cfg(), base_seed=0)
rng = np.random.default_rng(0)
batch = {"images": jnp.asarray(rng.integers(0,256,(B,*hw,6),dtype=np.uint8)),
         "cube_pose": jnp.tile(jnp.array([0,0,0,0,0,0,1],jnp.float32),(B,1)),
         "mask": jnp.ones((B,),jnp.float32)}
state, loss = step(state, batch); float(loss)
print("warm, tracing...", flush=True)
try:
    with profiling.trace("/root/repo/outputs/traces/step") as d:
        for _ in range(3):
            state, loss = step(state, batch)
        float(loss)
    print("trace written to", d, flush=True)
except Exception as e:
    print("trace failed:", type(e).__name__, str(e)[:200], flush=True)

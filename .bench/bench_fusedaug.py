import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
from argus_tpu.models import NCameraCNNConfig
from argus_tpu.ops.augment import AugmentationConfig
from argus_tpu.train import TrainConfig, create_train_state, make_train_step

B, hw = 128, (256, 256)
rng = np.random.default_rng(0)
batch = {"images": jnp.asarray(rng.integers(0,256,(B,*hw,6),dtype=np.uint8)),
         "cube_pose": jnp.tile(jnp.array([0,0,0,0,0,0,1],jnp.float32),(B,1)),
         "mask": jnp.ones((B,),jnp.float32)}
for fused in (True,):
    cfg = TrainConfig(model_config=NCameraCNNConfig(),
                      augmentation_config=AugmentationConfig(pallas_fused=fused),
                      use_augmentation=True, amp=True, wandb_log=False)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), hw)
    step = make_train_step(model, cfg, base_seed=0)
    t0 = time.perf_counter(); state, loss = step(state, batch); float(loss)
    compile_s = time.perf_counter() - t0
    state, loss = step(state, batch); float(loss)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n): state, loss = step(state, batch)
    final = float(loss); dt = (time.perf_counter()-t0)/n
    print(f"fused={fused}: {dt*1e3:.1f} ms/step  {2*B/dt:.0f} cam-img/s  loss={final:.4f} (compile {compile_s:.0f}s)", flush=True)

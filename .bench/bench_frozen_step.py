"""Time the flagship train step (env: BENCH_BN, BENCH_STEM, BENCH_FROZEN_STAGES,
BENCH_BATCH, BENCH_STEPS). Minimal: compile + steady-state ms/step only."""
import os, sys, time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.models import NCameraCNNConfig
from argus_tpu.train import TrainConfig, create_train_state, make_train_step

bn_mode = os.environ.get("BENCH_BN", "frozen")
stem_mode = os.environ.get("BENCH_STEM", "frozen")
k = int(os.environ.get("BENCH_FROZEN_STAGES", "3"))
B = int(os.environ.get("BENCH_BATCH", "128"))
n = int(os.environ.get("BENCH_STEPS", "20"))
hw = (256, 256)
cfg = TrainConfig(
    model_config=NCameraCNNConfig(
        n_cams=2, backbone="resnet50", resnet_output_dim=1024,
        bn_frozen=bn_mode.startswith("frozen"),
        bn_frozen_affine=bn_mode in ("frozen", "frozenaff"),
        stem_frozen=stem_mode == "frozen",
        stem_grad_stride=int(stem_mode[4:]) if stem_mode.startswith("grad") else 1,
        frozen_stages=k,
    ),
    use_augmentation=True, amp=True, wandb_log=False,
)
model, state = create_train_state(cfg, jax.random.PRNGKey(0), hw)
step = make_train_step(model, cfg, base_seed=0)
rng = np.random.default_rng(0)
batch = {"images": jnp.asarray(rng.integers(0, 256, (B, *hw, 6), dtype=np.uint8)),
         "cube_pose": jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], jnp.float32), (B, 1)),
         "mask": jnp.ones((B,), jnp.float32)}
t0 = time.perf_counter()
state, loss = step(state, batch); float(loss)
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
state, loss = step(state, batch); float(loss)
t0 = time.perf_counter()
for _ in range(n):
    state, loss = step(state, batch)
float(loss)
dt = (time.perf_counter() - t0) / n
print(f"bn={bn_mode} stem={stem_mode} k={k} B={B}: {dt*1e3:.2f} ms/step "
      f"= {2*B/dt:,.0f} cam-img/s", flush=True)

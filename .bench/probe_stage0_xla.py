"""Stage0-on-XLA probe (round 5 ceiling audit): the full-backprop trace shows
stage0 = 44.3 ms of 152.8 (29%), its chain backward alone 30 ms at ~30% MFU —
the F=64 conv2 matmuls half-fill the 128-lane MXU and pair-packing is closed
as a Mosaic limitation (block_fused._pair_packed). The untested alternative:
run stage0 on the XLA conv path (its conv custom-calls handle 64-channel
geometry with their own layouts) while stages 1-3 stay fused.

Usage: python .bench/probe_stage0_xla.py  [P_BATCH=256 P_STEPS=15]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
from argus_tpu.models import NCameraCNNConfig
from argus_tpu.train import TrainConfig, create_train_state, make_train_step

B = int(os.environ.get("P_BATCH", "256"))
N = int(os.environ.get("P_STEPS", "15"))
hw = (256, 256)
rng = np.random.default_rng(0)
batch = {"images": jnp.asarray(rng.integers(0, 256, (B, *hw, 6), dtype=np.uint8)),
         "cube_pose": jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], jnp.float32), (B, 1)),
         "mask": jnp.ones((B,), jnp.float32)}

def measure(tag, **fuse_kw):
    cfg = TrainConfig(
        model_config=NCameraCNNConfig(
            n_cams=2, backbone="resnet50", resnet_output_dim=1024,
            bn_frozen=True, bn_frozen_affine=True, stem_frozen=True,
            frozen_stages=0, **fuse_kw),
        use_augmentation=True, amp=True, wandb_log=False)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), hw)
    step = make_train_step(model, cfg, base_seed=0)
    t0 = time.perf_counter()
    state, loss = step(state, batch); float(loss)
    print(f"[{tag}] compile+warm {time.perf_counter()-t0:.0f}s", flush=True)
    state, loss = step(state, batch); float(loss)
    t0 = time.perf_counter()
    for _ in range(N):
        state, loss = step(state, batch)
    float(loss)
    dt = (time.perf_counter() - t0) / N
    print(f"[{tag}] {dt*1e3:.2f} ms/step = {2*B/dt:.0f} cam-img/s", flush=True)
    return dt

base = measure("all-fused (baseline)")
s0x = measure("stage0-on-XLA", fuse_block_stages=(1, 2, 3), fuse_stage_stages=())
print(f"delta: {(base - s0x)*1e3:+.2f} ms/step", flush=True)

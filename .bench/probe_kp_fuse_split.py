"""Keypoint frozen-BN fusion split (round 5): the bench's `frozen_fused`
sub-entry measured SLOWER than the exact-BN pure-XLA keypoint step (111.1 vs
102.9 ms @B=256, BENCH full run) — the opposite of the pose-cnn resnet50
result. Split the two levers: frozen BN+stem with the fused Pallas kernels
DISABLED isolates whether freezing (drops BN stats/backward) wins while the
resnet18 BasicBlock kernels lose (stage0/1 run at 64/128 channels where the
fused chain's F=64 lane underfill is worst and XLA's conv custom-calls are
strong).

Usage: python .bench/probe_kp_fuse_split.py  [P_BATCH=256 P_STEPS=15]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
from argus_tpu.models.keypoint_net import CubeKeypointNetConfig
from argus_tpu.train import TrainConfig, create_train_state, make_train_step

B = int(os.environ.get("P_BATCH", "256"))
N = int(os.environ.get("P_STEPS", "15"))
hw = (256, 256)
rng = np.random.default_rng(0)
batch = {
    "images": jnp.asarray(rng.integers(0, 256, (B, *hw, 6), dtype=np.uint8)),
    "cube_pose": jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], jnp.float32), (B, 1)),
    "mask": jnp.ones((B,), jnp.float32),
}


def measure(tag, **kp_kw):
    cfg = TrainConfig(
        model_type="keypoint",
        keypoint_config=CubeKeypointNetConfig(**kp_kw),
        use_augmentation=True, amp=True, wandb_log=False,
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), hw)
    step = make_train_step(model, cfg, base_seed=0)
    t0 = time.perf_counter()
    state, loss = step(state, batch)
    float(loss)
    print(f"[{tag}] compile+warm {time.perf_counter() - t0:.0f}s", flush=True)
    state, loss = step(state, batch)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(N):
        state, loss = step(state, batch)
    float(loss)
    dt = (time.perf_counter() - t0) / N
    print(f"[{tag}] {dt * 1e3:.2f} ms/step = {2 * B / dt:.0f} cam-img/s", flush=True)
    return dt


frz = dict(bn_frozen=True, bn_frozen_affine=True, stem_frozen=True)
base = measure("exact-BN XLA (bench keypoint_train)")
fused = measure("frozen + fused kernels", **frz,
                fuse_block="auto", fuse_proj="auto", fuse_stem="auto", fuse_stage="auto")
xla = measure("frozen + fuse OFF (pure XLA; family default)", **frz)
print(f"freezing alone: {(base - xla) * 1e3:+.2f} ms; fused kernels on top: "
      f"{(xla - fused) * 1e3:+.2f} ms", flush=True)

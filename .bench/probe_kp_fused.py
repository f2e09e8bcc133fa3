"""Keypoint-family fused-config throughput probe (round 4, session 5).

The keypoint+PnP family is the transfer-accuracy headline (4.5 deg / 0.47 cm,
ACCURACY_r04.json) but trains at ~0.19 MFU in its A/B configuration (exact BN
resnet18: 102.9 ms/step @B=256, bench `keypoint_train`) — 3x below the
flagship's 0.556, because exact-BN stats/backward reductions re-read every conv
activation and none of the fused Pallas kernels can engage (they require frozen
BN + frozen affine).

This probe measures the fused-compatible config on the real chip:
  CubeKeypointNetConfig(bn_frozen=True, bn_frozen_affine=True, stem_frozen=True)
under which models/resnet.py auto-engages (backend == "tpu"):
  * fused stem kernel (stem_fused.py, s2d(4) matmul formulation), and
  * fused identity BasicBlock kernels (basic_fused.py) in all 4 stages
(strided stage-entry BasicBlocks have no fused path and stay XLA).

Accuracy evidence for the config is the `keypoint_frozen` arm of
scripts/convergence_ab.py (same exact-BN pretrain snapshot, frozen fine-tune —
torchvision FrozenBatchNorm2d detection-model semantics).

Usage: python .bench/probe_kp_fused.py  [KP_BATCH=256 KP_STEPS=20 KP_EXACT=0]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.models.keypoint_net import CubeKeypointNetConfig
from argus_tpu.train import TrainConfig, create_train_state, make_train_step

B = int(os.environ.get("KP_BATCH", "256"))
N = int(os.environ.get("KP_STEPS", "20"))
hw = (256, 256)

rng = np.random.default_rng(0)
batch = {
    "images": jnp.asarray(rng.integers(0, 256, (B, *hw, 6), dtype=np.uint8)),
    "cube_pose": jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], jnp.float32), (B, 1)),
    "mask": jnp.ones((B,), jnp.float32),
}


def measure(tag, kcfg):
    cfg = TrainConfig(
        model_type="keypoint", keypoint_config=kcfg,
        use_augmentation=True, amp=True, wandb_log=False,
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), hw)
    step = make_train_step(model, cfg, base_seed=0, hw=hw)
    t0 = time.perf_counter()
    state, loss = step(state, batch)
    float(loss)  # honest sync through the tunnel (block_until_ready lies)
    print(f"[{tag}] compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(N):
        state, loss = step(state, batch)
    float(loss)
    dt = (time.perf_counter() - t0) / N
    print(
        f"[{tag}] {dt * 1e3:.1f} ms/step  {2 * B / dt:,.0f} cam-img/s  (B={B})",
        flush=True,
    )
    return dt


fused = measure(
    "frozen+fused",
    CubeKeypointNetConfig(bn_frozen=True, bn_frozen_affine=True, stem_frozen=True),
)
if os.environ.get("KP_EXACT", "0") == "1":
    exact = measure("exact-bn", CubeKeypointNetConfig())
    print(f"speedup {exact / fused:.2f}x", flush=True)

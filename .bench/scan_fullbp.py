"""Batch scan of the FULL-BACKPROP flagship step (VERDICT r3 #2).

The round-3 batch scan (128->768, knee at 256) was run on the frozen_stages=3
config only; the full-backprop config was only ever measured at B=128
(75.8 ms). This scans the new headline config (frozen BN + frozen stem,
frozen_stages=0, fully fused) across batch sizes to pick/justify the bench
default batch.

Run: python .bench/scan_fullbp.py   (env: SCAN_BATCHES=128,256,384,512 SCAN_STEPS=12)
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from argus_tpu.models import NCameraCNNConfig
from argus_tpu.ops.augment import AugmentationConfig
from argus_tpu.train import TrainConfig, create_train_state, make_train_step

sys.path.insert(0, "/root/repo")
from bench import _analytic_step_flops  # noqa: E402

HW = (256, 256)


def measure(batch_size, n_steps):
    cfg = TrainConfig(
        model_config=NCameraCNNConfig(
            n_cams=2, backbone="resnet50", resnet_output_dim=1024,
            bn_frozen=True, bn_frozen_affine=True, stem_frozen=True,
            frozen_stages=0,
            fuse_block="auto", fuse_proj="auto", fuse_stem="auto", fuse_stage="auto",
        ),
        augmentation_config=AugmentationConfig(),
        use_augmentation=True, amp=True, wandb_log=False,
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), HW)
    step = make_train_step(model, cfg, base_seed=0)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.integers(0, 256, (batch_size, *HW, 6), dtype=np.uint8)),
        "cube_pose": jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], jnp.float32), (batch_size, 1)),
        "mask": jnp.ones((batch_size,), jnp.float32),
    }
    state, loss = step(state, batch)
    float(loss)  # compile + sync (block_until_ready lies through the tunnel)
    state, loss = step(state, batch)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = step(state, batch)
    float(loss)
    dt = time.perf_counter() - t0
    ms = dt / n_steps * 1e3
    img_s = 2 * batch_size * n_steps / dt
    flops = _analytic_step_flops(2 * batch_size, HW, True, 1, 0)
    mfu = flops / (dt / n_steps) / 197e12
    print(f"B={batch_size:4d}  {ms:7.2f} ms/step  {img_s:8.0f} cam-img/s  MFU {mfu:.3f}", flush=True)


if __name__ == "__main__":
    batches = [int(b) for b in os.environ.get("SCAN_BATCHES", "128,256,384,512").split(",")]
    n_steps = int(os.environ.get("SCAN_STEPS", "12"))
    for b in batches:
        measure(b, n_steps)

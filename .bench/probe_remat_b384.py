"""Does remat unlock full-backprop batches past the B=256 HBM knee?

The round-4 batch scan (.bench/scan_fullbp.py) found B=384 (768 cam-images)
OOMs 16 GB HBM at full backprop: every non-frozen block saves its residual
input (twenty bf16[768,16,16,1024] stage-2 tensors alone = 384 MB each in the
OOM dump). At frozen_stages=0 only stage 0 runs as a whole-stage chain
(fuse_stage_stages=(0,)); stages 1-3 take the per-block fused path, where
`remat_stages` wraps the block in nn.remat — forward runs twice, residuals
materialize only inside the backward. This probe measures whether
remat_stages=(1,2) (the stages holding the bulk of saved-residual bytes)
fits B=384/512 and what the recompute costs.

Run: python .bench/probe_remat_b384.py   (env: PROBE_BATCHES=384,512
PROBE_REMAT=1,2 PROBE_STEPS=12)
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

from bench import _analytic_step_flops  # noqa: E402

HW = (256, 256)


def measure(batch_size, n_steps, remat_stages, unchain=False):
    # unchain: drop the whole-stage-0 Pallas chain (its saved-residual backward
    # holds three bf16[768,64,64,256] = 4.5 GB at B=384; the per-block path
    # honors remat_stages) — the chain ignores remat by design (stage_fused.py)
    cfg = TrainConfig(
        model_config=NCameraCNNConfig(
            n_cams=2, backbone="resnet50", resnet_output_dim=1024,
            bn_frozen=True, bn_frozen_affine=True, stem_frozen=True,
            frozen_stages=0, remat_stages=tuple(remat_stages),
            fuse_block="auto", fuse_proj="auto", fuse_stem="auto", fuse_stage="auto",
            fuse_stage_stages=() if unchain else (0,),
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
    print(
        f"B={batch_size:4d} remat={remat_stages} unchain={unchain}  {ms:7.2f} ms/step  "
        f"{img_s:8.0f} cam-img/s  MFU {mfu:.3f}",
        flush=True,
    )


if __name__ == "__main__":
    batches = [int(b) for b in os.environ.get("PROBE_BATCHES", "384,512").split(",")]
    remat = [int(s) for s in os.environ.get("PROBE_REMAT", "1,2").split(",")]
    unchain = os.environ.get("PROBE_UNCHAIN", "0") == "1"
    n_steps = int(os.environ.get("PROBE_STEPS", "12"))
    for b in batches:
        try:
            measure(b, n_steps, remat, unchain)
        except Exception as e:
            print(f"B={b} remat={remat} unchain={unchain}  FAILED: {type(e).__name__}: {e}", flush=True)

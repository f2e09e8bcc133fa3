"""Capture a device trace of the flagship train step (3 steps).
Env: BENCH_BN=frozen|frozentrain|exact (same semantics as bench.py: "frozen" =
full FrozenBatchNorm2d incl. affine, "frozentrain" = frozen stats + trainable
affine), BENCH_BATCH, TRACE_DIR."""
import os, sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.models import NCameraCNNConfig
from argus_tpu.train import TrainConfig, create_train_state, make_train_step
from argus_tpu import profiling

bn_mode = os.environ.get("BENCH_BN", "frozen")
B = int(os.environ.get("BENCH_BATCH", 128))
hw = (256, 256)
blk = os.environ.get("BENCH_FUSE_BLOCK", "auto")  # 'auto' defaults, '-' off, 'all', digits
if blk == "auto":
    # Trace the flagship as shipped: every fuse_* option at its "auto" default.
    fuse_kw = {}
else:
    proj = os.environ.get("BENCH_FUSE_PROJ", "0") == "1"
    stem = os.environ.get("BENCH_FUSE_STEM", "0") == "1"
    stage = os.environ.get("BENCH_FUSE_STAGE", "0")
    stages = tuple(range(4)) if blk == "all" else tuple(int(c) for c in blk if c.isdigit())
    fuse_kw = dict(
        fuse_block="on" if blk != "-" else "off",
        fuse_block_stages=stages if blk != "-" else (0, 1),
        fuse_proj="on" if proj else "off",
        fuse_stem="on" if stem else "off",
        fuse_stage="off" if stage == "0" else "on",
        fuse_stage_stages=(
            tuple(int(c) for c in stage) if stage not in ("0", "1") else (0,)
        ),
    )
stem_mode = os.environ.get("BENCH_STEM", "")
cfg = TrainConfig(
    model_config=NCameraCNNConfig(
        n_cams=2, backbone="resnet50", resnet_output_dim=1024,
        bn_frozen=bn_mode.startswith("frozen"),
        bn_frozen_affine=bn_mode in ("frozen", "frozenaff"),
        stem_frozen=stem_mode == "frozen",
        stem_grad_stride=int(stem_mode[4:]) if stem_mode.startswith("grad") else 1,
        frozen_stages=int(os.environ.get("BENCH_FROZEN_STAGES", "0")),
        **fuse_kw,
    ),
    use_augmentation=True, amp=True, wandb_log=False,
)
model, state = create_train_state(cfg, jax.random.PRNGKey(0), hw)
step = make_train_step(model, cfg, base_seed=0)
rng = np.random.default_rng(0)
batch = {"images": jnp.asarray(rng.integers(0, 256, (B, *hw, 6), dtype=np.uint8)),
         "cube_pose": jnp.tile(jnp.array([0, 0, 0, 0, 0, 0, 1], jnp.float32), (B, 1)),
         "mask": jnp.ones((B,), jnp.float32)}
state, loss = step(state, batch); float(loss)
print("warm, tracing...", flush=True)
out = os.environ.get("TRACE_DIR", f"/root/repo/outputs/traces/step_{bn_mode}")
with profiling.trace(out) as d:
    for _ in range(3):
        state, loss = step(state, batch)
    float(loss)
print("trace written to", d, flush=True)

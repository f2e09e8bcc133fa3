"""Keypoint-family batched serving throughput (round 5): the family that wins
the accuracy A/B (ACCURACY_r05_big.json: 5.5 deg / 0.48 cm) gets its offline
serving number through the REAL surface — `serve.Estimator` on a keypoint
checkpoint, which under the per-backbone policy selects bf16 + folded frozen
BN + XLA convs at batch >= SERVING_FUSED_MIN_BATCH (serve.py
throughput_tuned_config; resnet18 measured slower fused,
.bench/probe_kp_fuse_split.py). Includes soft-argmax + the batched
triangulation/Procrustes fit_pose, i.e. images -> SE(3) end-to-end.

Usage: python .bench/probe_kp_serving.py  [P_BATCH=256 P_CALLS=10]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.checkpoint import save_checkpoint
from argus_tpu.models.keypoint_net import CubeKeypointNetConfig
from argus_tpu.serve import Estimator
from argus_tpu.train import TrainConfig, checkpoint_meta, create_train_state

B = int(os.environ.get("P_BATCH", "256"))
N = int(os.environ.get("P_CALLS", "10"))
hw = (256, 256)

cfg = TrainConfig(
    model_type="keypoint", keypoint_config=CubeKeypointNetConfig(),
    wandb_log=False,
)
_, state = create_train_state(cfg, jax.random.PRNGKey(0), hw)
ckpt = "/tmp/kp_serve_probe.ckpt"
save_checkpoint(ckpt, state, meta=checkpoint_meta(cfg, hw))

est = Estimator(ckpt, height=hw[0], width=hw[1], batch_size=B)
print(f"[estimator] model_type={est.model_type} dtype={est.cfg.dtype} "
      f"fuse_block={est.cfg.fuse_block} bn_frozen={est.cfg.bn_frozen}", flush=True)

rng = np.random.default_rng(0)
batch = rng.integers(0, 256, (B, *hw, 6), dtype=np.uint8)

# e2e predict() through THIS harness's loopback tunnel ships 100 MB/call of
# uint8 — it measures the tunnel (~20 MB/s), not the serving path. Report it,
# then time the compiled program on a device-resident batch (what a co-located
# serving host sees, minus PCIe).
t0 = time.perf_counter()
pose = est.predict(batch)
e2e_ms = (time.perf_counter() - t0) * 1e3
assert pose.shape == (B, 7) and np.all(np.isfinite(pose))
print(f"[kp-serving e2e-tunnel] {e2e_ms:.0f} ms/call (100 MB uint8 feed "
      f"through the harness loopback; not the compute number)", flush=True)

d_batch = jax.device_put(batch)
float(est._infer(d_batch)[0, 0])  # warm on the device-resident shape
t0 = time.perf_counter()
for _ in range(N):
    out = est._infer(d_batch)
float(out[0, 0])  # true sync: block_until_ready returns early via the tunnel
dt = (time.perf_counter() - t0) / N
print(f"[kp-serving compute] {dt * 1e3:.2f} ms/call = {2 * B / dt:.0f} "
      f"cam-img/s @B={B}", flush=True)

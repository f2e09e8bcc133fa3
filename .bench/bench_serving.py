"""Batched offline-serving throughput: fused Pallas backbone vs pure XLA at eval.

serve.latency_tuned_config forces the pure-XLA backbone based on a BATCH-1
measurement (0.35 ms vs 0.61 ms fused). This probes the other end of the
serving envelope — offline/batched inference (relabeling a dataset, scoring a
trajectory) — where the fused forward chains should win like they do in the
training step's frozen stages. Outcome: serve.Estimator now selects the
backbone per batch size (serving_tuned_config, crossover at
SERVING_FUSED_MIN_BATCH); this probe re-measures the envelope.

Protocol: chain-of-N serialized inferences on-device with a DYNAMIC trip count
(one compiled program per config; the tunnel RTT cancels in the long-short
delta, same honest-timing trick as bench.py's p50 section).
"""

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

from argus_tpu.geom import se3_exp
from argus_tpu.models import NCameraCNN, NCameraCNNConfig
from argus_tpu.serve import latency_tuned_config

HW = (256, 256)


def make_chain(model):
    @jax.jit
    def run(variables, images, n):
        def body(_, img):
            pose = se3_exp(model.apply(variables, img, train=False))
            # serialize iterations through a (1,1,1,6) slice: a full-tensor
            # carry (`img + eps`) charges ~0.8 GB/iter of extra HBM traffic at
            # B=256 to every arm (ADVICE r3)
            bump = img[:1, :1, :1, :] + (1e-12 * jnp.sum(pose)).astype(img.dtype)
            return jax.lax.dynamic_update_slice(img, bump, (0, 0, 0, 0))

        return jnp.sum(jax.lax.fori_loop(0, n, body, images))

    return run


def measure(tag, cfg, batch):
    model = NCameraCNN(cfg)
    rng = np.random.default_rng(0)
    imgs = (
        jnp.asarray(rng.integers(0, 256, (batch, *HW, 6), dtype=np.uint8)).astype(jnp.float32)
        / 255.0
    )
    variables = model.init(jax.random.key(0), imgs[:1], train=False)
    n_long = 20 if batch >= 128 else 60
    chain = make_chain(model)
    n_lo, n_hi = jnp.int32(2), jnp.int32(2 + n_long)
    float(chain(variables, imgs, n_lo))  # compile (n is traced: one program)

    def med(n, trials=5):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(chain(variables, imgs, n))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[trials // 2]

    ms = (med(n_hi) - med(n_lo)) / n_long * 1e3
    cam_img_s = 2 * batch / (ms / 1e3)
    print(f"{tag:28s} B={batch:4d}  {ms:8.3f} ms/call  {cam_img_s:10.0f} cam-img/s", flush=True)
    return ms


if __name__ == "__main__":
    import dataclasses

    # At eval, exact BN == frozen BN (both apply running stats), so serving can
    # ALWAYS fold BN and take the fused frozen-forward chains regardless of how
    # the checkpoint was trained; bf16 matches the amp training regime. The
    # fuse gates require bn_frozen + bn_frozen_affine (models/resnet.py), which
    # is why a default-config probe showed fused == XLA: the kernels never
    # engaged.
    base = NCameraCNNConfig()
    frozen_bf16 = dataclasses.replace(
        base, bn_frozen=True, bn_frozen_affine=True, dtype="bfloat16"
    )
    xla_bf16 = latency_tuned_config(frozen_bf16)
    # Estimator compiles the CHECKPOINT's embedded config — for an amp-trained
    # flagship checkpoint that is bf16 non-fused (= the xla_bf16 row), NOT this
    # f32 row, which is what a legacy default-config checkpoint gets (ADVICE r3)
    xla_f32 = latency_tuned_config(base)
    import os

    batches = tuple(
        int(b) for b in os.environ.get("SERVE_BATCHES", "8,32,256").split(",")
    )  # batch-1 is already measured (bench.py p50: XLA 0.35 vs fused 0.61)
    for batch in batches:
        measure("fused bf16 frozen", frozen_bf16, batch)
        measure("XLA bf16 frozen", xla_bf16, batch)
        measure("XLA f32 (legacy dflt ckpt)", xla_f32, batch)

"""Convergence evidence for the flagship frozen-BN fine-tune mode, real chip.

Protocol (the honest analog of the reference's ImageNet-pretrained fine-tune,
argus/models.py:43, without downloadable weights in this environment):
  1. "pretrain": exact train-mode BN from random init (running stats become
     meaningful) on the 256x256 synthetic corners dataset;
  2. branch the SAME snapshot into two fine-tunes — exact BN vs full
     FrozenBatchNorm2d (bn_frozen + bn_frozen_affine, the bench default) —
     fresh optimizer state each, and compare pose errors.

From-scratch context (measured, 30 epochs): exact fits TRAIN to ~16 deg while
frozen barely moves (~110 deg) — frozen BN is NOT a from-scratch mode, which is
why TrainConfig defaults to exact BN and only the flagship fine-tune bench opts
into frozen.

Usage: python .bench/convergence_ab.py [pretrain_epochs=90] [finetune_epochs=60]
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.data import CameraCubePoseDataset, CameraCubePoseDatasetConfig
from argus_tpu.data.synthetic import write_synthetic_dataset
from argus_tpu.geom import pose_errors, se3_exp
from argus_tpu.models import NCameraCNNConfig
from argus_tpu.train import TrainConfig, create_train_state, make_train_step, make_optimizer

PRE = int(sys.argv[1]) if len(sys.argv) > 1 else 90
FT = int(sys.argv[2]) if len(sys.argv) > 2 else 60
B = 32

DS = "/tmp/corners256"
if not os.path.exists(DS):
    write_synthetic_dataset(DS, n_train=256, n_test=64, height=256, width=256,
                            seed=5, pose_encoded="corners")

ds = CameraCubePoseDataset(CameraCubePoseDatasetConfig(DS), train=True)
idxs = list(range(len(ds)))
imgs = np.asarray(ds.load_images_batch(idxs))
poses = np.asarray(ds.cube_poses[idxs], np.float32)
ev_imgs = jnp.asarray(imgs[:64])
ev_poses = jnp.asarray(poses[:64])


def make(mode):
    cfg = TrainConfig(
        model_config=NCameraCNNConfig(
            n_cams=2, backbone="resnet50", resnet_output_dim=1024,
            bn_frozen=(mode == "frozen"), bn_frozen_affine=(mode == "frozen"),
        ),
        use_augmentation=False, amp=True, wandb_log=False, learning_rate=1e-4,
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), (256, 256))
    return cfg, model, state, make_train_step(model, cfg, base_seed=0)


def errs(model, params, batch_stats):
    @jax.jit
    def predict(params, batch_stats, images):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          images.astype(jnp.float32) / 255.0, train=False)
        return se3_exp(out)

    rot, tr = pose_errors(predict(params, batch_stats, ev_imgs), ev_poses)
    return float(jnp.mean(rot)), float(jnp.mean(tr))


def train_epochs(state, step, n, tag):
    rng = np.random.default_rng(hash(tag) % 2**31)
    t0 = time.perf_counter()
    for ep in range(n):
        order = rng.permutation(len(idxs))
        for s0 in range(0, len(order) - B + 1, B):
            sel = order[s0 : s0 + B]
            batch = {
                "images": jnp.asarray(imgs[sel]),
                "cube_pose": jnp.asarray(poses[sel]),
                "mask": jnp.ones((B,), jnp.float32),
            }
            state, loss = step(state, batch)
    print(f"  [{tag}] {n} epochs in {time.perf_counter()-t0:.0f}s, final loss {float(loss):.5f}",
          flush=True)
    return state


# 1. pretrain with exact BN (cached across reruns — the snapshot is the input
#    to the A/B, not the experiment)
from argus_tpu.checkpoint import load_checkpoint, save_checkpoint

PRE_CKPT = f"/tmp/corners256_pretrain_{PRE}.ckpt"
cfg_e, model_e, state0, step_e = make("exact")
if os.path.exists(PRE_CKPT):
    state_pre = load_checkpoint(PRE_CKPT, state0)
    print(f"[pretrain] loaded cached snapshot {PRE_CKPT}", flush=True)
else:
    state_pre = train_epochs(state0, step_e, PRE, "pretrain-exact")
    save_checkpoint(PRE_CKPT, state_pre)
r, t = errs(model_e, state_pre.params, state_pre.batch_stats)
print(f"[pretrain] TRAIN rot {r:.1f} deg / {t*100:.2f} cm", flush=True)

# 2. branch fine-tunes from the SAME snapshot, fresh optimizer state.
#    train_step donates its input state, so each arm gets a deep COPY of the
#    snapshot (otherwise arm 2 reads buffers arm 1's first step already donated).
for mode in ("exact", "frozen"):
    cfg_m, model_m, _, step_m = make(mode)
    tx = make_optimizer(cfg_m.max_grad_norm)
    snap = jax.tree_util.tree_map(jnp.copy, state_pre)
    ft_state = snap.replace(step=jnp.zeros((), jnp.int32), opt_state=tx.init(snap.params))
    ft_state = train_epochs(ft_state, step_m, FT, f"finetune-{mode}")
    r, t = errs(model_m, ft_state.params, ft_state.batch_stats)
    print(f"[finetune-{mode}] TRAIN rot {r:.1f} deg / {t*100:.2f} cm", flush=True)

"""Repeatable accuracy A/B: pretrain with exact BN, branch into exact-BN vs
frozen-BN fine-tunes, report pose errors — as a JSON artifact.

This promotes the round-2 one-off (.bench/convergence_ab.py, gitignored logs)
into a tracked, one-command artifact (VERDICT r2 #5): accuracy is recorded per
round alongside BENCH. Protocol — the honest analog of the reference's
ImageNet-pretrained fine-tune (argus/models.py:43; no downloadable weights in
this environment):

  1. "pretrain": exact train-mode BN from random init on the synthetic corners
     dataset (data/synthetic.py pose_encoded="corners" — full 6-DoF signal),
     so the running statistics become meaningful;
  2. branch the SAME snapshot into the fine-tune ARMS (exact BN; frozen BN;
     + frozen stem; + subsampled stem grad; + progressively frozen stages),
     `arm_seeds` batch-order seeds each, fresh optimizer state per run; report
     TRAIN-set rotation (deg) and translation (cm) errors, mean + per-run.

Round-3 result (3 seeds/arm, ACCURACY_r03.json): progressive freezing is BOTH
the accuracy and the speed order — exact 8.53 deg, frozen BN 8.42, frozen stem
6.35, frozen stages 0-1 5.33 deg / 1.38 cm at 52.2 ms/step. The generic
pretrained early layers act as a fixed feature extractor / regularizer at this
dataset scale.

Usage:
    python scripts/convergence_ab.py --out ACCURACY_r03.json \
        [--pretrain-epochs 90] [--finetune-epochs 40]

The pretrain snapshot is cached under /tmp keyed by epoch count, so re-runs
re-measure only the fine-tune arms.
"""

import json
import os
import sys
import time
from dataclasses import dataclass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


@dataclass
class ABConfig:
    """Accuracy A/B configuration.

    Fields:
        out: output JSON path.
        pretrain_epochs: exact-BN pretrain length.
        finetune_epochs: length of each fine-tune arm.
        batch_size: minibatch size (the reference's default 32).
        n_train: synthetic corners dataset size.
        seed: dataset + init seed.
    """

    out: str = "ACCURACY.json"
    pretrain_epochs: int = 90
    finetune_epochs: int = 40
    batch_size: int = 32
    n_train: int = 256
    seed: int = 5
    # fine-tune repeats per arm (distinct batch-order seeds). Single-seed
    # arms measured +-2.5 deg run-to-run at this scale (frozenstem: 11.8 then
    # 6.57 deg under the identical protocol) — smaller than the effects being
    # compared, so each arm reports mean and range over `arm_seeds` repeats.
    arm_seeds: int = 3
    # comma-separated fine-tune arms to run this invocation; results MERGE
    # into an existing `out` JSON (same dataset/protocol) so new arms can be
    # measured without re-running the settled ones.
    arms: str = "exact,frozen,frozenstem,stemgrad4,stage1,stage2,stage3"


def run(cfg: ABConfig) -> dict:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    from argus_tpu.checkpoint import load_checkpoint, save_checkpoint
    from argus_tpu.data import CameraCubePoseDataset, CameraCubePoseDatasetConfig
    from argus_tpu.data.synthetic import write_synthetic_dataset
    from argus_tpu.geom import pose_errors, se3_exp
    from argus_tpu.models import NCameraCNNConfig
    from argus_tpu.train import (
        TrainConfig,
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    B = cfg.batch_size
    # default config reuses the round-2 cache names (dataset + pretrain snapshot)
    default = cfg.n_train == 256 and cfg.seed == 5
    ds_dir = "/tmp/corners256" if default else f"/tmp/corners256_n{cfg.n_train}_s{cfg.seed}"
    if not os.path.exists(os.path.join(ds_dir, f"{os.path.basename(ds_dir)}.hdf5")):
        write_synthetic_dataset(
            ds_dir, n_train=cfg.n_train, n_test=64, height=256, width=256,
            seed=cfg.seed, pose_encoded="corners",
        )

    ds = CameraCubePoseDataset(CameraCubePoseDatasetConfig(ds_dir), train=True)
    idxs = list(range(len(ds)))
    imgs = np.asarray(ds.load_images_batch(idxs))
    poses = np.asarray(ds.cube_poses[idxs], np.float32)
    # keep the whole dataset DEVICE-resident and gather batches on-device:
    # per-step host batch feeds cost ~0.7 s per 12.5 MB through the harness
    # tunnel (CLAUDE.md) — ~10x the step itself. One 100 MB upload instead.
    d_imgs = jnp.asarray(imgs)
    d_poses = jnp.asarray(poses)
    ev_imgs = d_imgs[:64]
    ev_poses = d_poses[:64]

    def make(mode):
        frozen = mode != "exact"
        tc = TrainConfig(
            model_config=NCameraCNNConfig(
                n_cams=2, backbone="resnet50", resnet_output_dim=1024,
                bn_frozen=frozen, bn_frozen_affine=frozen,
                stem_frozen=(mode == "frozenstem"),
                stem_grad_stride=int(mode[8:]) if mode.startswith("stemgrad") else 1,
                # "stageK" = progressive layer freezing: frozen BN + stem +
                # stages 0..K-1 (models/resnet.py frozen_stages)
                frozen_stages=int(mode[5:]) if mode.startswith("stage") else 0,
            ),
            use_augmentation=False, amp=True, wandb_log=False, learning_rate=1e-4,
        )
        model, state = create_train_state(tc, jax.random.PRNGKey(0), (256, 256))
        return tc, model, state, make_train_step(model, tc, base_seed=0)

    def errs(model, params, batch_stats):
        @jax.jit
        def predict(params, batch_stats, images):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images.astype(jnp.float32) / 255.0, train=False,
            )
            return se3_exp(out)

        rot, tr = pose_errors(predict(params, batch_stats, ev_imgs), ev_poses)
        return {"rot_deg": round(float(jnp.mean(rot)), 2),
                "trans_cm": round(float(jnp.mean(tr)) * 100, 2)}

    def train_epochs(state, step, n, tag):
        rng = np.random.default_rng(hash(tag) % 2**31)
        t0 = time.perf_counter()
        loss = None
        mask = jnp.ones((B,), jnp.float32)
        for _ in range(n):
            order = rng.permutation(len(idxs))
            for s0 in range(0, len(order) - B + 1, B):
                sel = jnp.asarray(order[s0 : s0 + B])
                batch = {
                    # on-device gather from the resident dataset (32 indices
                    # cross the tunnel instead of a 12.6 MB batch)
                    "images": jnp.take(d_imgs, sel, axis=0),
                    "cube_pose": jnp.take(d_poses, sel, axis=0),
                    "mask": mask,
                }
                state, loss = step(state, batch)
        print(
            f"  [{tag}] {n} epochs in {time.perf_counter() - t0:.0f}s, "
            f"final loss {float(loss):.5f}", flush=True,
        )
        return state

    result = {
        "dataset": {"kind": "synthetic-corners", "n_train": cfg.n_train,
                    "resolution": 256, "seed": cfg.seed},
        "protocol": {"pretrain_epochs": cfg.pretrain_epochs,
                     "finetune_epochs": cfg.finetune_epochs,
                     "batch_size": B, "backbone": "resnet50", "lr": 1e-4},
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "phases": {},
    }
    # merge mode: keep already-measured arms when re-running a subset
    if os.path.exists(cfg.out):
        with open(cfg.out) as f:
            prior = json.load(f)
        if prior.get("dataset") == result["dataset"] and prior.get("protocol") == result["protocol"]:
            result["phases"] = prior.get("phases", {})
            print(f"merging into existing {cfg.out} ({len(result['phases'])} phases)", flush=True)

    # 1. pretrain with exact BN (snapshot cached — it is the INPUT to the A/B)
    pre_ckpt = (
        f"/tmp/corners256_pretrain_{cfg.pretrain_epochs}.ckpt"
        if default
        else f"/tmp/corners256_pretrain_{cfg.pretrain_epochs}_s{cfg.seed}.ckpt"
    )
    _, model_e, state0, step_e = make("exact")
    if os.path.exists(pre_ckpt):
        state_pre = load_checkpoint(pre_ckpt, state0)
        print(f"[pretrain] loaded cached snapshot {pre_ckpt}", flush=True)
    else:
        state_pre = train_epochs(state0, step_e, cfg.pretrain_epochs, "pretrain-exact")
        save_checkpoint(pre_ckpt, state_pre)
    result["phases"]["pretrain_exact"] = errs(model_e, state_pre.params, state_pre.batch_stats)
    print(f"[pretrain] {result['phases']['pretrain_exact']}", flush=True)

    # 2. branch fine-tunes from the SAME snapshot, fresh optimizer state. The
    #    train step donates its input, so each arm gets a deep copy.
    # "frozenstem" = frozen BN + frozen stem (stop-gradient at the stem
    # output). The 3-seed A/B measured it BEST on accuracy (6.35 deg mean vs
    # 8.42 frozen-BN-only / 8.53 exact) as well as fastest, so it became the
    # flagship bench default. "stemgrad4" = frozen BN + stem weight-grad on
    # every 4th image, scaled (unbiased; models/resnet.py stem_grad_stride)
    # — the accuracy-preserving middle ground (7.44 deg).
    for mode in [a.strip() for a in cfg.arms.split(",") if a.strip()]:
        tc_m, model_m, _, step_m = make(mode)
        tx = make_optimizer(tc_m.max_grad_norm)
        runs = []
        for s in range(cfg.arm_seeds):
            snap = jax.tree_util.tree_map(jnp.copy, state_pre)
            ft = snap.replace(
                step=jnp.zeros((), jnp.int32), opt_state=tx.init(snap.params)
            )
            ft = train_epochs(ft, step_m, cfg.finetune_epochs, f"finetune-{mode}-s{s}")
            runs.append(errs(model_m, ft.params, ft.batch_stats))
        summary = {
            "rot_deg_mean": round(float(np.mean([r["rot_deg"] for r in runs])), 2),
            "trans_cm_mean": round(float(np.mean([r["trans_cm"] for r in runs])), 2),
            "runs": runs,
        }
        result["phases"][f"finetune_{mode}"] = summary
        print(f"[finetune-{mode}] {summary}", flush=True)

    with open(cfg.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(f"wrote {cfg.out}", flush=True)
    return result


if __name__ == "__main__":
    from argus_tpu.configs import cli

    run(cli(ABConfig))

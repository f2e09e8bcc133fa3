"""Budget scan: CAN direct se(3) regression learn ROTATION on the face-textured
proxy at all? (VERDICT r4 #1 'done' criterion: non-chance rotation OR a budget
scan on the signal-bearing proxy proving it cannot.)

The round-5 faces renderer gives the cube per-face LUMINANCE patterns —
a rotation signal hue/saturation/planckian jitter cannot erase (pinned by
tests/test_accuracy_proxy.py::test_faces_signal_survives_photometric_jitter).
The shifted A/B still shows chance rotation (~120 deg) for the flagship family
at its 60-epoch/512-image pretrain budget, so this scan sweeps the TWO budget
axes (epochs x dataset size) and the augmentation toggle, training ON the
fine-tune faces distribution directly (no shift — the easiest possible setting;
if rotation is unlearnable here it is unlearnable in the shifted protocol too).

Constant lr (the scheduler collapses lr to its floor while val sits at chance —
recorded separately in ACCURACY_r05.json final_lr); eval on the held-out test
split at epoch checkpoints.

Writes ACCURACY_r05_budget.json. Usage:
    python .bench/budget_scan_faces.py  [SCAN_EPOCHS=50,100,200,400]
"""

import json
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from argus_tpu.data import CameraCubePoseDataset, CameraCubePoseDatasetConfig
from argus_tpu.data.synthetic import FINETUNE_STYLE_FACES, write_synthetic_dataset
from argus_tpu.geom import pose_errors, se3_exp
from argus_tpu.models import NCameraCNNConfig
from argus_tpu.train import TrainConfig, create_train_state, make_train_step

RES = 256
B = 32
CHECKPOINTS = [int(x) for x in os.environ.get("SCAN_EPOCHS", "50,100,200,400").split(",")]
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "ACCURACY_r05_budget.json")


def ensure_dataset(n_train):
    # n=256 reuses the A/B's fine-tune dataset byte-for-byte
    d = f"/tmp/corners_ftBf_n{n_train}_s5_r{RES}_e256"
    if not os.path.exists(os.path.join(d, f"{os.path.basename(d)}.hdf5")):
        write_synthetic_dataset(
            d, n_train=n_train, n_test=256, height=RES, width=RES,
            seed=1005, pose_encoded="corners", style=FINETUNE_STYLE_FACES,
        )
    return d


def resident(ds_dir, train):
    ds = CameraCubePoseDataset(CameraCubePoseDatasetConfig(ds_dir), train=train)
    idxs = list(range(len(ds)))
    return (
        jnp.asarray(np.asarray(ds.load_images_batch(idxs))),
        jnp.asarray(np.asarray(ds.cube_poses[idxs], np.float32)),
    )


def run_arm(tag, n_train, augment, lr=1e-4):
    ds_dir = ensure_dataset(n_train)
    tr_imgs, tr_poses = resident(ds_dir, True)
    ev_imgs, ev_poses = resident(ds_dir, False)
    cfg = TrainConfig(
        model_config=NCameraCNNConfig(n_cams=2, backbone="resnet50", resnet_output_dim=1024),
        use_augmentation=augment, amp=True, wandb_log=False, learning_rate=lr,
        val_spaghetti=False,
    )
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), (RES, RES))
    step = make_train_step(model, cfg, base_seed=0, hw=(RES, RES))

    @jax.jit
    def predict(params, batch_stats, images):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images.astype(jnp.float32) / 255.0, train=False,
        )
        return se3_exp(out)

    def errs(state):
        out = {}
        for name, imgs, poses in (("test", ev_imgs, ev_poses), ("train", tr_imgs[:256], tr_poses[:256])):
            rot, tr = pose_errors(predict(state.params, state.batch_stats, imgs), poses)
            out[f"{name}_rot_deg"] = round(float(jnp.mean(rot)), 2)
            out[f"{name}_trans_cm"] = round(float(jnp.mean(tr)) * 100, 2)
        return out

    rng = np.random.default_rng(zlib.crc32(tag.encode()))
    mask = jnp.ones((B,), jnp.float32)
    n_ex = int(tr_imgs.shape[0])
    curve = {}
    done = 0
    t0 = time.perf_counter()
    for target in CHECKPOINTS:
        for _ in range(target - done):
            order = rng.permutation(n_ex)
            for s0 in range(0, n_ex - B + 1, B):
                sel = jnp.asarray(order[s0 : s0 + B])
                state, loss = step(state, {
                    "images": jnp.take(tr_imgs, sel, axis=0),
                    "cube_pose": jnp.take(tr_poses, sel, axis=0),
                    "mask": mask,
                })
        done = target
        curve[str(target)] = errs(state)
        print(f"  [{tag}] epoch {target} ({time.perf_counter()-t0:.0f}s): "
              f"{curve[str(target)]}, loss {float(loss):.4f}", flush=True)
    return curve


def main():
    result = {
        "question": "can direct se(3) regression learn rotation on the face-textured proxy",
        "protocol": {"resolution": RES, "batch_size": B, "lr": 1e-4,
                     "backbone": "resnet50", "epochs": CHECKPOINTS,
                     "train_distribution": "FINETUNE_STYLE_FACES (no shift: easiest case)",
                     "eval": "held-out test split (256 poses)"},
        "chance_rot_deg": "~126 (uniform random orientation pairs)",
        "arms": {},
    }
    if os.path.exists(OUT):
        with open(OUT) as f:
            result["arms"] = json.load(f).get("arms", {})
    arms = [
        ("n256_aug", 256, True),
        ("n256_noaug", 256, False),
        ("n1024_aug", 1024, True),
    ]
    for tag, n, aug in arms:
        if tag in result["arms"]:
            print(f"[{tag}] cached, skipping", flush=True)
            continue
        result["arms"][tag] = {"n_train": n, "augment": aug, "curve": run_arm(tag, n, aug)}
        with open(OUT, "w") as f:
            json.dump(result, f, indent=2)
            f.write("\n")
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()

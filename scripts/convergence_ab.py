"""Repeatable accuracy A/B: pretrain, branch into fine-tune arms, report pose
errors — as a JSON artifact (ACCURACY_r{N}.json, recorded per round).

Two protocols:

  * "shifted" (default, round 4+): TRANSFER-shifted — pretrain on one rendering
    distribution (data/synthetic.py PRETRAIN_STYLE: textured noisy backgrounds,
    big jittered dots, occluders), fine-tune on a DISJOINT one (FINETUNE_STYLE:
    near-flat dark background, small clean dots). This is the honest synthetic
    analog of the reference's ImageNet-pretrain -> Unity-sim fine-tune
    (argus/models.py:43 pretrained=True; argus/train.py:315-320 full backprop).
    It fixes the round-3 protocol's structural bias (VERDICT r3 #1): pretraining
    on the SAME distribution it fine-tunes on favors freezing, because the
    frozen features are already exactly the target features.
  * "same": the round-3 protocol (pretrain == fine-tune distribution), kept so
    the two can be compared.

Errors are reported on the fine-tune distribution's HELD-OUT TEST split (the
generalization number — round 3 reported train-set errors) AND on its train
split (fit number), per arm, mean over `arm_seeds` batch-order seeds.

Round-5 protocol upgrades (VERDICT r4 #1-3):

  * `faces` (default True): the cube renders with per-face LUMINANCE patterns
    (data/synthetic.py PRETRAIN/FINETUNE_STYLE_FACES) — a rotation signal the
    photometric augmentation stack cannot erase, unlike the corner-dot COLOR
    identity the round-4 protocol relied on (the reference cube carries
    per-face textures: mujoco/common_assets/reorientation_cube.xml:1-34).
    `--faces False` reproduces the round-4 dots-only protocol.
  * `sched` (default True): fine-tune arms run the PRODUCTION training
    semantics — per-epoch validation loss drives ReduceLROnPlateau
    (argus_tpu.train.ReduceLROnPlateau == the reference's scheduler,
    /root/reference/argus/train.py:233,348) instead of raw constant-lr steps,
    removing the round-4 confound where the long-budget exact arm diverged
    for want of a scheduler (ACCURACY_r04_long.json).
  * `arm_seeds` default 5 and per-arm MEDIAN + IQR reported alongside means
    (3-seed means were dominated by single catastrophic runs).

Arms: exact BN full backprop; frozen BN; + frozen stem; progressive frozen
stages 1-4 (the bench-default ladder); "keypoint" — the corner-heatmap +
triangulation/Procrustes family (VERDICT r3 #5), trained with its own
pretrain -> fine-tune under the same shift and scored on the same geodesic
pose-error metrics via fit_pose; and "keypoint_frozen" — the same family
fine-tuned with frozen BN(+affine) + frozen stem from the SAME exact-BN
pretrain snapshot, i.e. the configuration that unlocks the fused Pallas
BasicBlock/stem kernels for keypoint training (this arm is its accuracy
evidence; its throughput evidence is the `keypoint_train` bench entry).

Usage:
    python scripts/convergence_ab.py --out ACCURACY_r04.json
    python scripts/convergence_ab.py --protocol same --pretrain-epochs 90 ...

Pretrain snapshots + datasets are cached under /tmp keyed by protocol/size, so
re-runs re-measure only the fine-tune arms; results for arms already in `out`
are merged, not re-run.
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
        protocol: "shifted" (disjoint pretrain/fine-tune render styles) or
            "same" (round-3 protocol: one distribution for both).
        pretrain_epochs: pretrain length (exact train-mode BN from random init).
        finetune_epochs: length of each fine-tune arm.
        batch_size: minibatch size (the reference's default 32).
        n_pretrain: pretrain dataset size (shifted protocol; "same" reuses
            n_train).
        n_train: fine-tune dataset size.
        seed: dataset + init seed.
    """

    out: str = "ACCURACY.json"
    protocol: str = "shifted"
    pretrain_epochs: int = 60
    finetune_epochs: int = 40
    batch_size: int = 32
    n_pretrain: int = 512
    n_train: int = 256
    seed: int = 5
    # held-out test-split size of the fine-tune dataset (the headline metric)
    n_eval: int = 256
    # apply the on-device augmentation stack during pretrain/fine-tune — the
    # reference's semantics (argus/data.py:41-103 runs the full kornia stack in
    # train mode). The round-3 protocol disabled it; round-4 measurement shows
    # that without augmentation, 256-image fine-tunes MEMORIZE (train-set error
    # fits, held-out test error stays at chance ~126 deg) — so the de-caveated
    # protocol trains with augmentation on realistic dataset sizes.
    augment: bool = True
    # render resolution (256 = the reference crop; smaller for CPU smoke tests)
    resolution: int = 256
    # fine-tune repeats per arm (distinct batch-order seeds). Run-to-run
    # spread at this scale is large (round-4 3-seed arms had single
    # catastrophic runs dominating the mean — VERDICT r4), so arms report
    # median + IQR over `arm_seeds` repeats alongside the mean.
    arm_seeds: int = 5
    # comma-separated fine-tune arms to run this invocation; results MERGE
    # into an existing `out` JSON (same dataset/protocol) so new arms can be
    # measured without re-running the settled ones.
    arms: str = "exact,frozen,frozenstem,stage1,stage2,stage3,keypoint,keypoint_frozen"
    # per-face luminance patterns on the cube (round-5 rotation signal that
    # survives photometric augmentation); False = the round-4 dots-only proxy
    faces: bool = True
    # production fine-tune semantics: per-epoch val loss -> ReduceLROnPlateau
    # (the reference's scheduler); False = round-4 raw constant-lr steps
    sched: bool = True


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
    from argus_tpu.data.synthetic import (
        FINETUNE_STYLE,
        FINETUNE_STYLE_FACES,
        PRETRAIN_STYLE,
        PRETRAIN_STYLE_FACES,
        write_synthetic_dataset,
    )
    from argus_tpu.geom import pose_errors, se3_exp
    from argus_tpu.models import NCameraCNNConfig
    from argus_tpu.models.keypoint_net import (
        CubeKeypointNetConfig,
        fit_pose,
        nominal_camera_matrices,
    )
    from argus_tpu.train import (
        ReduceLROnPlateau,
        TrainConfig,
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )

    B = cfg.batch_size
    shifted = cfg.protocol == "shifted"
    assert cfg.protocol in ("shifted", "same"), cfg.protocol
    pre_style = PRETRAIN_STYLE_FACES if cfg.faces else PRETRAIN_STYLE
    ft_style = FINETUNE_STYLE_FACES if cfg.faces else FINETUNE_STYLE
    fc = "f" if cfg.faces else ""

    res = cfg.resolution

    def ensure_dataset(ds_dir, n_train, n_test, seed, style):
        if not os.path.exists(os.path.join(ds_dir, f"{os.path.basename(ds_dir)}.hdf5")):
            write_synthetic_dataset(
                ds_dir, n_train=n_train, n_test=n_test, height=res, width=res,
                seed=seed, pose_encoded="corners", style=style,
            )
        return ds_dir

    if shifted:
        pre_dir = ensure_dataset(
            f"/tmp/corners_preA{fc}_n{cfg.n_pretrain}_s{cfg.seed}_r{res}",
            cfg.n_pretrain, 8, cfg.seed, pre_style,
        )
        # different writer seed: pretrain/fine-tune share NOTHING — not poses,
        # not nuisance draws
        ft_dir = ensure_dataset(
            f"/tmp/corners_ftB{fc}_n{cfg.n_train}_s{cfg.seed}_r{res}_e{cfg.n_eval}",
            cfg.n_train, cfg.n_eval, cfg.seed + 1000, ft_style,
        )
    else:
        default = cfg.n_train == 256 and cfg.seed == 5 and not cfg.faces
        ds_dir = "/tmp/corners256" if default else f"/tmp/corners256{fc}_n{cfg.n_train}_s{cfg.seed}"
        pre_dir = ft_dir = ensure_dataset(
            ds_dir, cfg.n_train, 64, cfg.seed, ft_style if cfg.faces else None
        )

    def resident(ds_dir, train):
        """Whole split DEVICE-resident: per-step host batch feeds cost ~0.7 s
        per 12.5 MB through the harness tunnel (CLAUDE.md) — ~10x the step
        itself. One bulk upload instead; batches gather on-device."""
        ds = CameraCubePoseDataset(CameraCubePoseDatasetConfig(ds_dir), train=train)
        idxs = list(range(len(ds)))
        imgs = np.asarray(ds.load_images_batch(idxs))
        poses = np.asarray(ds.cube_poses[idxs], np.float32)
        return jnp.asarray(imgs), jnp.asarray(poses)

    pre_imgs, pre_poses = resident(pre_dir, train=True)
    ft_imgs, ft_poses = (pre_imgs, pre_poses) if pre_dir == ft_dir else resident(ft_dir, True)
    ev_imgs, ev_poses = resident(ft_dir, train=False)  # held-out TEST split
    tr_imgs, tr_poses = ft_imgs[:64], ft_poses[:64]  # fit-number probe

    def make(mode):
        if mode.startswith("keypoint"):
            # "keypoint_frozen" = fused-compatible fine-tune config: frozen BN
            # (+affine) + frozen stem — torchvision FrozenBatchNorm2d detection
            # semantics, and exactly the gate for the fused Pallas BasicBlock/
            # stem kernels (models/resnet.py fuse_block/fuse_stem "auto").
            # Pretrain is ALWAYS exact BN; frozen applies at fine-tune, like
            # the pose-cnn frozen arms branching from the exact snapshot.
            frozen = mode == "keypoint_frozen"
            tc = TrainConfig(
                model_type="keypoint",
                keypoint_config=CubeKeypointNetConfig(
                    bn_frozen=frozen, bn_frozen_affine=frozen,
                    stem_frozen=frozen,
                ),
                use_augmentation=cfg.augment, amp=True, wandb_log=False,
                learning_rate=1e-4, val_spaghetti=False,
            )
        else:
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
                use_augmentation=cfg.augment, amp=True, wandb_log=False,
                learning_rate=1e-4, val_spaghetti=False,
            )
        model, state = create_train_state(tc, jax.random.PRNGKey(0), (res, res))
        # eval_step drives the plateau scheduler (production val semantics;
        # val_spaghetti off so the scheduler sees a clean loss)
        ev = make_eval_step(model, tc, base_seed=0, hw=(res, res)) if cfg.sched else None
        return tc, model, state, make_train_step(model, tc, base_seed=0, hw=(res, res)), ev

    cam_P = nominal_camera_matrices(res, res)

    def make_errs(model, keypoint=False):
        @jax.jit
        def predict(params, batch_stats, images):
            out = model.apply(
                {"params": params, "batch_stats": batch_stats},
                images.astype(jnp.float32) / 255.0, train=False,
            )
            if keypoint:
                uv, _ = out
                return fit_pose(cam_P, uv)
            return se3_exp(out)

        def errs(params, batch_stats):
            out = {}
            for tag, imgs, poses in (("", ev_imgs, ev_poses), ("train_", tr_imgs, tr_poses)):
                rot, tr = pose_errors(predict(params, batch_stats, imgs), poses)
                out[f"{tag}rot_deg"] = round(float(jnp.mean(rot)), 2)
                out[f"{tag}trans_cm"] = round(float(jnp.mean(tr)) * 100, 2)
            return out

        return errs

    def train_epochs(state, step, n, tag, d_imgs, d_poses, eval_step=None):
        import zlib

        # crc32, not hash(): str hash is salted per process — batch orders must
        # be reproducible across invocations (merge mode re-runs single arms)
        rng = np.random.default_rng(zlib.crc32(tag.encode()))
        t0 = time.perf_counter()
        loss = None
        mask = jnp.ones((B,), jnp.float32)
        n_ex = int(d_imgs.shape[0])
        # production fine-tune semantics (VERDICT r4 #2): per-epoch validation
        # loss on the held-out split drives ReduceLROnPlateau — the reference
        # schedules exactly this way (argus/train.py:233,348 validates every
        # epoch on the dataset's test split); train() mirrors it at :817-830.
        scheduler = ReduceLROnPlateau(patience=5, factor=0.5) if eval_step else None
        ev_mask = jnp.ones((int(ev_imgs.shape[0]),), jnp.float32) if eval_step else None
        for _ in range(n):
            order = rng.permutation(n_ex)
            for s0 in range(0, n_ex - B + 1, B):
                sel = jnp.asarray(order[s0 : s0 + B])
                batch = {
                    # on-device gather from the resident dataset (32 indices
                    # cross the tunnel instead of a 12.6 MB batch)
                    "images": jnp.take(d_imgs, sel, axis=0),
                    "cube_pose": jnp.take(d_poses, sel, axis=0),
                    "mask": mask,
                }
                state, loss = step(state, batch)
            if scheduler is not None:
                lsum, cnt = eval_step(
                    state, {"images": ev_imgs, "cube_pose": ev_poses, "mask": ev_mask}
                )
                new_lr = scheduler.step(float(lsum) / float(cnt), float(state.lr))
                if new_lr != float(state.lr):
                    state = state.replace(lr=jnp.asarray(new_lr, jnp.float32))
        lr_note = f", final lr {float(state.lr):.2e}" if scheduler else ""
        print(
            f"  [{tag}] {n} epochs in {time.perf_counter() - t0:.0f}s, "
            f"final loss {float(loss):.5f}{lr_note}", flush=True,
        )
        return state

    result = {
        "protocol_name": cfg.protocol,
        "dataset": {
            "kind": "synthetic-corners" + ("-faces" if cfg.faces else ""),
            "faces": cfg.faces,
            "shift": (
                {"pretrain_style": "PRETRAIN_STYLE" + ("_FACES" if cfg.faces else ""),
                 "finetune_style": "FINETUNE_STYLE" + ("_FACES" if cfg.faces else ""),
                 "n_pretrain": cfg.n_pretrain}
                if shifted else None
            ),
            "n_train": cfg.n_train, "resolution": res, "seed": cfg.seed,
            "eval": "held-out test split of the fine-tune distribution",
        },
        "protocol": {"pretrain_epochs": cfg.pretrain_epochs,
                     "finetune_epochs": cfg.finetune_epochs,
                     "batch_size": B, "backbone": "resnet50", "lr": 1e-4,
                     "augment": cfg.augment, "n_eval": cfg.n_eval,
                     "scheduler": (
                         {"kind": "ReduceLROnPlateau", "patience": 5, "factor": 0.5,
                          "val_cadence_epochs": 1}
                         if cfg.sched else None
                     ),
                     "arm_seeds": cfg.arm_seeds},
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

    arms = [a.strip() for a in cfg.arms.split(",") if a.strip()]
    cache_tag = (f"{cfg.protocol}_{cfg.pretrain_epochs}_n{cfg.n_pretrain if shifted else cfg.n_train}"
                 f"_s{cfg.seed}_r{res}{'_aug' if cfg.augment else ''}{'_faces' if cfg.faces else ''}")

    # 1. pretrain with exact BN (snapshot cached — it is the INPUT to the A/B;
    #    constant lr, matching the reference where pretraining is an external
    #    input too: ImageNet weights, argus/models.py:43)
    pre_ckpt = f"/tmp/corners_pretrain_{cache_tag}.ckpt"
    _, model_e, state0, step_e, _ = make("exact")
    errs_e = make_errs(model_e)
    if os.path.exists(pre_ckpt):
        state_pre = load_checkpoint(pre_ckpt, state0)
        print(f"[pretrain] loaded cached snapshot {pre_ckpt}", flush=True)
    else:
        state_pre = train_epochs(
            state0, step_e, cfg.pretrain_epochs, "pretrain-exact", pre_imgs, pre_poses
        )
        save_checkpoint(pre_ckpt, state_pre)
    result["phases"]["pretrain_exact"] = errs_e(state_pre.params, state_pre.batch_stats)
    print(f"[pretrain] {result['phases']['pretrain_exact']}", flush=True)

    # 2. branch fine-tunes from the SAME snapshot, fresh optimizer state. The
    #    train step donates its input, so each arm gets a deep copy. The
    #    keypoint family cannot share the pose_cnn snapshot (different
    #    architecture), so it gets its own cached pretrain under the same
    #    shift, then the same fine-tune treatment.
    for mode in arms:
        tc_m, model_m, state_m0, step_m, ev_m = make(mode)
        errs_m = make_errs(model_m, keypoint=mode.startswith("keypoint"))
        if mode.startswith("keypoint"):
            kp_ckpt = f"/tmp/corners_pretrain_kp_{cache_tag}.ckpt"
            if os.path.exists(kp_ckpt):
                # frozen/exact keypoint configs are variable-tree neutral, so
                # the exact-BN pretrain snapshot loads into either arm's state
                snap_src = load_checkpoint(kp_ckpt, state_m0)
                print(f"[keypoint] loaded cached snapshot {kp_ckpt}", flush=True)
            else:
                if mode == "keypoint":
                    state_e0, step_e_kp = state_m0, step_m
                else:
                    _, _, state_e0, step_e_kp, _ = make("keypoint")
                snap = train_epochs(
                    state_e0, step_e_kp, cfg.pretrain_epochs, "pretrain-keypoint",
                    pre_imgs, pre_poses,
                )
                save_checkpoint(kp_ckpt, snap)
                snap_src = load_checkpoint(kp_ckpt, state_m0)
            result["phases"]["pretrain_keypoint"] = errs_m(
                snap_src.params, snap_src.batch_stats
            )
            print(f"[pretrain-keypoint] {result['phases']['pretrain_keypoint']}", flush=True)
        else:
            snap_src = state_pre
        tx = make_optimizer(tc_m.max_grad_norm)
        runs = []
        for s in range(cfg.arm_seeds):
            snap = jax.tree_util.tree_map(jnp.copy, snap_src)
            ft = snap.replace(
                step=jnp.zeros((), jnp.int32), opt_state=tx.init(snap.params)
            )
            ft = train_epochs(
                ft, step_m, cfg.finetune_epochs, f"finetune-{mode}-s{s}",
                ft_imgs, ft_poses, eval_step=ev_m,
            )
            run = errs_m(ft.params, ft.batch_stats)
            if cfg.sched:
                run["final_lr"] = float(f"{float(ft.lr):.3g}")
            runs.append(run)

        def stats(key):
            v = np.array([r[key] for r in runs], np.float64)
            q1, med, q3 = np.percentile(v, [25, 50, 75])
            # median + IQR are the quotable numbers (VERDICT r4: 3-seed means
            # were dominated by single catastrophic runs); mean kept for
            # continuity with the round-4 artifact
            return {"median": round(float(med), 2), "iqr": [round(float(q1), 2), round(float(q3), 2)],
                    "mean": round(float(np.mean(v)), 2)}

        summary = {
            "rot_deg": stats("rot_deg"),
            "trans_cm": stats("trans_cm"),
            "train_rot_deg": stats("train_rot_deg"),
            "train_trans_cm": stats("train_trans_cm"),
            # legacy mean keys (round-4 readers)
            "rot_deg_mean": round(float(np.mean([r["rot_deg"] for r in runs])), 2),
            "trans_cm_mean": round(float(np.mean([r["trans_cm"] for r in runs])), 2),
            "runs": runs,
        }
        result["phases"][f"finetune_{mode}"] = summary
        print(f"[finetune-{mode}] {summary}", flush=True)

        with open(cfg.out, "w") as f:  # checkpoint the artifact after EVERY arm
            json.dump(result, f, indent=2)
            f.write("\n")

    with open(cfg.out, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(f"wrote {cfg.out}", flush=True)
    return result


if __name__ == "__main__":
    from argus_tpu.configs import cli

    run(cli(ABConfig))

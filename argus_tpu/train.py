"""Training runtime: jitted train step + data-parallel loop.

Capability parity with the reference's `argus/train.py`, redesigned for TPU:

  reference                                   | here
  --------------------------------------------|----------------------------------
  DDP + NCCL process group (train.py:137-140) | ("data","model") Mesh; jit +
                                              | NamedSharding; XLA psum over ICI
  one process per GPU via mp.spawn (:373-378) | one process drives all local chips
  DistributedSampler (:154-166)               | HostDataLoader per-host sharding
  fp16 autocast + GradScaler (:234,298-320)   | bf16 compute (`amp` flag); loss in
                                              | fp32; no scaler needed (bf16 range)
  torch.compile + per-shape warmup (:202-229) | jit with ONE static shape (final
                                              | batches are padded + masked)
  Adam + clip(1.0) + ReduceLROnPlateau (:232) | optax adam + global-norm clip +
                                              | host-side plateau schedule
  per-step wandb loss (:311-312)              | MetricsLogger (JSONL, wandb-compat)
  rank-0 state_dict save (:350-358)           | process-0 msgpack checkpoint holding
                                              | the FULL train state (resumable)

The geodesic loss is the reference's exactly: L2 in the SE(3) tangent space
(train.py:105-119), via argus_tpu.geom instead of pypose.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from argus_tpu import ROOT
from argus_tpu.checkpoint import AsyncCheckpointer, load_checkpoint, save_checkpoint
from argus_tpu.data import (
    CameraCubePoseDataset,
    CameraCubePoseDatasetConfig,
    DeviceResidentData,
    ResidentShardedData,
    HostDataLoader,
)
from argus_tpu.geom import se3_exp, se3_inverse, se3_log, se3_multiply
from argus_tpu.logging_utils import MetricsLogger, generate_run_id
from argus_tpu.models import NCameraCNN, NCameraCNNConfig
from argus_tpu.models.keypoint_net import (
    CubeKeypointNet,
    CubeKeypointNetConfig,
    fit_pose,
    keypoint_loss_fn,
    nominal_camera_matrices,
)
from argus_tpu.ops.augment import AugmentationConfig, apply_augmentation, spaghetti_arcs
from argus_tpu.ops.image import u8_to_f32
from argus_tpu.parallel import device_prefetch, global_batch, make_mesh, param_shardings


# ───────────────────────────── config ─────────────────────────────


@dataclass(frozen=False)
class TrainConfig:
    """Configuration for training (field parity: argus/train.py:29-102).

    For path fields you can pass an absolute path, a cwd-relative path, or a path
    relative to the repo ROOT.

    Fields:
        dataset_config: dataset configuration.
        model_config: model configuration.
        compile_model: kept for CLI parity; jit is always on in JAX.
        batch_size: GLOBAL batch size (sharded over the data mesh axis).
        learning_rate: Adam learning rate.
        n_epochs: number of epochs.
        max_grad_norm: global gradient-norm clip.
        random_seed: seed for params, shuffling, and augmentation streams.
        multigpu: shard the train step over all local chips (reference flag name;
            here it means "use every device in jax.devices()" on a data axis).
        num_model_shards: tensor-parallel axis size for the wide dense layers.
        amp: bf16 compute (the TPU analogue of the reference's fp16 autocast).
        val_epochs / print_epochs / save_epochs: cadence controls.
        save_dir: checkpoint directory.
        use_augmentation: apply the augmentation stack in the train step.
        val_spaghetti: reference behavior — spaghetti arcs ARE applied to val data
            (argus/data.py:213 runs regardless of the train flag) and therefore
            drive the plateau scheduler; disable for clean val losses.
        wandb_project / wandb_log: metrics logging (JSONL locally; wandb if present).
        resume_from: checkpoint path to resume full train state from.
    """

    # None is allowed at construction time (bench/dryrun harnesses feed synthetic
    # batches directly); `initialize_training` requires a real dataset config.
    dataset_config: Optional[CameraCubePoseDatasetConfig] = None
    model_config: NCameraCNNConfig = field(default_factory=NCameraCNNConfig)
    # model family: "pose_cnn" (direct se(3) regression, the flagship) or
    # "keypoint" (corner heatmaps + differentiable triangulation/Procrustes PnP)
    model_type: str = "pose_cnn"
    keypoint_config: CubeKeypointNetConfig = field(default_factory=CubeKeypointNetConfig)
    compile_model: bool = True

    # training parameters
    batch_size: int = 32
    learning_rate: float = 1e-4
    n_epochs: int = 100
    max_grad_norm: float = 1.0
    random_seed: int = 42

    # parallelism / speed
    multigpu: bool = False
    # number of chips to use when multigpu (None = all local devices; the reference's
    # `num_gpus`, argus/train.py:69)
    num_chips: Optional[int] = None
    num_model_shards: int = 1
    amp: bool = False
    # loader workers, derived from the actual host (the reference hard-codes 16,
    # argus/train.py:147-149 — a lie on a 1-core box; VERDICT r2)
    num_workers: int = field(default_factory=lambda: min(16, max(1, os.cpu_count() or 1)))
    # gradient accumulation: split each batch into this many microbatches and
    # combine their mean gradients by mask count (EXACT full-batch masked-mean
    # semantics; requires bn_frozen). Activation memory drops ~k-fold — the
    # lever for batch sizes past HBM on small slices.
    grad_accum_steps: int = 1
    # device-resident feed (data/resident.py): when the train split's on-device
    # footprint fits this HBM budget (MB), upload it once and run whole epochs
    # as ONE on-chip program (make_resident_epoch_step) — sustained end-to-end
    # throughput equals compute throughput instead of being host/feed-bound
    # (the reference's defining bottleneck, argus/train.py:64). 0 disables.
    # Single-process runs only; multi-host falls back to the host loader.
    device_resident_mb: float = 2048.0

    # validation, printing, and saving
    val_epochs: int = 1
    print_epochs: int = 1
    save_epochs: int = 5
    save_dir: str = os.path.join(ROOT, "outputs", "models")
    # overlap checkpoint fetch+serialize+write with training (AsyncCheckpointer:
    # donation-safe on-device snapshot, worker-thread I/O); the final save is
    # always drained before train() returns
    async_checkpoint: bool = True

    # data augmentation
    augmentation_config: AugmentationConfig = field(default_factory=AugmentationConfig)
    use_augmentation: bool = True
    val_spaghetti: bool = True

    # logging / resume
    wandb_project: str = "argus-estimator"
    wandb_log: bool = True
    resume_from: Optional[str] = None

    def __post_init__(self) -> None:
        assert isinstance(self.save_dir, str)
        if not os.path.exists(self.save_dir):
            if os.path.exists(ROOT + "/" + self.save_dir):
                self.save_dir = ROOT + "/" + self.save_dir
            else:
                os.makedirs(self.save_dir, exist_ok=True)


# ───────────────────────────── loss ─────────────────────────────


def geometric_loss_fn(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Geodesic SE(3) loss: || Log( Exp(pred) . target^-1 ) ||^2 per sample.

    pred: (..., 6) se(3) vectors; target: (..., 7) SE(3) poses (xyzw quats).
    Exact semantics of the reference (argus/train.py:105-119). Always fp32.
    """
    err = se3_log(se3_multiply(se3_exp(pred.astype(jnp.float32)), se3_inverse(target)))
    return jnp.sum(err**2, axis=-1)


# ───────────────────────────── train state ─────────────────────────────


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    lr: jnp.ndarray  # current learning rate (plateau-scheduled on host)


def make_optimizer(max_grad_norm: float) -> optax.GradientTransformation:
    """clip-then-Adam, identical order to the reference (unscale -> clip -> step,
    argus/train.py:316-319). The LR is applied separately from TrainState.lr so the
    host-side plateau scheduler can adjust it without rebuilding opt state."""
    return optax.chain(optax.clip_by_global_norm(max_grad_norm), optax.scale_by_adam())


def _resolved_model_config(cfg: TrainConfig):
    """(model_type, model config with the amp dtype override applied) — the
    ONE place the override lives, shared by build_model and checkpoint_meta so
    the stored metadata can never drift from the model that actually trained."""
    import dataclasses as dc

    model_type = getattr(cfg, "model_type", "pose_cnn")
    mcfg = cfg.keypoint_config if model_type == "keypoint" else cfg.model_config
    if cfg.amp and mcfg.dtype != "bfloat16":
        mcfg = dc.replace(mcfg, dtype="bfloat16")
    return model_type, mcfg


def checkpoint_meta(cfg: TrainConfig, hw: Optional[tuple] = None) -> dict:
    """Model metadata stored INSIDE checkpoints (checkpoint.py format 2): the
    family and the exact config that trained (amp dtype override applied, like
    build_model), plus the crop — everything serve/validate/validate_real need
    to reconstruct the model without out-of-band knowledge (VERDICT r2 #4).

    `hw` is the ACTUAL training resolution (train() passes its resolved
    sample_hw); without it the dataset config's crop is used. The bare
    (256, 256) default only applies when neither is known — a checkpoint
    trained at the dataset's native size must not claim a resolution the
    model never saw."""
    import dataclasses as dc

    model_type, mcfg = _resolved_model_config(cfg)
    ds = getattr(cfg, "dataset_config", None)
    crop = list(
        hw or (ds.center_crop if ds is not None else None) or (256, 256)
    )
    return {"model_type": model_type, "model_config": dc.asdict(mcfg), "center_crop": crop}


def build_model(cfg: TrainConfig):
    """Construct the configured model family, applying the amp dtype override."""
    model_type, mcfg = _resolved_model_config(cfg)
    if model_type == "keypoint":
        return CubeKeypointNet(mcfg), mcfg.n_cams
    return NCameraCNN(mcfg), mcfg.n_cams


def create_train_state(cfg: TrainConfig, key: jax.Array, sample_hw: tuple) -> tuple:
    """Initialize model + optimizer state. Returns (model, state)."""
    model, n_cams = build_model(cfg)
    dummy = jnp.zeros((1, *sample_hw, 3 * n_cams), jnp.float32)
    variables = model.init(key, dummy, train=False)
    tx = make_optimizer(cfg.max_grad_norm)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        lr=jnp.asarray(cfg.learning_rate, jnp.float32),
    )
    return model, state


# ───────────────────────────── steps ─────────────────────────────


def make_train_step(model: NCameraCNN, cfg: TrainConfig, base_seed: int, mesh=None, hw=None):
    """Build the jitted train step (see make_train_step_body for the semantics)."""
    return jax.jit(
        make_train_step_body(model, cfg, base_seed, mesh=mesh, hw=hw), donate_argnums=(0,)
    )


def make_train_step_body(model: NCameraCNN, cfg: TrainConfig, base_seed: int, mesh=None, hw=None):
    """Build the (unjitted) train-step body. The whole hot path — u8->f32,
    augmentation, forward, loss, backward, clipped Adam update — is ONE XLA
    program when jitted (make_train_step), and is also scannable as the body of
    the whole-epoch resident program (make_resident_epoch_step).

    mesh: pass the active Mesh when the batch is sharded over a >1-device "data"
    axis so the Pallas blur kernel runs shard_map-ped per device (ops/augment.py).

    Pure-DP meshes (n_model == 1) with frozen-BN models run the loss+gradient
    computation under `shard_map` with an explicit `psum` of gradients — the
    idiomatic XLA-collective equivalent of DDP's backward all-reduce
    (reference: argus/train.py:199,316) — which also lets the fused Pallas
    kernels (pointwise conv, whole-stack augmentation) run per-shard without
    needing SPMD partitioning rules. Meshes with a model axis (TP) or exact
    train-mode BN (whose batch statistics are computed over the GLOBAL batch, a
    strengthening of DDP's per-replica stats) keep the GSPMD path."""
    tx = make_optimizer(cfg.max_grad_norm)
    aug_cfg = cfg.augmentation_config
    model_type = getattr(cfg, "model_type", "pose_cnn")
    n_cams = (
        cfg.keypoint_config.n_cams if model_type == "keypoint" else cfg.model_config.n_cams
    )
    mcfg = cfg.keypoint_config if model_type == "keypoint" else cfg.model_config
    shmap_dp = (
        mesh is not None
        and mesh.shape.get("data", 1) > 1
        and mesh.shape.get("model", 1) == 1
        and getattr(mcfg, "bn_frozen", False)
    )
    # under amp the whole input pipeline (convert + augment) runs in bf16: half the
    # HBM traffic for the hottest elementwise stage, and the model consumes bf16 anyway
    feed_dtype = jnp.bfloat16 if cfg.amp else jnp.float32
    if model_type == "keypoint":
        ds_cfg = getattr(cfg, "dataset_config", None)
        # intrinsics follow the ACTUAL training resolution: explicit hw from
        # the caller (train() passes its resolved sample_hw), else the crop,
        # else the reference default
        crop = tuple(hw or (ds_cfg.center_crop if ds_cfg else None) or (256, 256))
        cam_P = nominal_camera_matrices(*crop)
    else:
        cam_P = None

    def _losses(pred, poses):
        if model_type == "keypoint":
            uv, _ = pred
            return keypoint_loss_fn(uv, poses, cam_P)
        return geometric_loss_fn(pred, poses)

    def _shard_loss_and_grad(params, batch_stats, images, poses, mask):
        """Runs per-shard under shard_map: local fwd+bwd of the UNnormalized loss
        sum, then ONE bucketed all-reduce of [loss_sum, mask_count, flat_grads]
        (DDP-style gradient bucketing: a single collective per step instead of
        one per tensor — also works around XLA:CPU's in-process communicator
        falling over on hundreds of per-tensor all-reduces in the virtual-device
        test topology). Collectives stay out of the differentiated region, so
        d(gsum/gcnt)/dp = psum(d lsum/dp) / gcnt exactly."""
        from jax.flatten_util import ravel_pytree

        def loss_fn(p):
            pred, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            lsum = jnp.sum(_losses(pred, poses) * mask)
            return lsum, mutated["batch_stats"]

        (lsum, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        flat, unravel = ravel_pytree(grads)
        cat = jnp.concatenate([jnp.stack([lsum, jnp.sum(mask)]), flat])
        # a FEW buckets, not one: a single whole-gradient collective sat 20-50 s
        # at the rendezvous on the virtual CPU mesh (MULTICHIP_r02 tail — one
        # thread's payload prep skews its arrival); 4 buckets keep the O(1)
        # launch count while quartering the skew per rendezvous
        n_buckets = min(4, cat.size)
        bounds = [round(i * cat.size / n_buckets) for i in range(n_buckets + 1)]
        vec = jnp.concatenate(
            [jax.lax.psum(cat[a:b], "data") for a, b in zip(bounds[:-1], bounds[1:])]
        )
        gcnt = jnp.maximum(vec[1], 1.0)
        loss = vec[0] / gcnt
        grads = unravel(vec[2:] / gcnt)
        return loss, nbs, grads

    if shmap_dp:
        from jax.sharding import PartitionSpec as P

        # SOUNDNESS GATE: batch_stats come back with out_specs P() (replicated)
        # below, which is only correct because bn_frozen guarantees they are
        # returned UNCHANGED per shard. Relaxing this gate to non-frozen BN would
        # silently assemble one shard's per-shard statistics as global state
        # (check_vma=False disables the checker that would catch it). Keep the
        # assert in lockstep with the out_specs. (ADVICE r2)
        assert getattr(mcfg, "bn_frozen", False), "shmap_dp requires frozen BN"
        _sharded_lg = jax.shard_map(
            _shard_loss_and_grad,
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data"), P("data")),
            out_specs=(P(), P(), P()),
            check_vma=False,  # custom-vjp pallas ops defeat the varying-axes checker
        )

    accum = max(1, int(getattr(cfg, "grad_accum_steps", 1)))
    if accum > 1:
        # microbatch BN statistics would silently differ from the full-batch
        # semantics; frozen BN makes accumulation EXACT (tests pin accum-k ==
        # accum-1 updates)
        assert getattr(mcfg, "bn_frozen", False), (
            "grad_accum_steps > 1 requires bn_frozen (exact accumulation)"
        )

    def train_step(state: TrainState, batch: dict):
        key = jax.random.fold_in(jax.random.PRNGKey(base_seed), state.step)
        images = u8_to_f32(batch["images"], feed_dtype)
        if cfg.use_augmentation:
            images = apply_augmentation(
                aug_cfg, key, images, n_cams=n_cams, train=True, mesh=mesh
            )

        def lg(images_i, poses_i, mask_i):
            """(masked-mean loss, new batch_stats, mean grads, mask count) on
            one (micro)batch — the shared unit for accum == 1 and > 1."""
            if shmap_dp:
                loss_i, nbs_i, grads_i = _sharded_lg(
                    state.params, state.batch_stats, images_i, poses_i, mask_i
                )
                return loss_i, nbs_i, grads_i, jnp.sum(mask_i)

            def loss_fn(params):
                pred, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images_i,
                    train=True,
                    mutable=["batch_stats"],
                )
                losses = _losses(pred, poses_i)
                loss = jnp.sum(losses * mask_i) / jnp.maximum(jnp.sum(mask_i), 1.0)
                return loss, mutated["batch_stats"]

            (loss_i, nbs_i), grads_i = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            return loss_i, nbs_i, grads_i, jnp.sum(mask_i)

        if accum == 1:
            loss, new_batch_stats, grads, _ = lg(
                images, batch["cube_pose"], batch["mask"]
            )
        else:
            # gradient accumulation: scan over k microbatches, combining the
            # per-microbatch MEAN gradients by their mask counts — identical to
            # the full-batch masked mean (fp association aside). Memory for
            # activations drops by ~k; the batch_stats are frozen (asserted).
            B = images.shape[0]
            assert B % accum == 0, (B, accum)
            mb = B // accum
            xs = (
                images.reshape(accum, mb, *images.shape[1:]),
                batch["cube_pose"].reshape(accum, mb, -1),
                batch["mask"].reshape(accum, mb),
            )

            def body(carry, x):
                gsum, lsum, csum = carry
                loss_i, _, grads_i, cnt_i = lg(*x)
                gsum = jax.tree_util.tree_map(
                    lambda a, b: a + b.astype(jnp.float32) * cnt_i, gsum, grads_i
                )
                return (gsum, lsum + loss_i * cnt_i, csum + cnt_i), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (gsum, lsum, csum), _ = jax.lax.scan(
                body, (zeros, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)), xs
            )
            denom = jnp.maximum(csum, 1.0)
            grads = jax.tree_util.tree_map(
                lambda g, p: (g / denom).astype(p.dtype), gsum, state.params
            )
            loss = lsum / denom
            new_batch_stats = state.batch_stats  # frozen (asserted above)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: -state.lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss

    return train_step


def make_resident_epoch_step(
    model: NCameraCNN, cfg: TrainConfig, base_seed: int, n_examples: int, mesh=None, hw=None
):
    """Whole-EPOCH-on-chip training over a device-resident dataset: ONE XLA
    program per epoch — on-device permutation, `lax.scan` over per-batch
    gathers from the resident arrays, the full train-step body each iteration.

    This is the TPU-native answer to the reference's defining bottleneck (its
    pipeline is input-bound, argus/train.py:64): when the dataset fits HBM,
    the host ships ONE integer per epoch instead of one 12+ MB batch per step,
    so end-to-end throughput equals compute throughput. Batch semantics are
    identical to HostDataLoader: seeded per-epoch permutation, final partial
    batch padded with mask=0, per-(micro)batch masked-mean loss; augmentation
    keys still derive from state.step, which the scan carries.

    Returns (epoch_step, batches_per_epoch) where
        epoch_step(state, images_u8, poses, epoch) -> (state, losses (k,))
    `epoch` must be a (device) int32 scalar — it is traced, so every epoch
    reuses one compiled program.
    """
    body = make_train_step_body(model, cfg, base_seed, mesh=mesh, hw=hw)
    B = cfg.batch_size
    n = int(n_examples)
    k = -(-n // B)  # batches per epoch (last one padded + masked)
    pad = k * B - n

    def epoch_body(state: TrainState, images: jnp.ndarray, poses: jnp.ndarray, epoch):
        # distinct stream from the augmentation keys (those fold base_seed with
        # state.step inside the body)
        perm = jax.random.permutation(
            jax.random.fold_in(jax.random.PRNGKey(base_seed ^ 0x5EED), epoch), n
        )
        if pad:
            perm = jnp.concatenate([perm, perm[:pad]])
        mask = (jnp.arange(k * B) < n).astype(jnp.float32)

        def scan_body(st, xs):
            idx, m = xs
            batch = {
                "images": jnp.take(images, idx, axis=0),
                "cube_pose": jnp.take(poses, idx, axis=0),
                "mask": m,
            }
            st, loss = body(st, batch)
            return st, loss

        state, losses = jax.lax.scan(
            scan_body, state, (perm.reshape(k, B), mask.reshape(k, B))
        )
        return state, losses

    return jax.jit(epoch_body, donate_argnums=(0,)), k


def make_eval_step(model: NCameraCNN, cfg: TrainConfig, base_seed: int, hw=None):
    """Jitted eval step. Returns (sum of per-sample losses, count) so the epoch mean
    is exact under padding. Spaghetti arcs are applied when cfg.val_spaghetti, which
    is what the reference's val pipeline effectively does (argus/data.py:213).

    For the keypoint variant the reported val metric is the GEODESIC pose error of
    the fully-fitted pose (triangulation + Procrustes), i.e. the quantity the
    direct-regression variant reports — the two families are comparable."""
    model_type = getattr(cfg, "model_type", "pose_cnn")
    n_cams = (
        cfg.keypoint_config.n_cams if model_type == "keypoint" else cfg.model_config.n_cams
    )
    n_spag = cfg.augmentation_config.num_spaghetti if cfg.use_augmentation else 0
    if model_type == "keypoint":
        ds_cfg = getattr(cfg, "dataset_config", None)
        # intrinsics follow the ACTUAL training resolution: explicit hw from
        # the caller (train() passes its resolved sample_hw), else the crop,
        # else the reference default
        crop = tuple(hw or (ds_cfg.center_crop if ds_cfg else None) or (256, 256))
        cam_P = nominal_camera_matrices(*crop)
    else:
        cam_P = None

    @jax.jit
    def eval_step(state: TrainState, batch: dict, batch_idx: jnp.ndarray = jnp.zeros((), jnp.int32)):
        images = u8_to_f32(batch["images"])
        if cfg.val_spaghetti and n_spag > 0:
            # fold in BOTH step and batch index: step alone is constant across one
            # validation epoch, which would draw identical arcs on every batch and
            # correlate the val-loss noise the plateau scheduler sees (ADVICE r1)
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(base_seed + 1), state.step), batch_idx
            )
            B, H, W, C = images.shape
            # channel-first for the VPU (see ops/augment.py layout note)
            per_cam = jnp.transpose(images.reshape(B, H, W, n_cams, 3), (0, 3, 4, 1, 2))
            per_cam = spaghetti_arcs(key, per_cam.reshape(B * n_cams, 3, H, W), n_spag)
            per_cam = per_cam.reshape(B, n_cams, 3, H, W)
            images = jnp.transpose(per_cam, (0, 3, 4, 1, 2)).reshape(B, H, W, C)
        pred = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, images, train=False
        )
        if model_type == "keypoint":
            uv, _ = pred
            pose_pred = fit_pose(cam_P, uv)
            losses = geometric_loss_fn(se3_log(pose_pred), batch["cube_pose"])
        else:
            losses = geometric_loss_fn(pred, batch["cube_pose"])
        mask = batch["mask"]
        return jnp.sum(losses * mask), jnp.sum(mask)

    return eval_step


# ───────────────────────────── plateau scheduler ─────────────────────────────


class ReduceLROnPlateau:
    """Host-side ReduceLROnPlateau(min, patience=5, factor=0.5) — the reference's
    scheduler (argus/train.py:233, torch semantics: relative threshold 1e-4,
    reduce when bad epochs exceed patience)."""

    def __init__(self, patience: int = 5, factor: float = 0.5, threshold: float = 1e-4):
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float, lr: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return lr * self.factor
        return lr


# ───────────────────────────── training loop ─────────────────────────────


def rank_print(msg: str, rank: int = 0) -> None:
    """Print only on process 0 (reference: argus/train.py:258-261)."""
    if rank == 0:
        print(msg)


def initialize_training(cfg: TrainConfig):
    """Set up mesh, datasets, loaders, model, state, steps, and logging.

    Returns a dict of everything `train` needs (the reference returns a 10-tuple,
    argus/train.py:122-255).
    """
    assert cfg.dataset_config is not None, (
        "TrainConfig.dataset_config is required for training (it may only be None "
        "for harnesses that feed synthetic batches straight into make_train_step)"
    )
    process_index, process_count = jax.process_index(), jax.process_count()

    # mesh: all (or num_chips) devices when multigpu, else a single device
    if cfg.multigpu:
        devices = jax.devices()[: cfg.num_chips] if cfg.num_chips else None
        mesh = make_mesh(n_model=cfg.num_model_shards, devices=devices)
    else:
        mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    n_data = mesh.shape["data"]
    assert cfg.batch_size % (n_data) == 0, (
        f"global batch {cfg.batch_size} must divide over {n_data} data shards"
    )
    assert cfg.batch_size % process_count == 0, (
        f"global batch {cfg.batch_size} must divide over {process_count} host processes"
    )

    # datasets + loaders (per-host sharded; augmentation runs on-device)
    train_dataset = CameraCubePoseDataset(cfg.dataset_config, train=True)
    val_dataset = CameraCubePoseDataset(cfg.dataset_config, train=False)
    # batch_size is GLOBAL: each host loads its 1/process_count share and
    # global_batch stitches the shards into the globally-sharded array
    loader_kw = dict(
        batch_size=cfg.batch_size // process_count,
        num_workers=cfg.num_workers,
        process_index=process_index,
        process_count=process_count,
        seed=cfg.random_seed,
    )
    train_loader = HostDataLoader(train_dataset, shuffle=True, **loader_kw)
    val_loader = HostDataLoader(val_dataset, shuffle=False, **loader_kw)

    # model + state, placed according to the mesh
    sample_hw = tuple(cfg.dataset_config.center_crop or train_dataset[0]["images"].shape[:2])
    model, state = create_train_state(cfg, jax.random.PRNGKey(cfg.random_seed), sample_hw)
    if cfg.resume_from is not None:
        state = load_checkpoint(cfg.resume_from, target=state)
    shardings = TrainState(
        step=param_shardings(state.step, mesh),
        params=param_shardings(state.params, mesh),
        batch_stats=param_shardings(state.batch_stats, mesh),
        opt_state=param_shardings(state.opt_state, mesh),
        lr=param_shardings(state.lr, mesh),
    )
    state = jax.device_put(state, shardings)

    train_step = make_train_step(model, cfg, base_seed=cfg.random_seed, mesh=mesh, hw=sample_hw)
    eval_step = make_eval_step(model, cfg, base_seed=cfg.random_seed, hw=sample_hw)

    # device-resident feed: auto-selected when the split fits the HBM budget;
    # datasets PAST the budget fall back to epoch-level resident shard swaps
    # (data/resident.ResidentShardedData) — bulk double-buffered uploads +
    # whole-shard on-chip programs instead of the per-step host feed.
    resident = epoch_step = resident_sharded = shard_steps = None
    budget_mb = getattr(cfg, "device_resident_mb", 0)
    if process_count == 1 and DeviceResidentData.fits(train_dataset, budget_mb):
        resident = DeviceResidentData.from_dataset(
            train_dataset, mesh=mesh, n_threads=cfg.num_workers
        )
        epoch_step, _ = make_resident_epoch_step(
            model, cfg, base_seed=cfg.random_seed, n_examples=len(train_dataset),
            mesh=mesh, hw=sample_hw,
        )
    elif process_count == 1 and ResidentShardedData.applicable(train_dataset, budget_mb):
        resident_sharded = ResidentShardedData(
            train_dataset, budget_mb, mesh=mesh, n_threads=cfg.num_workers,
            seed=cfg.random_seed,
        )
        # one compiled whole-shard program per DISTINCT shard length (at most
        # two: the equal-size shards + the smaller tail shard)
        shard_steps = {
            n_k: make_resident_epoch_step(
                model, cfg, base_seed=cfg.random_seed, n_examples=n_k,
                mesh=mesh, hw=sample_hw,
            )[0]
            for n_k in {resident_sharded.shard_size, resident_sharded.tail_size}
            if n_k <= len(train_dataset)
        }

    run_id = generate_run_id()
    logger = MetricsLogger(
        cfg.wandb_project,
        run_id=run_id,
        config=cfg,
        enabled=cfg.wandb_log and process_index == 0,
    )

    return dict(
        mesh=mesh,
        model=model,
        sample_hw=sample_hw,
        state=state,
        train_loader=train_loader,
        val_loader=val_loader,
        train_step=train_step,
        eval_step=eval_step,
        resident=resident,
        epoch_step=epoch_step,
        resident_sharded=resident_sharded,
        shard_steps=shard_steps,
        logger=logger,
        run_id=run_id,
        rank=process_index,
    )


def train(cfg: TrainConfig) -> str:
    """Main training loop (reference: argus/train.py:264-361). Returns the
    checkpoint path.

    Preemption-safe: SIGTERM (the cloud-eviction signal) is latched by a
    PreemptionGuard; the loop finishes the in-flight step, saves a full-state
    checkpoint, and returns cleanly so `resume_from` continues the run."""
    from tqdm import tqdm

    from argus_tpu.preemption import PreemptionGuard

    setup = initialize_training(cfg)
    state = setup["state"]
    train_step, eval_step = setup["train_step"], setup["eval_step"]
    logger, run_id, rank = setup["logger"], setup["run_id"], setup["rank"]
    scheduler = ReduceLROnPlateau(patience=5, factor=0.5)
    ckpt_path = str(Path(cfg.save_dir) / f"{run_id}.ckpt")

    lr = float(cfg.learning_rate)
    global_step = int(jax.device_get(state.step))
    guard = PreemptionGuard()
    preempted = False
    ckpt = AsyncCheckpointer() if cfg.async_checkpoint else None
    meta = checkpoint_meta(cfg, hw=setup.get("sample_hw"))
    guard.__enter__()
    try:
        state, global_step, lr, preempted = _train_epochs(
            cfg, setup, state, train_step, eval_step, logger, scheduler,
            ckpt_path, guard, global_step, lr, rank, tqdm, ckpt, meta,
        )
    finally:
        # always restore the SIGTERM handler — leaving it installed after an
        # exception would silently swallow real termination signals
        guard.__exit__()
        # drain any in-flight async save so an exception can't strand a .tmp;
        # if we are already unwinding an exception, report the drain error but
        # don't let it REPLACE the original fault
        if ckpt is not None:
            import sys

            try:
                ckpt.wait()
            except BaseException as e:
                if sys.exc_info()[0] is None:
                    raise
                rank_print(f"    (async checkpoint drain also failed: {e!r})", rank)
    save_checkpoint(ckpt_path, state, meta=meta)
    logger.finish()
    if preempted:
        rank_print(f"    Preempted at step {global_step}; resumable from {ckpt_path}", rank)
    return ckpt_path


def _train_epochs(
    cfg, setup, state, train_step, eval_step, logger, scheduler, ckpt_path,
    guard, global_step, lr, rank, tqdm, ckpt=None, meta=None,
):
    """Epoch loop body of train(), split out so the PreemptionGuard can wrap it
    in try/finally. Returns (state, global_step, lr, preempted)."""
    mesh = setup["mesh"]
    preempted = False
    for epoch in tqdm(range(cfg.n_epochs), desc="Epoch", disable=(rank != 0)):
        setup["train_loader"].set_epoch(epoch)

        # ── train ──
        # keep per-step losses on device and fetch in blocks: a float() per step is
        # a host sync that stalls the dispatch pipeline (expensive through remote
        # tunnels); per-step logs still get written with their true step numbers.
        epoch_losses = []
        pending = []

        def flush_pending():
            nonlocal global_step
            if not pending:
                return
            vals = np.asarray(jax.device_get(jnp.stack(pending)))
            for v in vals:
                epoch_losses.append(float(v))
                logger.log({"loss": float(v)}, step=global_step)
                global_step += 1
            pending.clear()

        if setup.get("resident") is not None:
            # whole epoch as ONE on-chip program over the resident dataset —
            # no host feed, no H2D; preemption granularity becomes one epoch
            res = setup["resident"]
            state, losses = setup["epoch_step"](
                state, res.images, res.poses, jnp.asarray(epoch, jnp.int32)
            )
            pending.extend(losses)
        elif setup.get("resident_sharded") is not None:
            # epoch-level resident shard swaps: each shard is one on-chip
            # whole-shard program; the next shard's decode+upload overlaps it
            # (data/resident.ResidentShardedData). Preemption granularity is
            # one shard.
            for d_imgs, d_poses, segment, n_k in setup["resident_sharded"].epoch_shards(epoch):
                state, losses = setup["shard_steps"][n_k](
                    state, d_imgs, d_poses, jnp.asarray(segment, jnp.int32)
                )
                pending.extend(losses)
                if guard.requested:
                    break
        else:
            # double-buffered H2D: the next batch's transfer overlaps the in-flight step
            for device_batch in tqdm(
                device_prefetch(setup["train_loader"], mesh),
                desc="Iterations",
                leave=False,
                disable=(rank != 0),
            ):
                state, loss = train_step(state, device_batch)
                pending.append(loss)
                if len(pending) >= 50:
                    flush_pending()
                if guard.requested:
                    break
        flush_pending()

        if guard.requested:
            preempted = True
            rank_print("    Preemption signal received: checkpointing and exiting", rank)
            logger.log({"preempted": 1}, step=global_step)
            break

        if epoch % cfg.print_epochs == 0:
            rank_print(f"    Avg. Loss in Epoch: {np.mean(epoch_losses):.6f}", rank)

        # ── validation + plateau schedule ──
        if epoch % cfg.val_epochs == 0:
            # accumulate (sum, count) ON DEVICE across batches; ONE host fetch at
            # the end — a float() per val batch is a ~25 ms tunnel sync each
            total = jnp.zeros((), jnp.float32)
            count = jnp.zeros((), jnp.float32)
            for bi, batch in enumerate(setup["val_loader"]):
                s, c = eval_step(state, global_batch(mesh, batch), jnp.asarray(bi, jnp.int32))
                total = total + s
                count = count + c
            val_loss = float(total) / max(float(count), 1.0)
            logger.log({"val_loss": val_loss}, step=global_step)
            rank_print(f"    Validation loss: {val_loss:.6f}", rank)
            new_lr = scheduler.step(val_loss, lr)
            if new_lr != lr:
                lr = new_lr
                state = state.replace(lr=jnp.asarray(lr, jnp.float32))
                rank_print(f"    Reducing learning rate to {lr:.2e}", rank)

        # ── checkpoint (full train state; single format for 1..N chips);
        # async by default: donation-safe snapshot now, I/O in a worker ──
        if epoch % cfg.save_epochs == 0:
            if meta is None:
                meta = checkpoint_meta(cfg)
            if ckpt is not None:
                ckpt.save(ckpt_path, state, meta=meta)
            else:
                save_checkpoint(ckpt_path, state, meta=meta)

    return state, global_step, lr, preempted


if __name__ == "__main__":
    from argus_tpu.configs import cli

    cfg = cli(TrainConfig)
    start = time.time()
    train(cfg)
    print(f"Training took {time.time() - start:.2f} seconds.")

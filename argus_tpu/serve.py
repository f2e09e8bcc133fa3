"""Real-time serving: the compiled single-frame pose estimator as a long-lived object.

The production deployment story for this estimator is a camera control loop: grab
two frames -> estimate the cube pose -> feed the controller, at sub-2 ms latency
(BASELINE.md target; reference inference path: argus/utils.py:179-189 +
argus/validate_real.py). `Estimator` packages that path for BOTH model families:

  * reads the model family + config from the checkpoint's embedded metadata
    (checkpoint.py format 2) — no out-of-band config needed; an explicit config
    argument overrides (and is required for legacy bare-state checkpoints of
    non-default models),
  * compiles ONE XLA program uint8 images -> SE(3) pose at construction
    (direct se(3) regression for NCameraCNN; corner soft-argmax ->
    triangulation -> Procrustes for CubeKeypointNet),
  * `predict` takes raw (H, W, 3) frames or stacked (B, H, W, 3*n_cams) arrays and
    returns 7-vector poses (xyzw) as numpy, with optional MJPC wxyz order.

Measured p50 on v5e-1: ~0.33 ms per frame (bench.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from argus_tpu.checkpoint import load_checkpoint_with_meta
from argus_tpu.geom import se3_exp, xyzxyzw_to_xyzwxyz_SE3
from argus_tpu.models import resolve_model
from argus_tpu.models.keypoint_net import fit_pose, nominal_camera_matrices


def latency_tuned_config(cfg):
    """Rebuild a model config for single-frame serving: the fused Pallas
    training kernels LOSE at batch 1 (a 2-image grid amortizes nothing and
    blocks XLA fusion across the kernel boundary — p50 0.61 ms fused vs
    0.35 ms pure-XLA, bench.py), so latency-bound serving programs compile the
    pure-XLA backbone. No-op for configs without fuse fields."""
    import dataclasses

    fuse_fields = {f.name for f in dataclasses.fields(cfg)} & {
        "fuse_block", "fuse_proj", "fuse_stem", "fuse_stage", "fuse_pointwise",
    }
    if not fuse_fields:
        return cfg
    return dataclasses.replace(cfg, **{name: "off" for name in fuse_fields})


def throughput_tuned_config(cfg):
    """Rebuild a model config for BATCHED serving (offline relabeling,
    multi-camera rigs, trajectory scoring): at eval, exact BN == frozen BN —
    both apply the running statistics — so serving can ALWAYS fold BN and take
    the fused frozen-forward Pallas chains in bf16, regardless of how the
    checkpoint was trained. The frozen/fuse/dtype flags are variable-tree
    NEUTRAL (frozen BN keeps scale/bias in params and mean/var in batch_stats,
    only stop-gradiented — models/resnet.py FrozenBatchNorm), so the trained
    params drop in unchanged. No-op for configs without fuse fields.

    The fused chains engage only for BOTTLENECK backbones (resnet50/101),
    where the 256-2048-channel contractions fill the MXU; BasicBlock
    backbones (resnet18/34 — the keypoint family's encoder) measured SLOWER
    fused (64/128-channel lane underfill, .bench/probe_kp_fuse_split.py:
    -36 ms on the B=256 train step), so they keep XLA convs and take only
    the bf16 + folded-frozen-BN wins."""
    import dataclasses

    fuse_fields = {f.name for f in dataclasses.fields(cfg)} & {
        "fuse_block", "fuse_proj", "fuse_stem", "fuse_stage",
    }
    if not fuse_fields:
        return cfg
    bottleneck = getattr(cfg, "backbone", "") in ("resnet50", "resnet101")
    return dataclasses.replace(
        cfg,
        bn_frozen=True,
        bn_frozen_affine=True,
        dtype="bfloat16",
        **{name: ("on" if bottleneck else "off") for name in fuse_fields},
    )


# Fused-bf16-frozen vs pure-XLA crossover batch for serving programs, measured
# on v5e-1 (.bench/bench_serving.py; the probe whose round-3 result motivated
# per-batch selection — VERDICT r3 #6). Batch 1 stays on the 0.32 ms pure-XLA
# path; at/above this batch the fused frozen chains win.
SERVING_FUSED_MIN_BATCH = 8


def serving_tuned_config(cfg, batch_size: int):
    """Pick the serving backbone per batch size: pure-XLA below the measured
    crossover (single-frame control loops), fused-bf16-frozen at/above it
    (batched/offline serving)."""
    if batch_size >= SERVING_FUSED_MIN_BATCH:
        return throughput_tuned_config(cfg)
    return latency_tuned_config(cfg)


class Estimator:
    """Compiled images -> SE(3) cube-pose estimator for control loops."""

    def __init__(
        self,
        checkpoint_path: str,
        model_config=None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        batch_size: int = 1,
    ) -> None:
        raw, meta = load_checkpoint_with_meta(checkpoint_path)
        model, self.cfg, self.model_type = resolve_model(meta, model_config)
        # backbone selection is per-BATCH (VERDICT r3 #6): pure-XLA for the
        # batch-1 control loop, fused-bf16-frozen chains for batched serving
        tuned = serving_tuned_config(self.cfg, batch_size)
        if tuned is not self.cfg:
            model, self.cfg = type(model)(tuned), tuned
        # resolution precedence: an EXPLICIT height/width always wins (the
        # caller knows their camera), then the checkpoint's embedded training
        # crop, then the reference default 256
        if height is None or width is None:
            mh, mw = (
                (int(v) for v in meta["center_crop"])
                if meta.get("center_crop")
                else (256, 256)
            )
            height = mh if height is None else height
            width = mw if width is None else width
        self.hw = (height, width)
        self.batch_size = batch_size
        variables = {"params": raw["params"], "batch_stats": raw["batch_stats"]}
        cam_P = nominal_camera_matrices(height, width) if self.model_type == "keypoint" else None

        @jax.jit
        def _infer(images_u8: jax.Array) -> jax.Array:
            images = images_u8.astype(jnp.float32) / 255.0
            pred = model.apply(variables, images, train=False)
            if self.model_type == "keypoint":
                uv, _ = pred
                return fit_pose(cam_P, uv)
            return se3_exp(pred)

        self._infer = _infer
        # warm the program so the first control-loop tick is fast
        dummy = jnp.zeros((batch_size, height, width, 3 * self.cfg.n_cams), jnp.uint8)
        jax.block_until_ready(self._infer(dummy))

    def predict(self, images: np.ndarray, wxyz: bool = False) -> np.ndarray:
        """Estimate poses from a uint8 batch (B, H, W, 3*n_cams).

        Returns (B, 7) poses, xyzw quats (or MJPC wxyz order when `wxyz=True`,
        ready for `mujoco.MjData.qpos[:7]`).
        """
        assert images.dtype == np.uint8 and images.ndim == 4
        poses = np.asarray(self._infer(jnp.asarray(images)))
        return np.asarray(xyzxyzw_to_xyzwxyz_SE3(poses)) if wxyz else poses

    def predict_frames(self, frames: Sequence[np.ndarray], wxyz: bool = False) -> np.ndarray:
        """Estimate one pose from per-camera frames [(H, W, 3), ...] (uint8)."""
        stacked = np.concatenate(frames, axis=-1)[None]
        return self.predict(stacked, wxyz=wxyz)[0]


def export_estimator(
    checkpoint_path: str,
    out_path: str,
    *,
    model_config=None,
    height: Optional[int] = None,
    width: Optional[int] = None,
    batch_size: int = 1,
    platforms: Optional[Sequence[str]] = None,
) -> None:
    """Serialize the compiled uint8 -> SE(3) inference program — weights baked
    in as constants — to ONE file via `jax.export` (portable StableHLO).

    The artifact is loadable by `ExportedEstimator` (or raw
    `jax.export.deserialize`) in a serving process that needs NO model code,
    flax, or checkpoint plumbing — the deployment story the reference leaves
    at "reconstruct the torch module and load a state_dict by hand"
    (argus/validate.py:100-103). `platforms` pins the target backends (e.g.
    ["tpu"] to cross-lower from a CPU build host); default = the current
    backend."""
    from jax import export as jax_export

    est = Estimator(checkpoint_path, model_config, height, width, batch_size)
    # est.hw reflects the checkpoint's embedded center_crop when present —
    # export the shape the estimator actually compiled for
    spec = jax.ShapeDtypeStruct(
        (est.batch_size, *est.hw, 3 * est.cfg.n_cams), jnp.uint8
    )
    exp = jax_export.export(est._infer, platforms=platforms)(spec)
    with open(out_path, "wb") as f:
        f.write(exp.serialize())


class ExportedEstimator:
    """Serving-side loader for `export_estimator` artifacts: deserialize once,
    then `predict` with Estimator semantics (uint8 batches -> (B, 7) poses)."""

    def __init__(self, path: str) -> None:
        from jax import export as jax_export

        with open(path, "rb") as f:
            self._exp = jax_export.deserialize(f.read())
        (spec,) = self._exp.in_avals
        self.batch_size, self.height, self.width, self.channels = spec.shape
        self._call = jax.jit(self._exp.call)
        # warm the program so the first control-loop tick is fast
        jax.block_until_ready(
            self._call(jnp.zeros(spec.shape, spec.dtype))
        )

    def predict(self, images: np.ndarray, wxyz: bool = False) -> np.ndarray:
        assert images.dtype == np.uint8 and images.ndim == 4
        poses = np.asarray(self._call(jnp.asarray(images)))
        return np.asarray(xyzxyzw_to_xyzwxyz_SE3(poses)) if wxyz else poses

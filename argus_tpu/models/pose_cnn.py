"""NCameraCNN: N-camera cube-pose regressor (flax).

Capability parity with the reference's `NCameraCNN` (argus/models.py:26-90):
  * shared ResNet backbone across cameras via the (B*n_cams, H, W, 3) reshape
    (reference reshapes to (B*n_cams, 3, H, W) at argus/models.py:81 — we use NHWC,
    the TPU-native layout),
  * per-camera 1024-d features concatenated, GELU, then a 128-128-6 MLP head
    (argus/models.py:58-64),
  * the output is a raw se(3) 6-vector — send it through `geom.se3_exp` for an SE(3)
    pose (the reference keeps it a plain tensor so torch.compile works,
    argus/models.py:32-34; under jit this is simply the natural functional design).

TPU-first extensions beyond the reference:
  * `backbone` is selectable (resnet18/34/50/101) — BASELINE.json's config list
    includes a "ResNet-18-style backbone" variant.
  * `dtype=bfloat16` runs the backbone + head on the MXU in bf16 while keeping
    params and the loss in fp32 (the reference's AMP equivalent, argus/train.py:298).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from argus_tpu.models.resnet import BACKBONES


@dataclass(frozen=True)
class NCameraCNNConfig:
    """Configuration for the NCameraCNN model (reference: argus/models.py:13-23).

    Fields:
        n_cams: number of cameras in the scene.
        resnet_output_dim: output dim of the backbone projection (before the head).
        backbone: which ResNet variant to use ("resnet50" matches the reference).
        dtype: compute dtype name ("float32" or "bfloat16").
    """

    n_cams: int = 2
    resnet_output_dim: int = 1024
    backbone: str = "resnet50"
    dtype: str = "float32"
    # exact MXU-friendly rewrite of the stem conv (see models/resnet.py); changes
    # the param tree (conv_init -> conv_init_s2d) but not the function computed
    stem_space_to_depth: bool = False
    # freeze the stem (conv_init + norm_init) in fine-tune: drops the whole
    # stem backward (~6.4 ms of the 82 ms flagship step, ~70% of it maxpool
    # cotangent routing); pretrained first-conv features are generic. See
    # models/resnet.py stem_frozen + the convergence A/B in ROUND3_NOTES.
    stem_frozen: bool = False
    # subsampled stem weight-grad (unbiased, fused-stem path; see
    # models/resnet.py stem_grad_stride)
    stem_grad_stride: int = 1
    # progressive layer freezing: freeze the stem + stages 0..k-1 (one
    # stop_gradient at the output of stage k-1; models/resnet.py
    # frozen_stages). 0 = off. Deletes the frozen stages' backward kernels
    # from the step; accuracy evidence per k in the convergence A/B.
    frozen_stages: int = 0
    # HBM-lean BatchNorm training (ops/norm.py): stride-s H-subsampled batch stats /
    # dgamma-dbeta estimates. 1 = exact flax/torch BN semantics. The train-step
    # profile is BN-reduction-bound (CLAUDE.md); stride 4 cuts those HBM reads 4x
    # while still averaging ~2x more samples/channel than the reference's batch-32
    # statistics (argus/train.py:64). Convergence parity: tests/test_norm.py.
    bn_stats_stride: int = 1
    bn_grad_stride: int = 1
    bn_impl: str = "xla"  # "xla" | "pallas" | "auto" — reduction engine (ops/norm.py)
    # Frozen-BN fine-tune mode (torchvision FrozenBatchNorm2d semantics): normalize
    # with the stored running statistics even at train time; scale/bias stay
    # trainable; running stats are not updated. Standard practice for fine-tuning
    # ImageNet-pretrained backbones (the reference's flagship configuration,
    # argus/models.py:43 pretrained=True) — and the single biggest measured
    # throughput lever on v5e: it removes the batch-statistics pass and the
    # batch-coupling terms of the BN backward (which force conv activations to be
    # re-read from HBM). Measured: 141.6 -> 122.1 ms/step at B=128 (docs/
    # ROUND2_NOTES.md). Convergence evidence: tests/test_accuracy_proxy.py.
    bn_frozen: bool = False
    # Full torchvision FrozenBatchNorm2d: freeze scale/bias too (buffers, no
    # gradients). With the affine trainable the backward still computes
    # dgamma=sum(dy*xhat)/dbeta=sum(dy), re-reading every conv activation from HBM
    # (36 ms of the 120 ms step, outputs/traces/step_frozen); freezing the affine
    # makes those reductions dead code. Flagship default (bench.py BENCH_BN=frozen).
    bn_frozen_affine: bool = False
    # Fused Pallas pointwise-conv path for bottleneck 1x1 convs ("auto"|"on"|
    # "off"; only legal under bn_frozen+bn_frozen_affine — models/resnet.py,
    # ops/pallas/pointwise.py). Default OFF: measured SLOWER than XLA at the
    # flagship shapes (142 vs 104 ms/step) because Pallas operands require the
    # default row-major layout while XLA keeps conv activations in {3,0,2,1},
    # so every Pallas/conv boundary pays a layout-copy pass (~25 ms/step of
    # copies, outputs/traces/step_pw; full analysis in docs/ROUND2_NOTES.md).
    fuse_pointwise: str = "off"
    # Whole-block fused Pallas kernels for stride-1 identity bottleneck blocks
    # ("auto"|"on"|"off"; requires bn_frozen+bn_frozen_affine —
    # ops/pallas/block_fused.py; beats XLA fwd+bwd at every stage geometry with
    # multi-image grids). Default "auto" (= on under TPU), all stages.
    fuse_block: str = "auto"
    fuse_block_stages: tuple = (0, 1, 2, 3)
    # Fuse projection (stage-entry / strided) blocks too (ops/pallas/
    # proj_fused.py) — with fuse_block over all stages this leaves the stem as
    # the only XLA conv in the backbone. Same "auto"/"on"/"off" semantics.
    fuse_proj: str = "auto"
    # Fuse the stem as one Pallas kernel (ops/pallas/stem_fused.py): with
    # fuse_block+fuse_proj on, ZERO XLA convs remain in the backbone (the
    # fused flagship: 90.6 ms/step vs 103.3 unfused, docs/ROUND3_NOTES.md).
    fuse_stem: str = "auto"
    # Chain whole stages (proj + identity blocks) into ONE kernel each way
    # (ops/pallas/stage_fused.py); needs fuse_block+fuse_proj. Default stage 0
    # only — deeper chains hit pathological Mosaic compile times (see
    # models/resnet.py note); stage 3 always stays per-block (VMEM).
    fuse_stage: str = "auto"
    fuse_stage_stages: tuple = (0,)
    # Rematerialize residual blocks in the backward pass (see models/resnet.py):
    # `remat` checkpoints all blocks, `remat_stages` only the listed stage indices.
    # Bytes-for-FLOPs trade for the HBM-roofline-bound train step.
    remat: bool = False
    remat_stages: tuple = ()


class NCameraCNN(nn.Module):
    """A CNN which assumes N cameras are available in the scene.

    Input: (B, H, W, 3 * n_cams) images, all cameras concatenated along channels.
    Output: (B, 6) se(3) tangent vectors; `geom.se3_exp` maps them to SE(3).
    """

    cfg: NCameraCNNConfig = field(default_factory=NCameraCNNConfig)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if x.ndim != 4:
            raise ValueError(
                "The input images must be of shape (B, H, W, C)! If B=1, add a dummy dimension."
            )
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        B, H, W, C = x.shape
        if C != 3 * cfg.n_cams:
            raise ValueError(f"Expected {3 * cfg.n_cams} channels (n_cams={cfg.n_cams}), got {C}.")

        # fold cameras into the batch so ONE backbone (shared weights) sees all views
        x = x.reshape(B, H, W, cfg.n_cams, 3)
        x = jnp.moveaxis(x, 3, 1).reshape(B * cfg.n_cams, H, W, 3)

        backbone = BACKBONES[cfg.backbone](
            output_dim=cfg.resnet_output_dim,
            dtype=dtype,
            stem_space_to_depth=cfg.stem_space_to_depth,
            stem_frozen=cfg.stem_frozen,
            stem_grad_stride=cfg.stem_grad_stride,
            frozen_stages=cfg.frozen_stages,
            bn_stats_stride=cfg.bn_stats_stride,
            bn_grad_stride=cfg.bn_grad_stride,
            bn_impl=cfg.bn_impl,
            bn_frozen=cfg.bn_frozen,
            bn_frozen_affine=cfg.bn_frozen_affine,
            fuse_pointwise=cfg.fuse_pointwise,
            fuse_block=cfg.fuse_block,
            fuse_block_stages=cfg.fuse_block_stages,
            fuse_proj=cfg.fuse_proj,
            fuse_stem=cfg.fuse_stem,
            fuse_stage=cfg.fuse_stage,
            fuse_stage_stages=cfg.fuse_stage_stages,
            remat=cfg.remat,
            remat_stages=cfg.remat_stages,
            name="backbone",
        )
        feats = backbone(x, train=train)  # (B * n_cams, resnet_output_dim)

        feats = feats.reshape(B, cfg.n_cams * cfg.resnet_output_dim)
        feats = nn.gelu(feats, approximate=False)

        y = nn.Dense(128, dtype=dtype, name="head_fc1")(feats.astype(dtype))
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(128, dtype=dtype, name="head_fc2")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(6, dtype=jnp.float32, name="head_out")(y.astype(jnp.float32))
        return y


def init_model(cfg: NCameraCNNConfig, key: jax.Array, height: int = 256, width: int = 256):
    """Initialize model variables with a dummy batch. Returns (model, variables)."""
    model = NCameraCNN(cfg)
    dummy = jnp.zeros((1, height, width, 3 * cfg.n_cams), jnp.float32)
    variables = model.init(key, dummy, train=False)
    return model, variables

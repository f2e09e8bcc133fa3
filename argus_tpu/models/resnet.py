"""ResNet backbones in flax.linen, NHWC layout, bf16-friendly.

Architecture-capability parity with the reference's torchvision ResNet-50 backbone
(reference: argus/models.py:43 uses `torchvision.models.resnet50(weights="DEFAULT")`),
but built TPU-first:

  * **NHWC** data layout — the native layout for TPU convolutions; torch's NCHW would
    force transposes in XLA.
  * Params stay fp32; compute (`dtype`) can be bf16 — the MXU-native dtype. There is
    no GradScaler equivalent because bf16 has fp32's exponent range (SURVEY.md §2.3
    "AMP / mixed precision").
  * The final global average pool + fc projection to `output_dim` mirrors the
    reference's `avgpool -> (1,1)` + `fc -> 1024` surgery (argus/models.py:55-56).

ImageNet-pretrained weights: torchvision weights can't be downloaded in this
environment (zero egress), but `argus_tpu.models.torch_import.load_torch_resnet`
converts a locally available torchvision `state_dict` .pth into these flax params.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from argus_tpu.ops.norm import BatchNorm

ModuleDef = Any


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/b, W/b, b*b*C); channel index = (dy*b + dx)*C + c."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h // block, w // block, block * block * c)


def space_to_depth_conv(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """space_to_depth as a one-hot stride-b conv (same output, same channel order).

    On TPU the reshape/transpose formulation is catastrophic for small C: the
    rank-6 transpose with C=3 in the minor (lane) dim cost 9.0 ms + a 4.9 ms
    layout copy at B=256 256x256 (trace outputs/traces/step_stem1) — 14 ms for
    ~100 MB of data movement. The identical permutation expressed as a conv
    with a one-hot (b, b, C, b*b*C) kernel rides the conv custom-call's
    optimized tiling instead. 0/1 weights are exact in any float dtype."""
    n, h, w, c = x.shape
    eye = jnp.zeros((block, block, c, block * block * c), x.dtype)
    sy, sx, ci = jnp.meshgrid(
        jnp.arange(block), jnp.arange(block), jnp.arange(c), indexing="ij"
    )
    r = (sy * block + sx) * c + ci
    eye = eye.at[sy, sx, ci, r].set(1)
    return jax.lax.conv_general_dilated(
        x, eye, (block, block), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def conv1_kernel_to_s2d(k7: Any) -> Any:
    """Rewrite a (7,7,Cin,Cout) stride-2 stem kernel into the equivalent
    (4,4,4*Cin,Cout) stride-1 kernel over 2x2 space-to-depth input.

    Zero-pad 7->8 with the pad row/col FIRST (so the conv window offsets become
    [-4, 3] and padding ((2,1),(2,1)) reproduces torch's (3,3) padding exactly),
    then split each spatial index a = 2*alpha + dy into (alpha, dy) with dy folded
    into the input-channel axis in space_to_depth's (dy, dx, c) order.
    """
    import numpy as np

    k7 = np.asarray(k7)
    kh, kw, cin, cout = k7.shape
    assert kh == 7 and kw == 7
    k8 = np.zeros((8, 8, cin, cout), k7.dtype)
    k8[1:, 1:] = k7
    # (8, 8, cin, cout) -> (4, 2, 4, 2, cin, cout) -> (4, 4, 2, 2, cin, cout)
    k = k8.reshape(4, 2, 4, 2, cin, cout).transpose(0, 2, 1, 3, 4, 5)
    return k.reshape(4, 4, 4 * cin, cout)


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (ResNet-18/34).

    With `fuse_block` (requires bn_frozen + bn_frozen_affine), stride-1
    IDENTITY blocks run as ONE whole-block Pallas kernel each way
    (ops/pallas/basic_fused.py) — the keypoint family's resnet18 backbone gets
    the same fused treatment as the flagship's bottlenecks. Strided/projection
    blocks keep the XLA path."""

    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef

    expansion: int = 1
    fuse_block: bool = False
    # frozen-stage member: stop-gradient the conv kernels at the use site so the
    # fused custom-VJP ops see NO tangent-carrying inputs and run their no-save
    # primal forwards. The downstream stop_gradient alone (frozen_stages) DCEs
    # the backward but NOT the save-forward's residual writes: a multi-output
    # Pallas custom call is all-or-nothing to XLA's DCE, so the dead h1/h2/
    # boundary residual HBM writes survive (~4-5 ms/step measured at flagship
    # shapes, trace outputs/traces/step_r3s4).
    freeze: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fuse_block and self.strides == 1 and x.shape[-1] == self.filters:
            return self._call_fused_block(x)
        residual = x
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides), padding=((1, 1), (1, 1)))(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=((1, 1), (1, 1)))(y)
        # zero-init of the last BN scale makes each block start as identity — a
        # standard trick that speeds early training (Goyal et al. 2017).
        y = self.norm(scale_init=nn.initializers.zeros_init())(y)

        if residual.shape != y.shape:
            residual = self.conv(
                self.filters, (1, 1), (self.strides, self.strides), padding="VALID", name="conv_proj"
            )(residual)
            residual = self.norm(name="norm_proj")(residual)

        return nn.relu(y + residual)

    def _call_fused_block(self, x):
        from argus_tpu.ops.pallas.basic_fused import fused_basic_block

        eps = self.norm.keywords.get("epsilon", 1e-5)
        f = self.filters
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        g = _grid_images(n, h, w, x.shape[-1])
        sg = jax.lax.stop_gradient if self.freeze else (lambda a: a)

        k1 = sg(_Conv3x3Params(f, name="Conv_0")(x.shape[-1]))
        s1, b1, m1, v1 = _FrozenBNParams(name="BatchNorm_0")(f)
        k2 = sg(_Conv3x3Params(f, name="Conv_1")(f))
        s2, b2, m2, v2 = _FrozenBNParams(
            scale_init=nn.initializers.zeros_init(), name="BatchNorm_1"
        )(f)
        return fused_basic_block(
            x, k1, s1, b1, m1, v1, k2, s2, b2, m2, v2, eps=eps, g=g
        )


class _Conv1x1Params(nn.Module):
    """Parameter holder matching `nn.Conv`'s variable layout for a bias-free 1x1
    conv — used by the fused pointwise path so the param tree (and therefore
    checkpoints and the torchvision importer) is IDENTICAL to the unfused path.
    Flax derives param RNG keys from the module path, so with the same explicit
    names the init values match the unfused path bit-for-bit."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, in_features, self.features),
            jnp.float32,
        )


class _Conv7x7Params(nn.Module):
    """`nn.Conv`-layout parameter holder for the bias-free 7x7 stem conv
    (fused-stem path; see _Conv1x1Params for the naming/RNG rationale)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, in_features, self.features),
            jnp.float32,
        )


class _Conv3x3Params(nn.Module):
    """`nn.Conv`-layout parameter holder for a bias-free 3x3 conv (fused-block
    path; see _Conv1x1Params for the naming/RNG-compatibility rationale)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, in_features, self.features),
            jnp.float32,
        )


class _FrozenBNParams(nn.Module):
    """Parameter holder matching `ops.norm.BatchNorm`'s variable layout (params:
    scale/bias; batch_stats: mean/var), returning the raw frozen buffers for the
    fused pointwise path (models/resnet.py fused BottleneckBlock)."""

    scale_init: Callable = nn.initializers.ones_init()

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", self.scale_init, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (features,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (features,), jnp.float32
        )
        var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (features,), jnp.float32
        )
        # full FrozenBatchNorm2d: scale/bias are buffers, not trainables
        return (
            jax.lax.stop_gradient(scale),
            jax.lax.stop_gradient(bias),
            mean.value,
            var.value,
        )



def _grid_images(n: int, h: int, w: int, cin: int) -> int:
    """Images per Pallas grid step for the fused block kernels.

    Two binding constraints, both measured on v5e (110 MB scoped-VMEM limit):
      * MXU rows: target ~2048 rows per step (stage 3's 8x8 = 64 rows/image
        starves the 128-row MXU alone);
      * VMEM: the saved-residual backward holds ~5 double-buffered x-sized
        blocks + f32 weight-grad accumulators + f32 temps; capping the x-like
        block at 4 MB (G*H*W*CIN*2B) keeps every ResNet-50/101 geometry under
        the limit (G=32 at stage 3 compiled to a 118 MB demand and OOMed;
        G=16 fits).
    """
    import math

    rows_cap = max(1, 2048 // (h * w))
    vmem_cap = max(1, (4 * 1024 * 1024) // (h * w * cin * 2))
    return math.gcd(n, min(rows_cap, vmem_cap))


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual block (ResNet-50/101/152), expansion 4.

    With `fuse_pointwise` (only legal under bn_frozen + bn_frozen_affine) the two
    1x1 convs run as Pallas fused matmul kernels with the frozen-BN affine folded
    into the weights and relu/residual in the epilogue, plus a single-pass
    combined backward (ops/pallas/pointwise.py). The variable tree is unchanged.

    With `fuse_block` (same frozen-affine requirement), stride-1 IDENTITY blocks
    run as ONE whole-block Pallas kernel each way (ops/pallas/block_fused.py):
    interiors VMEM-resident, the 3x3 as nine shifted MXU matmuls, the backward a
    single pass over (x, g, out, h1, h2). Measured 1.28x vs XLA fwd+bwd at
    stage-0 geometry. Projection/stride-2 blocks keep the XLA path."""

    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef

    expansion: int = 4
    fuse_pointwise: bool = False
    fuse_block: bool = False
    # fuse PROJECTION (stage-entry / strided) blocks too (ops/pallas/proj_fused.py)
    fuse_proj: bool = False
    pw_impl: str = "auto"  # forwarded to the fused ops
    # frozen-stage member: stop-gradient the conv kernels at the use site so the
    # fused custom-VJP ops run their no-save primal forwards (see BasicBlock.freeze)
    freeze: bool = False

    @nn.compact
    def __call__(self, x, fused_fold: bool = False):
        is_identity = self.strides == 1 and x.shape[-1] == self.filters * self.expansion
        if fused_fold:
            # register this block's params and return the FOLDED effective
            # weights instead of applying — the whole-stage chain kernels
            # (ops/pallas/stage_fused.py) consume all blocks' weights at once.
            # `x` may be a ShapeDtypeStruct: only .shape/.dtype are read.
            return self._fold_params(x.dtype, x.shape[-1], is_identity)
        if self.fuse_block and is_identity:
            return self._call_fused_block(x)
        if self.fuse_proj and not is_identity:
            return self._call_fused_proj(x)
        if self.fuse_pointwise:
            return self._call_fused(x)
        residual = x
        y = self.conv(self.filters, (1, 1), padding="VALID")(x)
        y = self.norm()(y)
        y = nn.relu(y)
        # stride on the 3x3 (torchvision's "v1.5" placement, the variant the
        # reference's pretrained weights use)
        y = self.conv(self.filters, (3, 3), (self.strides, self.strides), padding=((1, 1), (1, 1)))(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * self.expansion, (1, 1), padding="VALID")(y)
        y = self.norm(scale_init=nn.initializers.zeros_init())(y)

        if residual.shape != y.shape:
            residual = self.conv(
                self.filters * self.expansion, (1, 1), (self.strides, self.strides), padding="VALID", name="conv_proj"
            )(residual)
            residual = self.norm(name="norm_proj")(residual)

        return nn.relu(y + residual)

    def _call_fused_block(self, x):
        from argus_tpu.ops.pallas.block_fused import fused_bottleneck_block

        eps = self.norm.keywords.get("epsilon", 1e-5)
        cin = x.shape[-1]
        f = self.filters
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        g = _grid_images(n, h, w, cin)
        sg = jax.lax.stop_gradient if self.freeze else (lambda a: a)

        k1 = sg(_Conv1x1Params(f, name="Conv_0")(cin))
        s1, b1, m1, v1 = _FrozenBNParams(name="BatchNorm_0")(f)
        k2 = sg(_Conv3x3Params(f, name="Conv_1")(f))
        s2, b2, m2, v2 = _FrozenBNParams(name="BatchNorm_1")(f)
        k3 = sg(_Conv1x1Params(cin, name="Conv_2")(f))
        s3, b3, m3, v3 = _FrozenBNParams(
            scale_init=nn.initializers.zeros_init(), name="BatchNorm_2"
        )(cin)
        return fused_bottleneck_block(
            x, k1, s1, b1, m1, v1, k2, s2, b2, m2, v2, k3, s3, b3, m3, v3,
            eps=eps, impl=self.pw_impl, g=g,
        )

    def _call_fused_proj(self, x):
        from argus_tpu.ops.pallas.proj_fused import fused_projection_block

        eps = self.norm.keywords.get("epsilon", 1e-5)
        cin = x.shape[-1]
        f = self.filters
        cout = f * self.expansion
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        g = _grid_images(n, h, w, cin)
        sg = jax.lax.stop_gradient if self.freeze else (lambda a: a)

        k1 = sg(_Conv1x1Params(f, name="Conv_0")(cin))
        s1, b1, m1, v1 = _FrozenBNParams(name="BatchNorm_0")(f)
        k2 = sg(_Conv3x3Params(f, name="Conv_1")(f))
        s2, b2, m2, v2 = _FrozenBNParams(name="BatchNorm_1")(f)
        k3 = sg(_Conv1x1Params(cout, name="Conv_2")(f))
        s3, b3, m3, v3 = _FrozenBNParams(
            scale_init=nn.initializers.zeros_init(), name="BatchNorm_2"
        )(cout)
        ksc = sg(_Conv1x1Params(cout, name="conv_proj")(cin))
        ssc, bsc, msc, vsc = _FrozenBNParams(name="norm_proj")(cout)
        return fused_projection_block(
            x,
            k1, s1, b1, m1, v1,
            k2, s2, b2, m2, v2,
            k3, s3, b3, m3, v3,
            ksc, ssc, bsc, msc, vsc,
            stride=self.strides, eps=eps, impl=self.pw_impl, g=g,
        )

    def _fold_params(self, dtype, cin, is_identity):
        """Register this block's params (same holders/names as the fused-call
        paths, so the variable tree and init RNG order are unchanged) and
        return the frozen-BN-folded effective weights: a 6-tuple for identity
        blocks, an 8-tuple (incl. shortcut) for projection blocks — the
        stage-chain operand layout (ops/pallas/stage_fused.py)."""
        from argus_tpu.ops.pallas.block_fused import fold_bottleneck_params
        from argus_tpu.ops.pallas.proj_fused import fold_projection_params

        eps = self.norm.keywords.get("epsilon", 1e-5)
        f = self.filters
        cout = f * self.expansion

        k1 = _Conv1x1Params(f, name="Conv_0")(cin)
        s1, b1, m1, v1 = _FrozenBNParams(name="BatchNorm_0")(f)
        k2 = _Conv3x3Params(f, name="Conv_1")(f)
        s2, b2, m2, v2 = _FrozenBNParams(name="BatchNorm_1")(f)
        k3 = _Conv1x1Params(cout, name="Conv_2")(f)
        s3, b3, m3, v3 = _FrozenBNParams(
            scale_init=nn.initializers.zeros_init(), name="BatchNorm_2"
        )(cout)
        if is_identity:
            return fold_bottleneck_params(
                dtype, k1, s1, b1, m1, v1, k2, s2, b2, m2, v2, k3, s3, b3, m3, v3,
                eps=eps,
            )
        ksc = _Conv1x1Params(cout, name="conv_proj")(cin)
        ssc, bsc, msc, vsc = _FrozenBNParams(name="norm_proj")(cout)
        return fold_projection_params(
            dtype, k1, s1, b1, m1, v1, k2, s2, b2, m2, v2, k3, s3, b3, m3, v3,
            ksc, ssc, bsc, msc, vsc, eps=eps,
        )

    def _call_fused(self, x):
        from argus_tpu.ops.pallas.pointwise import pointwise_conv_frozen_bn

        eps = self.norm.keywords.get("epsilon", 1e-5)
        cin = x.shape[-1]
        cout = self.filters * self.expansion
        sg = jax.lax.stop_gradient if self.freeze else (lambda a: a)

        k1 = sg(_Conv1x1Params(self.filters, name="Conv_0")(cin))
        s1, b1, m1, v1 = _FrozenBNParams(name="BatchNorm_0")(self.filters)
        y = pointwise_conv_frozen_bn(
            x, k1, s1, b1, m1, v1, eps=eps, relu=True, impl=self.pw_impl
        )

        y = self.conv(
            self.filters,
            (3, 3),
            (self.strides, self.strides),
            padding=((1, 1), (1, 1)),
            name="Conv_1",
        )(y)
        y = self.norm(name="BatchNorm_1")(y)
        y = nn.relu(y)

        residual = x
        if self.strides != 1 or cin != cout:
            residual = self.conv(
                cout, (1, 1), (self.strides, self.strides), padding="VALID", name="conv_proj"
            )(residual)
            residual = self.norm(name="norm_proj")(residual)

        k3 = sg(_Conv1x1Params(cout, name="Conv_2")(self.filters))
        s3, b3, m3, v3 = _FrozenBNParams(
            scale_init=nn.initializers.zeros_init(), name="BatchNorm_2"
        )(cout)
        return pointwise_conv_frozen_bn(
            y, k3, s3, b3, m3, v3, eps=eps, relu=True, residual=residual, impl=self.pw_impl
        )


class ResNet(nn.Module):
    """NHWC ResNet with a trailing `output_dim` projection head.

    Args:
        stage_sizes: blocks per stage, e.g. (3, 4, 6, 3) for ResNet-50.
        block_cls: BasicBlock or BottleneckBlock.
        output_dim: dimension of the final fc projection (the reference replaces
            torchvision's 1000-way classifier with a 1024-d projection,
            argus/models.py:56). Set to None to return pooled features.
        dtype: compute dtype (params stay fp32). bf16 is MXU-native on TPU.
    """

    stage_sizes: Sequence[int]
    block_cls: ModuleDef
    output_dim: int | None = 1024
    num_filters: int = 64
    dtype: jnp.dtype = jnp.float32
    norm_momentum: float = 0.9
    norm_eps: float = 1e-5
    # MLPerf-style stem: fold a 2x2 space-to-depth into conv1, turning the 7x7/s2
    # conv over 3 channels (MXU-hostile: C=3 pads to 8 lanes, huge spatial extent)
    # into an EXACTLY equivalent 4x4/s1 conv over 12 channels. Pretrained torch
    # weights are rewritten losslessly (conv1_kernel_to_s2d).
    stem_space_to_depth: bool = False
    # rematerialize residual blocks in the backward pass: trades FLOPs for HBM
    # traffic (the step is HBM-roofline-bound, see CLAUDE.md profile). `remat=True`
    # checkpoints every block; `remat_stages` checkpoints only the listed stage
    # indices (0-3) — the early stages hold the large spatial activations (stage 0
    # at 64x64 is ~half the backbone's activation bytes but a small fraction of its
    # FLOPs, so selective remat buys bytes cheaply).
    remat: bool = False
    remat_stages: Sequence[int] = ()
    # HBM-lean BatchNorm training mode (ops/norm.py): H-strided batch statistics /
    # dgamma-dbeta subsampling. 1/1 = exact flax/torch semantics.
    bn_stats_stride: int = 1
    bn_grad_stride: int = 1
    bn_impl: str = "xla"  # "xla" | "pallas" | "auto" (pallas reduce kernels on TPU)
    # frozen-STEM fine-tune mode: stop gradients at the stem output, freezing
    # conv_init (+ the already-frozen norm_init). The stem is <2.5% of model
    # FLOPs but its backward costs 6.4 ms of the 82 ms flagship step — and of
    # that, ~70% is maxpool cotangent ROUTING, not wgrad math
    # (.bench/bench_stem_bwd.py decomposition: pool routing ~4.6 ms, wgrad
    # matmuls ~1.35 ms). ImageNet-pretrained first-conv features (edge/color
    # filters) are generic; convergence A/B in docs/ROUND3_NOTES.md.
    stem_frozen: bool = False
    # Subsampled stem weight-grad (fused-stem path only): compute conv_init's
    # dW on every k-th image of the batch, scaled by k — an unbiased
    # estimator under shuffling, same design as bn_grad_stride. The stem
    # backward is ~70% maxpool-cotangent routing for <2.5% of model FLOPs;
    # the full-accuracy alternative to stem_frozen (which measured -3 deg rot
    # on the synthetic-pretrain A/B where the stem still needs to learn).
    stem_grad_stride: int = 1
    # Progressive layer freezing for fine-tune: freeze the stem AND stages
    # 0..k-1 via ONE stop_gradient at the output of stage k-1 (blocking the
    # cotangent there makes everything upstream primal-only: the fused-stage/
    # block custom-VJP kernels run their no-save forwards and their backward
    # kernels disappear from the step). 0 = off. Motivation: the 3-seed
    # convergence A/B showed freezing the generic early layers IMPROVES
    # fine-tune accuracy at this dataset scale (frozen-stem arm,
    # ACCURACY_r03.json) while deleting backward cost — stage 0's backward
    # chain alone is ~15 ms of the 76 ms flagship step and runs at the F=64
    # MXU shape ceiling (docs/ROUND3_NOTES.md). Evidence per k in the A/B.
    frozen_stages: int = 0
    # frozen-BN fine-tune mode: normalize with running stats even when train=True
    # (torchvision FrozenBatchNorm2d semantics; see models/pose_cnn.py rationale)
    bn_frozen: bool = False
    # full FrozenBatchNorm2d: freeze scale/bias too (torchvision keeps all four as
    # buffers). Kills the dgamma/dbeta activation re-reads in the backward — the
    # dominant remaining HBM cost of the bn_frozen step (see ops/norm.py).
    bn_frozen_affine: bool = False
    # Fused Pallas pointwise-conv path for bottleneck 1x1 convs (requires
    # bn_frozen + bn_frozen_affine; ops/pallas/pointwise.py). "auto" = on when
    # running on TPU; "on" forces the op (XLA fallback math on CPU); "off".
    # Default off — measured slower than XLA at flagship shapes due to layout
    # copies at every Pallas/conv boundary (see models/pose_cnn.py note).
    fuse_pointwise: str = "off"
    # Whole-block fused Pallas kernels for stride-1 identity bottleneck blocks
    # (requires bn_frozen + bn_frozen_affine; ops/pallas/block_fused.py).
    # Every geometry beats XLA fwd+bwd in isolation once deep stages run
    # multi-image grids (G images per grid step; docs/ROUND3_NOTES.md), so the
    # default is "auto" (= on under TPU) over ALL stages. The round-2 (0,1)
    # restriction predated the grids.
    fuse_block: str = "auto"
    fuse_block_stages: Sequence[int] = (0, 1, 2, 3)
    # Fuse PROJECTION (stage-entry / strided) blocks too — with fuse_block over
    # all stages this leaves the stem as the only XLA conv in the backbone
    # (ops/pallas/proj_fused.py). Same "on"/"auto"/"off" semantics.
    fuse_proj: str = "auto"
    # Fuse the STEM (conv7x7/s2 + frozen BN + relu + maxpool) as one Pallas
    # kernel via a 4x4 space-to-depth matmul formulation with parity-packed
    # outputs (ops/pallas/stem_fused.py) — zero XLA convs remain in the
    # backbone. Requires bn_frozen + bn_frozen_affine and num_filters=64; the
    # stem_space_to_depth option is mutually exclusive. In-step WIN: the stem
    # region fell 27 -> ~14 ms/step with the one-hot-conv s2d feed
    # (docs/ROUND3_NOTES.md) — default "auto" (= on under TPU).
    fuse_stem: str = "auto"
    # Chain each listed stage's blocks (projection entry + identity blocks)
    # into ONE Pallas kernel per direction (ops/pallas/stage_fused.py): the
    # running activation and cotangent stay in VMEM across blocks, removing
    # ~4 stage-sized HBM passes per inter-block boundary. Requires fuse_block
    # AND fuse_proj active for the stage. Default stage 0 only: measured
    # +1.4 ms there (25.8 vs 27.2 ms isolated, docs/ROUND3_NOTES.md); the
    # stage-1 chain (proj+3id) ran >40 min in the remote Mosaic compile before
    # the service dropped the connection, and stage 3's weight-grad VMEM
    # accumulators alone (~60 MB f32) don't fit. "auto"/"on"/"off";
    # "auto" = on under TPU (end-to-end: 85.2 -> 83.5 ms/step).
    fuse_stage: str = "auto"
    fuse_stage_stages: Sequence[int] = (0,)

    @nn.compact
    def __call__(self, x, train: bool = False, return_spatial: bool = False):
        # explicit torch-style symmetric padding: flax's "SAME" pads (2,3) for
        # stride-2 7x7/3x3 convs while torch pads (3,3)/(1,1) — a one-pixel shift
        # that breaks imported pretrained-weight fidelity (models/torch_import.py)
        conv = functools.partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = functools.partial(
            BatchNorm,
            use_running_average=(not train) or self.bn_frozen,
            momentum=self.norm_momentum,
            epsilon=self.norm_eps,
            dtype=self.dtype,
            stats_stride=self.bn_stats_stride,
            grad_stride=self.bn_grad_stride,
            impl=self.bn_impl,
            frozen_affine=self.bn_frozen and self.bn_frozen_affine,
        )

        fuse_stem_on = (
            self.bn_frozen
            and self.bn_frozen_affine
            and self.num_filters == 64
            and not self.stem_space_to_depth
            # the s2d(4) + in-kernel pool formulation needs H, W % 8 == 0;
            # anything else falls back to the XLA stem instead of asserting
            and x.shape[1] % 8 == 0
            and x.shape[2] % 8 == 0
            and x.shape[3] == 3
            and (
                self.fuse_stem == "on"
                or (self.fuse_stem == "auto" and jax.default_backend() == "tpu")
            )
        )
        # Will stage 0 run the PACKED frozen forward chain? Then the fused stem
        # emits its pair-packed output layout directly: the stem's 64-lane
        # output tiles (half-empty (8,128) HBM tiles) and the consumer-side
        # relayout both disappear (stem_fused._forward_math_packed).
        fuse_stg_pred = all(
            f == "on" or (f == "auto" and jax.default_backend() == "tpu")
            for f in (self.fuse_block, self.fuse_proj, self.fuse_stage)
        )
        if fuse_stem_on and fuse_stg_pred and self.frozen_stages >= 1:
            from argus_tpu.ops.pallas.stage_fused import _packed_fwd_ok

            stem_packed_out = (
                self.block_cls is BottleneckBlock
                and 0 in self.fuse_block_stages
                and self.bn_frozen
                and self.bn_frozen_affine
                and _packed_fwd_ok(
                    self.num_filters, 1, x.shape[2] // 4, self.num_filters,
                    self.num_filters * self.block_cls.expansion,
                )
            )
        else:
            stem_packed_out = False
        # The stem is frozen under stem_frozen OR any frozen_stages depth. For
        # the fused stem, stop-gradient the kernel AT THE USE SITE: with no
        # tangent-carrying inputs the custom-VJP op runs its no-save primal,
        # dropping the dead yg residual write (256x128x128x64 bf16 = 537 MB at
        # flagship shapes) that survives DCE when only the downstream
        # stop_gradient blocks the cotangent (multi-output Pallas custom calls
        # are all-or-nothing to XLA's DCE; trace outputs/traces/step_r3s4).
        stem_frozen = self.stem_frozen or self.frozen_stages >= 1
        sg_stem = jax.lax.stop_gradient if stem_frozen else (lambda a: a)
        x = x.astype(self.dtype)
        if fuse_stem_on:
            from argus_tpu.ops.pallas.stem_fused import fused_stem_pool

            k7 = sg_stem(_Conv7x7Params(self.num_filters, name="conv_init")(x.shape[-1]))
            s0, b0, m0, v0 = _FrozenBNParams(name="norm_init")(self.num_filters)
            x = fused_stem_pool(
                x, k7, s0, b0, m0, v0, eps=self.norm_eps,
                grad_stride=self.stem_grad_stride,
                packed_out=stem_packed_out,
            )
        elif self.stem_space_to_depth:
            x = space_to_depth(x, 2)
            x = conv(
                self.num_filters, (4, 4), (1, 1), padding=((2, 1), (2, 1)), name="conv_init_s2d"
            )(x)
        else:
            x = conv(self.num_filters, (7, 7), (2, 2), padding=((3, 3), (3, 3)), name="conv_init")(x)
        if not fuse_stem_on:
            x = norm(name="norm_init")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.stem_frozen:
            # freeze conv_init/norm_init: the whole stem backward (wgrad +
            # maxpool cotangent routing) drops out of the step. Running-stat
            # updates (exact-BN mode) are state mutations, not gradients, and
            # are unaffected.
            x = jax.lax.stop_gradient(x)

        fuse_pw = (
            self.block_cls is BottleneckBlock
            and self.bn_frozen
            and self.bn_frozen_affine
            and (
                self.fuse_pointwise in ("on", "dot")
                or (self.fuse_pointwise == "auto" and jax.default_backend() == "tpu")
            )
        )
        fuse_blk = (
            self.block_cls in (BottleneckBlock, BasicBlock)
            and self.bn_frozen
            and self.bn_frozen_affine
            and (
                self.fuse_block == "on"
                or (self.fuse_block == "auto" and jax.default_backend() == "tpu")
            )
        )
        fuse_prj = (
            self.block_cls is BottleneckBlock
            and self.bn_frozen
            and self.bn_frozen_affine
            and (
                self.fuse_proj == "on"
                or (self.fuse_proj == "auto" and jax.default_backend() == "tpu")
            )
        )
        # "dot" expresses the 1x1 convs as XLA dot_generals (impl="xla" in the
        # fused op) instead of Pallas kernels — dots can join XLA output fusions,
        # which conv custom-calls cannot.
        base_kwargs = {}
        if fuse_pw:
            base_kwargs = {
                "fuse_pointwise": True,
                "pw_impl": "xla" if self.fuse_pointwise == "dot" else "auto",
            }
        fuse_stg = (
            fuse_blk
            and fuse_prj
            and (
                self.fuse_stage == "on"
                or (self.fuse_stage == "auto" and jax.default_backend() == "tpu")
            )
        )
        if not 0 <= self.frozen_stages <= len(self.stage_sizes):
            raise ValueError(
                f"frozen_stages={self.frozen_stages} out of range for "
                f"{len(self.stage_sizes)} stages"
            )
        remat_cls = nn.remat(self.block_cls)
        for i, block_count in enumerate(self.stage_sizes):
            frozen = i < self.frozen_stages
            if frozen:
                # Stop the INPUT tangent too: with the weights also
                # stop-gradient'd (freeze flag / folded-weight sg below), the
                # fused custom-VJP ops see zero tangent inputs and trace their
                # no-save primal forwards — the save-forward's dead residual
                # writes otherwise survive DCE (see BasicBlock.freeze doc).
                x = jax.lax.stop_gradient(x)
            # Frozen stages chain WHOLE (chain_cap=block_count): the 3-block
            # cap guards the unrolled multi-block BACKWARD Mosaic compile
            # pathology, and frozen stages never trace a backward. Measured
            # fwd-only: whole-stage chains compile in 12-38 s and beat the
            # split/per-block forwards at stages 1-2 (.bench/bench_fwd_chain.py).
            use_chain = (
                fuse_stg
                and i in self.fuse_block_stages
                and (i in self.fuse_stage_stages or frozen)
            )
            if use_chain:
                # whole-stage chain: one Pallas kernel per direction; the
                # chain's saved-residual backward is already memory-lean, so
                # remat flags don't apply here (docstring in stage_fused.py)
                from argus_tpu.ops.pallas.stage_fused import fused_stage

                packed_in = i == 0 and stem_packed_out
                n_, h_ = x.shape[0], x.shape[1]
                # with a packed stem handoff x is the (N, H, W/2, 2C) view;
                # fold/grid geometry uses the LOGICAL shape
                w_ = x.shape[2] * (2 if packed_in else 1)
                cin_ = x.shape[-1] // (2 if packed_in else 1)
                s0 = 2 if i > 0 else 1
                cout = self.num_filters * 2**i * self.block_cls.expansion
                folded = []
                for j in range(block_count):
                    blk = self.block_cls(
                        filters=self.num_filters * 2**i,
                        strides=s0 if j == 0 else 1,
                        conv=conv,
                        norm=norm,
                        name=f"stage{i}_block{j}",
                    )
                    if j == 0:
                        xin = (
                            jax.ShapeDtypeStruct((n_, h_, w_, cin_), x.dtype)
                            if packed_in
                            else x
                        )
                    else:
                        xin = jax.ShapeDtypeStruct(
                            (n_, h_ // s0, w_ // s0, cout), x.dtype
                        )
                    fw = blk(xin, fused_fold=True)
                    if frozen:
                        fw = jax.tree_util.tree_map(jax.lax.stop_gradient, fw)
                    folded.append(fw)
                g = _grid_images(n_, h_, w_, cin_)
                x = fused_stage(
                    x, folded[0], folded[1:], stride=s0, g=g,
                    chain_cap=block_count if frozen else 3,
                    x_packed=packed_in,
                )
            else:
                block_cls = remat_cls if (self.remat or i in self.remat_stages) else self.block_cls
                block_kwargs = dict(base_kwargs)
                if frozen:
                    block_kwargs["freeze"] = True
                if fuse_blk and i in self.fuse_block_stages:
                    block_kwargs["fuse_block"] = True
                if fuse_prj and i in self.fuse_block_stages:
                    # projection/strided fusion exists for bottlenecks only
                    block_kwargs["fuse_proj"] = True
                for j in range(block_count):
                    strides = 2 if i > 0 and j == 0 else 1
                    x = block_cls(
                        filters=self.num_filters * 2**i,
                        strides=strides,
                        conv=conv,
                        norm=norm,
                        name=f"stage{i}_block{j}",
                        **block_kwargs,
                    )(x)
            if i == self.frozen_stages - 1:
                # one stop_gradient at the deepest frozen stage blocks grads to
                # this stage, all earlier stages, and the stem (see field doc)
                x = jax.lax.stop_gradient(x)

        if return_spatial:
            # stride-32 feature map for dense-prediction heads (keypoint variant)
            return x.astype(jnp.float32)

        # global average pool == AdaptiveAvgPool2d((1,1)) (argus/models.py:55)
        x = jnp.mean(x, axis=(1, 2))
        if self.output_dim is not None:
            x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc")(x)
        return x.astype(jnp.float32)


def resnet18(**kw) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock, **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=BottleneckBlock, **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), block_cls=BottleneckBlock, **kw)


BACKBONES: dict[str, Callable[..., ResNet]] = {
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
}

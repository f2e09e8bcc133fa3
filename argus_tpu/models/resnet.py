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
import jax.numpy as jnp

ModuleDef = Any


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (ResNet-18/34)."""

    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef

    expansion: int = 1

    @nn.compact
    def __call__(self, x):
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


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual block (ResNet-50/101/152), expansion 4."""

    filters: int
    strides: int
    conv: ModuleDef
    norm: ModuleDef

    expansion: int = 4

    @nn.compact
    def __call__(self, x):
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

    @nn.compact
    def __call__(self, x, train: bool = False):
        # explicit torch-style symmetric padding: flax's "SAME" pads (2,3) for
        # stride-2 7x7/3x3 convs while torch pads (3,3)/(1,1) — a one-pixel shift
        # that breaks imported pretrained-weight fidelity (models/torch_import.py)
        conv = functools.partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = functools.partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=self.norm_momentum,
            epsilon=self.norm_eps,
            dtype=self.dtype,
        )

        x = x.astype(self.dtype)
        x = conv(self.num_filters, (7, 7), (2, 2), padding=((3, 3), (3, 3)), name="conv_init")(x)
        x = norm(name="norm_init")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = 2 if i > 0 and j == 0 else 1
                x = self.block_cls(
                    filters=self.num_filters * 2**i,
                    strides=strides,
                    conv=conv,
                    norm=norm,
                    name=f"stage{i}_block{j}",
                )(x)

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

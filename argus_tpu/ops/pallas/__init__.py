"""Pallas TPU kernels for the hot augmentation ops."""

from argus_tpu.ops.pallas.blur import fused_random_blur

__all__ = ["fused_random_blur"]

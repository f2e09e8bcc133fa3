"""Basic on-device image ops (NHWC)."""

from __future__ import annotations

import jax.numpy as jnp


def u8_to_f32(images: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [0, 255] -> float [0, 1]. Ship uint8 to the device; convert there.

    `dtype=bfloat16` keeps the whole augmentation pipeline in the MXU/VPU-native
    16-bit type (u8 values are exactly representable in bf16's 8-bit mantissa)."""
    return images.astype(dtype) * dtype(1.0 / 255.0)


def center_crop(images: jnp.ndarray, crop_hw: tuple) -> jnp.ndarray:
    """Static center crop of (..., H, W, C) images to (..., ch, cw, C).

    Same pixel selection as the host-side numpy crop and the reference's kornia
    center_crop (argus/data.py:219-222).
    """
    h, w = images.shape[-3], images.shape[-2]
    ch, cw = crop_hw
    top = (h - ch) // 2
    left = (w - cw) // 2
    return images[..., top : top + ch, left : left + cw, :]

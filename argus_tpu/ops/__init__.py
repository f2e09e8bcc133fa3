"""On-device image ops: preprocessing + the full augmentation stack.

Replaces kornia (reference: argus/data.py:41-103) with pure-JAX, PRNG-keyed, batched
implementations that run **on the TPU inside the jitted train step**, where XLA fuses
them with the first convolution. The reference runs these on CPU in DataLoader
workers and is input-bound because of it (argus/train.py:64,147).
"""

from argus_tpu.ops.augment import Augmentation, AugmentationConfig, apply_augmentation
from argus_tpu.ops.image import center_crop, u8_to_f32

__all__ = [
    "Augmentation",
    "AugmentationConfig",
    "apply_augmentation",
    "center_crop",
    "u8_to_f32",
]

"""Model zoo: flax ResNet backbones + the NCameraCNN pose regressor.

Replaces the reference's torchvision-ResNet-50-based `argus/models.py`.
"""

from argus_tpu.models.pose_cnn import NCameraCNN, NCameraCNNConfig
from argus_tpu.models.resnet import ResNet, resnet18, resnet34, resnet50, resnet101

__all__ = [
    "NCameraCNN",
    "NCameraCNNConfig",
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
]

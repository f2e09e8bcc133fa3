"""Dataset + host input feed (replaces the reference's `argus/data.py`).

The split of responsibilities is TPU-first (SURVEY.md §7.2-7.3):
  * host side: HDF5 metadata, PNG decode, batching, per-host sharding, prefetch —
    everything cheap and IO-bound, producing **uint8** batches (4x less host->device
    bandwidth than the reference's float32 worker pipeline);
  * device side: u8->f32, crop, normalize, and the full augmentation stack run as one
    jitted program fused into the train step (`argus_tpu.ops`).
"""

from argus_tpu.data.dataset import (
    CameraCubePoseDataset,
    CameraCubePoseDatasetConfig,
    HostDataLoader,
)
from argus_tpu.data.resident import DeviceResidentData, ResidentShardedData
from argus_tpu.data.streaming import StreamingRenderLoader
from argus_tpu.data.synthetic import write_synthetic_dataset

__all__ = [
    "CameraCubePoseDataset",
    "CameraCubePoseDatasetConfig",
    "DeviceResidentData",
    "ResidentShardedData",
    "HostDataLoader",
    "StreamingRenderLoader",
    "write_synthetic_dataset",
]

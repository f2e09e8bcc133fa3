"""Device-resident dataset: keep the whole (small) training split in HBM.

The reference's pipeline is input-bound by its own admission ("something maxes
the GPU throughput far before the memory is saturated", argus/train.py:64):
every step re-decodes PNGs in DataLoader workers and ships a 12+ MB batch
host->device. For datasets that FIT in HBM — this workload's datasets are a few
GB of 256x256 pairs at most — the TPU-native move is to upload the uint8 split
ONCE and gather batches on-device; train.make_resident_epoch_step then runs the
whole epoch as one XLA program (on-device permutation + lax.scan), so sustained
end-to-end throughput equals compute throughput.

Promoted from the round-3 A/B harness's ad-hoc resident feed (VERDICT r3 #3;
measured there: 240 s -> 1-2 s per fine-tune arm through the harness tunnel).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class DeviceResidentData:
    """The train split as device arrays: images uint8 (N, H, W, 3*n_cams),
    poses float32 (N, 7) xyzw. Under a multi-device mesh both are replicated —
    per-shard gathers are resharded by GSPMD to the train step's batch specs."""

    def __init__(self, images: jax.Array, poses: jax.Array) -> None:
        self.images = images
        self.poses = poses
        self.n = int(images.shape[0])

    @staticmethod
    def bytes_estimate(dataset) -> int:
        """On-device footprint of the split: uint8 images + f32 poses."""
        h, w = dataset._out_hw()
        per_example = h * w * 3 * dataset.n_cams + 7 * 4
        return len(dataset) * per_example

    @classmethod
    def fits(cls, dataset, budget_mb: float) -> bool:
        """True when the split fits the configured HBM budget (MB)."""
        return budget_mb > 0 and cls.bytes_estimate(dataset) <= budget_mb * 2**20

    @classmethod
    def from_dataset(cls, dataset, mesh=None, n_threads: Optional[int] = None) -> "DeviceResidentData":
        """Decode the whole split (native libpng batch decoder when available)
        and upload it once — replicated over `mesh` when given."""
        import os

        idxs = list(range(len(dataset)))
        imgs = dataset.load_images_batch(idxs, n_threads=n_threads or (os.cpu_count() or 1))
        poses = np.asarray(dataset.cube_poses[idxs], np.float32)
        if mesh is not None:
            from argus_tpu.parallel import replicated

            sharding = replicated(mesh)
            return cls(jax.device_put(imgs, sharding), jax.device_put(poses, sharding))
        return cls(jnp.asarray(imgs), jnp.asarray(poses))

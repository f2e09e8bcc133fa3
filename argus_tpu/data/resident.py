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
        return cls(*_decode_upload(dataset, idxs, mesh, n_threads or (os.cpu_count() or 1)))


def _decode_upload(dataset, idxs, mesh, n_threads):
    """Decode `idxs` and move them on-device (replicated over `mesh` if given).
    jax transfers are async, so the returned arrays can be handed to a step
    while the copy is still in flight."""
    imgs = dataset.load_images_batch(idxs, n_threads=n_threads)
    poses = np.asarray(dataset.cube_poses[idxs], np.float32)
    if mesh is not None:
        from argus_tpu.parallel import replicated

        sharding = replicated(mesh)
        return jax.device_put(imgs, sharding), jax.device_put(poses, sharding)
    return jnp.asarray(imgs), jnp.asarray(poses)


class ResidentShardedData:
    """Datasets PAST the HBM budget: epoch-level resident shard swaps.

    The split is cut into equal-size index shards, each fitting HALF the
    budget (so the in-flight shard and the next one's upload coexist). Per
    epoch the shard ORDER is shuffled, each shard runs as one on-chip
    whole-shard program (train.make_resident_epoch_step over the shard), and
    while it runs a background thread decodes + device_puts the NEXT shard —
    one bulk transfer per shard instead of one 12+ MB host round-trip per
    step (the per-step feed costs ~0.7 s/batch through this harness's tunnel;
    a co-located host hides the swap entirely behind compute).

    Shuffle semantics are SHARD-LOCAL (shuffled shard order x shuffled order
    within each shard) — the standard big-dataset relaxation of a global
    shuffle (webdataset/tfrecord-style); the fully-resident path keeps the
    exact global permutation. Replaces: the reference's only answer to large
    datasets, its input-bound DataLoader (argus/train.py:64,288-321).
    """

    def __init__(self, dataset, budget_mb: float, mesh=None,
                 n_threads: Optional[int] = None, seed: int = 0) -> None:
        import os

        per_example = DeviceResidentData.bytes_estimate(dataset) / max(1, len(dataset))
        self.shard_size = max(1, int(budget_mb * 2**20 / 2 / per_example))
        n = len(dataset)
        self.n = n
        self.n_shards = -(-n // self.shard_size)
        self.dataset = dataset
        self.mesh = mesh
        self.n_threads = n_threads or (os.cpu_count() or 1)
        self.seed = seed
        # equal-size shards; the last one is smaller (its own compiled program)
        self.index_shards = [
            np.arange(i, min(i + self.shard_size, n))
            for i in range(0, n, self.shard_size)
        ]
        self.tail_size = len(self.index_shards[-1])

    @classmethod
    def applicable(cls, dataset, budget_mb: float) -> bool:
        """True when the split does NOT fit whole but shard swaps make sense
        (budget set, and at least one full batch per half-budget shard)."""
        return budget_mb > 0 and not DeviceResidentData.fits(dataset, budget_mb)

    def epoch_shards(self, epoch: int):
        """Yield (images, poses, segment, shard_len) per shard, shard order
        shuffled by epoch; decode+upload of the NEXT shard overlaps the
        caller's in-flight shard program (one background worker — decode is
        host-CPU-bound, the device copy is async anyway).

        `segment` = epoch * n_shards + shard position: feed it to the epoch
        program as its `epoch` scalar so every shard draws a fresh on-device
        permutation."""
        from concurrent.futures import ThreadPoolExecutor

        rng = np.random.default_rng((self.seed ^ 0x5A4D) + epoch)
        order = rng.permutation(self.n_shards)

        def load(k):
            idxs = self.index_shards[order[k]]
            imgs, poses = _decode_upload(self.dataset, list(idxs), self.mesh, self.n_threads)
            return imgs, poses, len(idxs)

        with ThreadPoolExecutor(max_workers=1) as pool:
            nxt = pool.submit(load, 0)
            for k in range(self.n_shards):
                imgs, poses, n_k = nxt.result()
                if k + 1 < self.n_shards:
                    nxt = pool.submit(load, k + 1)
                yield imgs, poses, epoch * self.n_shards + k, n_k

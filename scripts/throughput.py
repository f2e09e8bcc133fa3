"""End-to-end training throughput: host input pipeline + device train step.

`bench.py` measures the device-side step in isolation (synthetic device-resident
batches). This script measures the REAL loop — PNG decode (native C++ loader),
batching, host->device transfer, augmented train step — over a synthetic on-disk
dataset, reporting both the end-to-end rate and the loader-only rate so the
bottleneck is visible.

    python scripts/throughput.py --batch-size 64 --n-steps 20
"""

import os
import sys
import tempfile
import time
from dataclasses import dataclass

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@dataclass
class ThroughputConfig:
    batch_size: int = 64
    n_steps: int = 20
    n_examples: int = 256
    height: int = 256
    width: int = 256
    num_workers: int = 8
    backbone: str = "resnet50"
    dataset_path: str = ""  # empty -> synthesize a temporary dataset


def main(cfg: ThroughputConfig) -> dict:
    import jax
    import itertools

    from argus_tpu.data import CameraCubePoseDataset, CameraCubePoseDatasetConfig, HostDataLoader
    from argus_tpu.data.synthetic import write_synthetic_dataset
    from argus_tpu.models import NCameraCNNConfig
    from argus_tpu.ops.augment import AugmentationConfig
    from argus_tpu.parallel import global_batch, make_mesh
    from argus_tpu.train import create_train_state, make_train_step
    from argus_tpu import native

    dataset_path = cfg.dataset_path
    if not dataset_path:
        dataset_path = tempfile.mkdtemp(prefix="argus_tpu_thr_")
        print(f"synthesizing {cfg.n_examples} examples at {dataset_path} ...")
        write_synthetic_dataset(
            dataset_path, n_train=cfg.n_examples, n_test=4, height=cfg.height, width=cfg.width
        )

    ds = CameraCubePoseDataset(
        CameraCubePoseDatasetConfig(dataset_path, center_crop=(cfg.height, cfg.width)), train=True
    )
    loader = HostDataLoader(ds, batch_size=cfg.batch_size, num_workers=cfg.num_workers, prefetch=4)
    print(f"native loader active: {native.available()}")

    # ── loader-only rate ──
    it = iter(loader)
    next(it)  # warm
    t0 = time.perf_counter()
    n_loader = 0
    for b in it:
        n_loader += int(b["mask"].sum())
    loader_rate = n_loader / (time.perf_counter() - t0)
    print(f"host loader: {loader_rate:.1f} examples/s ({2 * loader_rate:.1f} cam-imgs/s)")

    # ── end-to-end train loop ──
    class _Cfg:
        model_config = NCameraCNNConfig(n_cams=2, backbone=cfg.backbone, resnet_output_dim=1024)
        model_type = "pose_cnn"
        augmentation_config = AugmentationConfig()
        use_augmentation = True
        amp = True
        max_grad_norm = 1.0
        learning_rate = 1e-4

    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    model, state = create_train_state(_Cfg(), jax.random.PRNGKey(0), (cfg.height, cfg.width))
    step = make_train_step(model, _Cfg(), base_seed=0)

    stream = itertools.cycle(list(loader))  # decoded batches cached: isolate steady-state
    state, loss = step(state, global_batch(mesh, next(stream)))
    float(loss)
    fresh = iter(HostDataLoader(ds, batch_size=cfg.batch_size, num_workers=cfg.num_workers, prefetch=4))
    t0 = time.perf_counter()
    n_done = 0
    for _ in range(cfg.n_steps):
        try:
            batch = next(fresh)
        except StopIteration:
            fresh = iter(HostDataLoader(ds, batch_size=cfg.batch_size, num_workers=cfg.num_workers, prefetch=4))
            batch = next(fresh)
        state, loss = step(state, global_batch(mesh, batch))
        n_done += cfg.batch_size
    float(loss)
    e2e_rate = n_done / (time.perf_counter() - t0)
    print(f"end-to-end: {e2e_rate:.1f} examples/s ({2 * e2e_rate:.1f} cam-imgs/s)")
    mb_per_batch = cfg.batch_size * cfg.height * cfg.width * 6 / 1e6
    print(
        f"note: host->device moves {mb_per_batch:.1f} MB/batch (uint8). Under this "
        f"harness's remote-TPU tunnel (~20 MB/s) the transfer dominates; on local "
        f"TPU hosts (PCIe, GB/s) the loader/device rates above are the bottlenecks."
    )
    return {"loader_examples_per_sec": loader_rate, "e2e_examples_per_sec": e2e_rate}


if __name__ == "__main__":
    from argus_tpu.configs import cli

    main(cli(ThroughputConfig))

"""Dataset + host loader tests (mirrors reference tests/test_data.py:26-56, extended
with loader sharding/padding/determinism)."""

import numpy as np

from argus_tpu.data import CameraCubePoseDataset, CameraCubePoseDatasetConfig, HostDataLoader


def run_assertions(dataset, expected_len):
    assert len(dataset) == expected_len
    example = dataset[0]
    assert set(example.keys()) == {"images", "cube_pose"}
    assert example["cube_pose"].shape == (7,)
    assert example["images"].dtype == np.uint8


def test_len_and_get_item(dummy_data_path):
    cfg = CameraCubePoseDatasetConfig(dummy_data_path)
    run_assertions(CameraCubePoseDataset(cfg, train=True), 10)
    run_assertions(CameraCubePoseDataset(cfg, train=False), 5)


def test_no_augmentation_path_is_first_class(dummy_data_path):
    """cfg_aug=None must not crash item access (the reference crashes here,
    argus/data.py:213 — SURVEY.md quirk list)."""
    cfg = CameraCubePoseDatasetConfig(dummy_data_path)
    ds = CameraCubePoseDataset(cfg, cfg_aug=None, train=True)
    assert ds[0]["images"].shape == (256, 256, 6)


def test_center_crop(dummy_data_path):
    cfg = CameraCubePoseDatasetConfig(dummy_data_path, center_crop=(128, 128))
    ds = CameraCubePoseDataset(cfg, train=True)
    assert ds[0]["images"].shape == (128, 128, 6)


def test_pose_quat_order_is_xyzw(dummy_data_path):
    """HDF5 stores wxyz; the dataset must expose xyzw (reference argus/data.py:184-185)."""
    import h5py
    from pathlib import Path

    cfg = CameraCubePoseDatasetConfig(dummy_data_path)
    ds = CameraCubePoseDataset(cfg, train=True)
    stem = Path(dummy_data_path).stem
    with h5py.File(f"{dummy_data_path}/{stem}.hdf5", "r") as f:
        raw = f["train"]["cube_poses"][0]  # (x, y, z, qw, qx, qy, qz)
    assert np.allclose(ds.cube_poses[0, :3], raw[:3])
    assert np.allclose(ds.cube_poses[0, 3:6], raw[4:7])  # qx qy qz
    assert np.allclose(ds.cube_poses[0, 6], raw[3])  # qw


def test_loader_batching_and_padding(dummy_data_path):
    cfg = CameraCubePoseDatasetConfig(dummy_data_path)
    ds = CameraCubePoseDataset(cfg, train=True)  # 10 examples
    loader = HostDataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["images"].shape == (4, 256, 256, 6)  # static shape incl. final batch
        assert b["cube_pose"].shape == (4, 7)
    assert batches[0]["mask"].sum() == 4
    assert batches[2]["mask"].sum() == 2  # 10 = 4 + 4 + 2 real examples


def test_loader_determinism_and_epoch_shuffle(dummy_data_path):
    cfg = CameraCubePoseDatasetConfig(dummy_data_path)
    ds = CameraCubePoseDataset(cfg, train=True)
    l1 = HostDataLoader(ds, batch_size=5, shuffle=True, seed=7)
    l2 = HostDataLoader(ds, batch_size=5, shuffle=True, seed=7)
    b1, b2 = next(iter(l1)), next(iter(l2))
    assert np.array_equal(b1["cube_pose"], b2["cube_pose"])
    l2.set_epoch(1)
    b3 = next(iter(l2))
    assert not np.array_equal(b1["cube_pose"], b3["cube_pose"])


def test_loader_host_sharding(dummy_data_path):
    """Two 'hosts' must partition the epoch with equal batch counts
    (DistributedSampler semantics, reference argus/train.py:154-166)."""
    cfg = CameraCubePoseDatasetConfig(dummy_data_path)
    ds = CameraCubePoseDataset(cfg, train=True)  # 10 examples
    shards = []
    for rank in (0, 1):
        loader = HostDataLoader(
            ds, batch_size=5, shuffle=True, seed=3, process_index=rank, process_count=2
        )
        batches = list(loader)
        assert len(batches) == 1
        shards.append(batches[0]["cube_pose"])
    # the two host shards are disjoint (10 examples split 5/5)
    flat0 = {tuple(np.round(p, 5)) for p in shards[0]}
    flat1 = {tuple(np.round(p, 5)) for p in shards[1]}
    assert not flat0 & flat1


def test_pose_encoded_synthetic_dataset(tmp_path):
    """pose_encoded mode: images are a deterministic function of the stored poses."""
    import h5py
    from pathlib import Path

    from argus_tpu.data.synthetic import write_synthetic_dataset

    d = str(tmp_path / "enc")
    write_synthetic_dataset(d, n_train=4, n_test=2, height=64, width=64, seed=3, pose_encoded=True)
    cfg = CameraCubePoseDatasetConfig(d, center_crop=(64, 64))
    ds = CameraCubePoseDataset(cfg, train=True)
    assert len(ds) == 4
    ex = ds[0]
    # the square renders structure, not noise: few unique colors
    assert len(np.unique(ex["images"][..., :3].reshape(-1, 3), axis=0)) < 10
    # determinism: same seed -> same bytes
    d2 = str(tmp_path / "enc2")
    write_synthetic_dataset(d2, n_train=4, n_test=2, height=64, width=64, seed=3, pose_encoded=True)
    ds2 = CameraCubePoseDataset(CameraCubePoseDatasetConfig(d2, center_crop=(64, 64)), train=True)
    assert np.array_equal(ds[0]["images"], ds2[0]["images"])
    assert np.allclose(ds.cube_poses, ds2.cube_poses)

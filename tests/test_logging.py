"""Metrics-logger and loader-determinism tests."""

import json

import numpy as np

from argus_tpu.logging_utils import MetricsLogger, generate_run_id


def test_run_id_format():
    rid = generate_run_id()
    assert len(rid) == 8 and rid.isalnum() and rid.islower() or rid.isdigit()


def test_jsonl_logging(tmp_path):
    logger = MetricsLogger("proj", run_id="testrun1", config={"lr": 0.1}, log_dir=str(tmp_path))
    logger.log({"loss": 1.5})
    logger.log({"loss": 1.0, "val_loss": 2.0}, step=10)
    logger.finish()
    lines = [json.loads(x) for x in open(tmp_path / "testrun1.jsonl")]
    assert lines[0]["_type"] == "run_start" and lines[0]["config"]["lr"] == 0.1
    assert lines[1]["loss"] == 1.5 and lines[1]["step"] == 0
    assert lines[2]["val_loss"] == 2.0 and lines[2]["step"] == 10


def test_disabled_logger_writes_nothing(tmp_path):
    logger = MetricsLogger("proj", enabled=False, log_dir=str(tmp_path))
    logger.log({"x": 1})
    logger.finish()
    assert list(tmp_path.iterdir()) == []


def test_loader_order_invariant_to_worker_count(dummy_data_path):
    """Batches must be identical regardless of decode parallelism (threading must
    not perturb example order)."""
    from argus_tpu.data import CameraCubePoseDataset, CameraCubePoseDatasetConfig, HostDataLoader

    ds = CameraCubePoseDataset(CameraCubePoseDatasetConfig(dummy_data_path), train=True)
    b1 = next(iter(HostDataLoader(ds, batch_size=8, shuffle=True, seed=5, num_workers=1)))
    b8 = next(iter(HostDataLoader(ds, batch_size=8, shuffle=True, seed=5, num_workers=8)))
    assert np.array_equal(b1["images"], b8["images"])
    assert np.array_equal(b1["cube_pose"], b8["cube_pose"])

"""Preemption-safe training: SIGTERM mid-run must checkpoint and exit cleanly,
and the checkpoint must be resumable (SURVEY §5 failure detection / elastic
recovery — an upgrade over the reference, which has none)."""

import os
import signal
import subprocess
import sys
import time

import pytest

from argus_tpu.preemption import PreemptionGuard


def test_guard_latches_sigterm_and_restores_handler():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.requested
        os.kill(os.getpid(), signal.SIGTERM)
        for _ in range(100):
            if guard.requested:
                break
            time.sleep(0.01)
        assert guard.requested
    assert signal.getsignal(signal.SIGTERM) == prev


_CHILD = r"""
import jax; jax.config.update('jax_platforms','cpu')
import sys
from argus_tpu.data.synthetic import write_synthetic_dataset
from argus_tpu.data import CameraCubePoseDatasetConfig
from argus_tpu.models import NCameraCNNConfig
from argus_tpu.train import TrainConfig, train

ds, save = sys.argv[1], sys.argv[2]
write_synthetic_dataset(ds, n_train=8, n_test=4, height=32, width=32, seed=0)
cfg = TrainConfig(
    dataset_config=CameraCubePoseDatasetConfig(dataset_path=ds),
    model_config=NCameraCNNConfig(backbone='resnet18', resnet_output_dim=16),
    batch_size=4, n_epochs=10000, save_epochs=1, val_epochs=10000,
    wandb_log=False, num_workers=0, save_dir=save,
)
print('CKPT:' + train(cfg), flush=True)
"""


@pytest.mark.slow
def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    from argus_tpu.checkpoint import load_checkpoint

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    save_dir = tmp_path / "ckpts"
    save_dir.mkdir()
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD, str(tmp_path / "ds"), str(save_dir)],
        env=env,
        cwd=repo_root,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    # wait until the first checkpoint exists (epoch 0 done), then preempt
    deadline = time.time() + 900
    while time.time() < deadline:
        if any(save_dir.glob("*.ckpt")):
            break
        if proc.poll() is not None:
            out, _ = proc.communicate()
            raise AssertionError(f"child exited early (rc={proc.returncode}):\n{out[-3000:]}")
        time.sleep(1.0)
    else:
        proc.kill()
        raise AssertionError("no checkpoint appeared within the deadline")
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)

    assert proc.returncode == 0, f"child did not exit cleanly (rc={proc.returncode}):\n{out[-3000:]}"
    assert "Preempt" in out, out[-2000:]
    ckpts = list(save_dir.glob("*.ckpt"))
    assert ckpts, out[-2000:]
    raw = load_checkpoint(str(ckpts[0]))
    assert int(raw["step"]) > 0  # progress was saved, resumable via resume_from

"""Multi-host data parallelism, actually exercised (VERDICT r1 #6): two real
OS processes form a jax.distributed cluster over localhost (4 virtual CPU devices
each -> one 8-device mesh), feed per-host batch shards through
`global_batch`'s `make_array_from_process_local_data` branch, and the train-step
loss must match the single-process 8-device run bit-for-bit-ish."""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from argus_tpu.parallel import global_batch, make_mesh, param_shardings


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_loss() -> float:
    from argus_tpu.models import NCameraCNNConfig
    from argus_tpu.train import TrainConfig, TrainState, create_train_state, make_train_step
    from tests._multihost_child import _make_global_batch

    cfg = TrainConfig(
        model_config=NCameraCNNConfig(n_cams=2, backbone="resnet18", resnet_output_dim=16),
        use_augmentation=False,
        wandb_log=False,
    )
    mesh = make_mesh(n_data=8, n_model=1)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32))
    state = jax.device_put(
        state,
        TrainState(
            step=param_shardings(state.step, mesh),
            params=param_shardings(state.params, mesh),
            batch_stats=param_shardings(state.batch_stats, mesh),
            opt_state=param_shardings(state.opt_state, mesh),
            lr=param_shardings(state.lr, mesh),
        ),
    )
    batch = global_batch(mesh, _make_global_batch())
    step = make_train_step(model, cfg, base_seed=0, mesh=mesh)
    _, loss = step(state, batch)
    return float(loss)


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    ref = _single_process_loss()

    port = _free_port()
    out = tmp_path / "loss.txt"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_NUM_PROCESSES", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    child = os.path.join(os.path.dirname(__file__), "_multihost_child.py")
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(pid), str(port), str(out)],
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            # two children compile the train step CONCURRENTLY on this 1-core
            # box (~5-8 min each when contended) — budget accordingly
            stdout, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
        assert p.returncode == 0, f"child failed (rc={p.returncode}):\n{stdout[-3000:]}"

    multi = float(out.read_text())
    # same global batch, same init, same step: losses agree up to f32 collective
    # reduction-order noise
    assert np.isclose(multi, ref, rtol=1e-5, atol=1e-6), (multi, ref, logs[0][-500:])

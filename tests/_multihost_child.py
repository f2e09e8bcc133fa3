"""Child process for the multi-host test (NOT collected by pytest).

Runs one process of a 2-process jax.distributed training step over a shared
8-device CPU mesh and (on process 0) writes the loss to a file. Usage:
    python tests/_multihost_child.py <process_id> <coordinator_port> <out_path>
Env (set by the parent test): JAX_PLATFORMS=cpu, PALLAS_AXON_POOL_IPS=,
XLA_FLAGS=--xla_force_host_platform_device_count=4.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
# share the suite's persistent compile cache (conftest sets this via jax.config,
# which subprocesses don't inherit)
jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402


def main() -> None:
    pid, port, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from argus_tpu.parallel import global_batch, init_distributed, make_mesh, param_shardings

    process_index, process_count = init_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert process_count == 2 and process_index == pid
    assert jax.local_device_count() == 4 and jax.device_count() == 8

    import jax.numpy as jnp

    from argus_tpu.models import NCameraCNNConfig
    from argus_tpu.train import TrainConfig, TrainState, create_train_state, make_train_step

    # Establish the Gloo collective context NOW, while both processes are still in
    # lockstep (right after distributed init). Gloo's context rendezvous has a
    # ~30 s deadline; if the first collective only happens after the minutes-long
    # contended train-step compile, startup/compile skew between the two children
    # blows that window (observed: GetKeyValue() DEADLINE_EXCEEDED). A trivial
    # cross-process reduction compiles in seconds and caches the communicator.
    warm_mesh = make_mesh(n_data=8, n_model=1)
    warm = global_batch(warm_mesh, {"x": np.ones((4, 4), np.float32)})
    assert float(jnp.sum(warm["x"])) == 32.0

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

    # global batch of 8; this host contributes rows [pid*4, pid*4+4) — the same
    # deterministic global content as the single-process reference run
    full = _make_global_batch()
    local = {k: v[pid * 4 : (pid + 1) * 4] for k, v in full.items()}
    batch = global_batch(mesh, local)
    assert batch["images"].shape[0] == 8  # global leading dim

    step = make_train_step(model, cfg, base_seed=0, mesh=mesh)
    _, loss = step(state, batch)
    loss = float(loss)
    if process_index == 0:
        with open(out_path, "w") as f:
            f.write(repr(loss))
    try:
        # the shutdown barrier can race when peers exit at different times; the
        # correctness signal (the loss) is already on disk
        jax.distributed.shutdown()
    except Exception as e:  # pragma: no cover
        print(f"proc {pid}: non-fatal shutdown race: {type(e).__name__}", flush=True)


def _make_global_batch() -> dict:
    rng = np.random.default_rng(7)
    return {
        "images": rng.integers(0, 256, (8, 32, 32, 6), dtype=np.uint8),
        "cube_pose": np.tile(np.array([0, 0, 0, 0, 0, 0, 1], np.float32), (8, 1)),
        "mask": np.ones((8,), np.float32),
    }


if __name__ == "__main__":
    main()

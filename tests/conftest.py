"""Shared test fixtures (mirrors the reference's tests/conftest.py:14-97).

Tests run on a virtual 8-device CPU mesh so multi-chip sharding is exercised without
TPU hardware (SURVEY.md §4 "Distributed testing").
"""

import os

# Must be set before jax is imported anywhere. Force (not setdefault): the harness
# pre-sets JAX_PLATFORMS=axon and a sitecustomize that registers the remote-TPU
# backend whenever PALLAS_AXON_POOL_IPS is set — which would silently run the whole
# suite on the real chip through a remote-compile tunnel (~0.5 s per XLA program).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ.setdefault("MUJOCO_GL", "egl")  # headless offscreen rendering
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# On this 1-core box the 8 virtual-device threads run their shards SERIALLY, so
# the first thread at an all-reduce legitimately waits ~7x the per-shard time;
# under load XLA's default CPU rendezvous terminate timeout SIGABRTs pytest
# mid-suite (observed in test_parallel under concurrent TPU benches). A slow
# join here is expected scheduling, not a deadlock — raise both knobs.
if "xla_cpu_collective_timeout_seconds" not in _flags:
    _flags += (
        " --xla_cpu_collective_timeout_seconds=1200"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = _flags

# The harness sitecustomize imports jax at interpreter start, so the env vars above
# can be too late — force the platform through the live config as well (backends
# have not initialized yet when conftest runs).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeated suite runs skip recompiling the train steps.
jax.config.update("jax_compilation_cache_dir", "/tmp/argus_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def dummy_data_path(tmp_path_factory) -> str:
    """A complete synthetic on-disk dataset: 15 PNG pairs + HDF5 with train/test groups.

    Schema matches the datagen writer exactly (reference: tests/conftest.py:14-56 vs
    argus/data_generation.py:245-264).
    """
    from argus_tpu.data.synthetic import write_synthetic_dataset

    dir_path = tmp_path_factory.mktemp("tmp")
    write_synthetic_dataset(str(dir_path), n_train=10, n_test=5, height=256, width=256, seed=0)
    return str(dir_path)


@pytest.fixture(scope="session")
def dummy_save_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("tmp") / "outputs/models"
    d.mkdir(parents=True, exist_ok=True)
    return str(d)


@pytest.fixture(scope="session")
def dummy_json_path(tmp_path_factory) -> str:
    """Fake MJPC sim-residuals JSON (reference: tests/conftest.py:59-76)."""
    import json

    dummy_file = tmp_path_factory.mktemp("tmp") / "dummy_sim_residuals.json"
    data = [
        {
            "dt": 0.01,
            "s": [float(i)] * 45,
            "a": [float(i)] * 16,
            "sp_pred": [float(i)] * 45,
            "sp_actual": [float(i)] * 45,
        }
        for i in range(10)
    ]
    # make the cube quaternion part valid (unit norm) so frame conversions round-trip
    for i, d_ in enumerate(data):
        s = np.array(d_["s"])
        s[3:7] = [1.0, 0.0, 0.0, 0.0]
        data[i]["s"] = s.tolist()
    with open(dummy_file, "w") as f:
        json.dump(data, f)
    return str(dummy_file)


@pytest.fixture(scope="session")
def dummy_center_crop() -> tuple:
    """De facto image size used in all tests (reference: tests/conftest.py:95-97)."""
    return 256, 256

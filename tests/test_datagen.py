"""Datagen tests: everything testable without a Unity executable — pose
randomization distributions, action packing, HDF5 writer round-trip (mirrors the
conversion checks of reference tests/test_data_generation.py:42-58)."""

import numpy as np
import pytest

from argus_tpu import datagen
from argus_tpu.geom import convert_pose_mjpc_to_unity, convert_pose_unity_to_mjpc


def test_generate_random_camera_poses_distribution():
    rng = np.random.default_rng(0)
    mu_trans = np.array([0.1, 0.2, 0.3])
    mu_quat = np.array([0.0, 0.0, 0.0, 1.0])
    poses = datagen.generate_random_camera_poses(
        500, mu_trans, mu_quat, bounds_trans=0.01, quat_stdev=0.05, rng=rng
    )
    assert poses.shape == (500, 7)
    # translations stay inside the uniform bounds
    assert np.all(np.abs(poses[:, :3] - mu_trans) <= 0.01 + 1e-9)
    # quaternions are unit
    assert np.allclose(np.linalg.norm(poses[:, 3:], axis=-1), 1.0)
    # small perturbations: mean rotation close to nominal
    angles = 2 * np.arccos(np.clip(np.abs(poses[:, 6]), -1, 1))
    assert np.percentile(angles, 95) < 0.5  # radians


def test_generate_random_light_source_poses():
    rng = np.random.default_rng(0)
    poses = datagen.generate_random_light_source_poses(200, rng=rng)
    assert poses.shape == (200, 7)
    assert np.all((poses[:, 1] >= 2.0) & (poses[:, 1] <= 3.0))  # unity y = height
    assert np.all(np.abs(poses[:, 0]) <= 0.254)
    assert np.allclose(np.linalg.norm(poses[:, 3:], axis=-1), 1.0)


def test_pack_actions_layout():
    rng = np.random.default_rng(0)
    n = 4
    cube = rng.random((n, 7))
    q = rng.random((n, 16))
    cam1 = rng.random((n, 7))
    cam2 = rng.random((n, 7))
    light = rng.random((n, 7))
    action = datagen.pack_actions(cube, q, cam1, cam2, light, (0.5, 1.0), rng)
    assert action.shape == (n, 50)
    assert np.allclose(action[:, 0:7], cam1)
    assert np.all((action[:, 7:10] >= 0.5) & (action[:, 7:10] <= 1.0))
    assert np.allclose(action[:, 10:17], cam2)
    assert np.allclose(action[:, 20:27], cube)
    assert np.allclose(action[:, 27:34], light)
    assert np.allclose(action[:, 34:50], q)


def test_load_mjpc_states(dummy_json_path):
    cube_poses, q_leap = datagen.load_mjpc_states(dummy_json_path)
    assert cube_poses.shape == (10, 7)
    assert q_leap.shape == (10, 16)


def test_hdf5_writer_roundtrip(tmp_path, dummy_json_path):
    """Poses written to HDF5 must round-trip the MJPC->Unity->MJPC conversion (the
    datagen stores what was actually rendered; reference
    tests/test_data_generation.py:42-58 checks the same invariant)."""
    import h5py

    cube_mjpc, q_leap = datagen.load_mjpc_states(dummy_json_path)
    unity = convert_pose_mjpc_to_unity(cube_mjpc)
    stored = convert_pose_unity_to_mjpc(unity)
    assert np.allclose(stored[:, :3], cube_mjpc[:, :3], atol=1e-12)

    rng = np.random.default_rng(0)
    out = tmp_path / "cube_data"
    out.mkdir()
    stems = datagen.write_dataset_hdf5(
        str(out), stored, q_leap, train_frac=0.8, rng=rng, crop_hw=(256, 256), render_hw=(376, 672)
    )
    assert len(stems) == 10
    with h5py.File(out / "cube_data.hdf5", "r") as f:
        assert f.attrs["n_cams"] == 2
        assert f.attrs["H"] == 256 and f.attrs["W"] == 256
        n_train = f["train"]["cube_poses"].shape[0]
        n_test = f["test"]["cube_poses"].shape[0]
        assert n_train == 8 and n_test == 2
        all_poses = np.concatenate([f["train"]["cube_poses"][()], f["test"]["cube_poses"][()]])
    # the union of split poses is the input set (shuffled)
    assert np.allclose(np.sort(all_poses, axis=0), np.sort(stored, axis=0))


def test_unity_setup_requires_exe(tmp_path):
    with pytest.raises((FileNotFoundError, ImportError)):
        datagen.unity_setup(str(tmp_path / "missing.x86_64"))


class _FakeUnityEnv:
    """Deterministic stand-in for the Unity render server: observation pixels are a
    function of the commanded cube pose, so the test can verify the action->render
    wiring (the real contract is docs/unity_contract.md)."""

    def __init__(self, n_agents, hw=(48, 64)):
        self.n_agents = n_agents
        self.hw = hw
        self._last_action = None

    def reset(self):
        pass

    def set_actions(self, behavior, action):
        self._last_action = np.asarray(action)

    def step(self):
        pass

    def get_steps(self, behavior):
        H, W = self.hw
        cube = self._last_action[:, 20:27]  # cube pose slice of the action
        shade = (np.abs(cube[:, 0]) % 1.0)[:, None, None, None]
        obs1 = np.broadcast_to(shade, (self.n_agents, 3, H, W)).astype(np.float32)
        obs2 = 1.0 - obs1

        class Steps:
            obs = [obs1, obs2]

        return Steps(), None

    def close(self):
        pass


def test_generate_data_full_loop(tmp_path, dummy_json_path, monkeypatch):
    """Full generate_data run against the fake renderer: HDF5 schema + PNG files +
    pose round-trip (the reference's Unity e2e test, tests/test_data_generation.py,
    auto-skips without an executable; this covers the same loop hermetically)."""
    import h5py
    from PIL import Image

    fake_exe = tmp_path / "fake_env.x86_64"
    fake_exe.write_bytes(b"")

    envs = {}

    def fake_unity_setup(path, n_agents=1, time_scale=20.0):
        envs["env"] = _FakeUnityEnv(n_agents)
        return envs["env"], "CubeBehavior", datagen.ACTION_SIZE

    monkeypatch.setattr(datagen, "unity_setup", fake_unity_setup)
    monkeypatch.setattr(datagen, "_make_action_tuple", lambda c: c)

    out = tmp_path / "generated"
    cfg = datagen.GenerateDataConfig(
        env_exe_path=str(fake_exe),
        mjpc_data_path=dummy_json_path,
        output_data_path=str(out),
        n_agents=2,
        center_crop=(32, 32),
        train_frac=0.8,
        seed=0,
    )
    datagen.generate_data(cfg)

    with h5py.File(out / "generated.hdf5", "r") as f:
        assert f.attrs["n_cams"] == 2
        assert f.attrs["H"] == 32 and f.attrs["W"] == 32
        n_train = f["train"]["cube_poses"].shape[0]
        n_test = f["test"]["cube_poses"].shape[0]
        assert n_train + n_test == 10
        stems = [s.decode() for s in f["train"]["img_stems"][()]]
        poses = f["train"]["cube_poses"][()]

    # every indexed image exists, cropped, and each agent's render differs
    for stem in stems:
        for sfx in ("a", "b"):
            img = Image.open(out / f"{stem}_{sfx}.png")
            assert img.size == (32, 32)
    # stored poses round-trip the MJPC->Unity->MJPC conversion of the source states
    src, _ = datagen.load_mjpc_states(dummy_json_path)
    roundtrip = convert_pose_unity_to_mjpc(convert_pose_mjpc_to_unity(src))
    all_stored = np.sort(poses, axis=0)
    assert np.allclose(
        all_stored, np.sort(roundtrip[[int(s.split("img")[-1]) for s in stems]], axis=0), atol=1e-6
    )

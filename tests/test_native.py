"""Native C++ loader tests: build, decode correctness vs PIL, crop, threading, and
dataset integration."""

import numpy as np
import pytest
from PIL import Image

from argus_tpu import native


@pytest.fixture(scope="module")
def png_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    arrays = []
    for i in range(6):
        arr = (rng.random((64, 80, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"im{i}.png")
        arrays.append(arr)
    return d, arrays


def test_native_builds():
    if not native.available():
        pytest.skip("native toolchain/libpng unavailable")


def test_png_size(png_dir):
    if not native.available():
        pytest.skip("native loader unavailable")
    d, _ = png_dir
    assert native.png_size(str(d / "im0.png")) == (64, 80)


def test_decode_matches_pil(png_dir):
    if not native.available():
        pytest.skip("native loader unavailable")
    d, arrays = png_dir
    paths = [str(d / f"im{i}.png") for i in range(6)]
    out = native.decode_batch(paths, (64, 80), n_threads=4)
    assert out.shape == (6, 64, 80, 3)
    for i in range(6):
        assert np.array_equal(out[i], arrays[i]), f"image {i} decode mismatch"


def test_decode_center_crop(png_dir):
    if not native.available():
        pytest.skip("native loader unavailable")
    d, arrays = png_dir
    out = native.decode_batch([str(d / "im0.png")], (32, 40), n_threads=1)
    top, left = (64 - 32) // 2, (80 - 40) // 2
    assert np.array_equal(out[0], arrays[0][top : top + 32, left : left + 40])


def test_decode_missing_file_raises(png_dir):
    if not native.available():
        pytest.skip("native loader unavailable")
    d, _ = png_dir
    with pytest.raises(IOError):
        native.decode_batch([str(d / "nope.png")], (32, 32))


def test_dataset_batch_path_matches_per_image(dummy_data_path):
    """load_images_batch (native or fallback) must agree with per-image decode."""
    from argus_tpu.data import CameraCubePoseDataset, CameraCubePoseDatasetConfig

    cfg = CameraCubePoseDatasetConfig(dummy_data_path, center_crop=(128, 128))
    ds = CameraCubePoseDataset(cfg, train=True)
    batch = ds.load_images_batch([0, 3, 7], n_threads=2)
    assert batch.shape == (3, 128, 128, 6)
    for j, i in enumerate([0, 3, 7]):
        assert np.array_equal(batch[j], ds.load_images(i))

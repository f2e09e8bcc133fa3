"""CLI config-system tests: the tyro-equivalent surface (dotted nested flags,
bool pairs, tuples, required fields)."""

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import pytest

from argus_tpu.configs import cli


@dataclass
class Inner:
    path: Optional[str] = None
    crop: Tuple[int, int] = (256, 256)


@dataclass
class Outer:
    inner: Inner = field(default_factory=Inner)
    lr: float = 1e-4
    n: int = 5
    name: str = "x"
    flag: bool = False


def test_defaults():
    cfg = cli(Outer, args=[])
    assert cfg.lr == 1e-4 and cfg.n == 5 and cfg.flag is False
    assert cfg.inner.crop == (256, 256)


def test_overrides():
    cfg = cli(
        Outer,
        args=[
            "--lr", "0.01",
            "--n", "7",
            "--name", "abc",
            "--flag",
            "--inner.path", "/tmp/x",
            "--inner.crop", "128", "96",
        ],
    )
    assert cfg.lr == 0.01 and cfg.n == 7 and cfg.name == "abc" and cfg.flag is True
    assert cfg.inner.path == "/tmp/x"
    assert cfg.inner.crop == (128, 96)


def test_no_flag():
    @dataclass
    class C:
        amp: bool = True

    assert cli(C, args=["--no-amp"]).amp is False
    assert cli(C, args=["--amp"]).amp is True


def test_required_field():
    @dataclass
    class C:
        must: str

    assert cli(C, args=["--must", "v"]).must == "v"
    with pytest.raises(SystemExit):
        cli(C, args=[])


def test_kebab_case():
    @dataclass
    class C:
        long_field_name: int = 1

    assert cli(C, args=["--long-field-name", "9"]).long_field_name == 9


def test_optional_none():
    @dataclass
    class C:
        p: Optional[str] = "default"

    assert cli(C, args=["--p", "none"]).p is None


def test_train_config_surface(dummy_data_path):
    """The reference's public CLI examples must parse (README.md per SURVEY.md §5)."""
    from argus_tpu.train import TrainConfig

    cfg = cli(
        TrainConfig,
        args=[
            "--dataset-config.dataset-path", dummy_data_path,
            "--batch-size", "16",
            "--multigpu",
            "--amp",
            "--no-wandb-log",
            "--augmentation-config.num-spaghetti", "3",
        ],
    )
    assert cfg.batch_size == 16
    assert cfg.multigpu and cfg.amp and not cfg.wandb_log
    assert cfg.augmentation_config.num_spaghetti == 3
    assert cfg.dataset_config.dataset_path == dummy_data_path

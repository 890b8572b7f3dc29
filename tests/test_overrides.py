"""Dotted-path config overrides (configs/overrides.py)."""

import pytest

from ppn_tpu.configs import get_config
from ppn_tpu.configs.overrides import apply_overrides


def test_scalar_overrides():
    cfg = get_config("mpii_r18_384")
    out = apply_overrides(cfg, ["data.rotate_deg=20",
                                "train.learning_rate=0.02",
                                "model.nms_thresh=0.45",
                                "train.num_steps=123",
                                "data.augment=false"])
    assert out.data.rotate_deg == 20.0
    assert out.train.learning_rate == 0.02
    assert out.model.nms_thresh == 0.45
    assert out.train.num_steps == 123
    assert out.data.augment is False
    # original untouched (frozen tree)
    assert cfg.data.rotate_deg != 20.0 or cfg is not out


def test_tuple_override_and_validation():
    cfg = get_config("mpii_r18_384")
    out = apply_overrides(cfg, ["model.local_grid_size=(11, 11)"])
    assert out.model.local_grid_size == (11, 11)
    # __post_init__ still validates the rebuilt node
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["model.local_grid_size=(8, 8)"])  # must be odd


def test_unknown_path_raises():
    cfg = get_config("mpii_r18_384")
    with pytest.raises(ValueError, match="unknown field"):
        apply_overrides(cfg, ["data.nonexistent=1"])
    with pytest.raises(ValueError, match="key=value"):
        apply_overrides(cfg, ["data.rotate_deg"])


def test_train_cli_accepts_set(tmp_path):
    from ppn_tpu.apps import train as train_app

    train_app.main([
        "--config", "tiny_test", "--overfit", "2", "--steps", "1",
        "--ckpt-dir", str(tmp_path / "ck"), "--no-resume",
        "--set", "data.rotate_deg=5", "--set", "train.warmup_steps=0",
    ])

"""config.ini compatibility loader tests."""

import textwrap

import pytest

from ppn_tpu.configs.ini_compat import load_ini


@pytest.fixture
def ini_path(tmp_path):
    p = tmp_path / "config.ini"
    p.write_text(textwrap.dedent("""
        [model]
        insize = 320,320
        outsize = 10
        local_grid_size = 7,7
        parts_scale = 0.25
        lambda_coor = 4.0
        detection_thresh = 0.2
        thresh = 0.35
        min_num_keypoints = 3

        [training]
        batchsize = 16
        learning_rate = 0.01
        momentum = 0.95
        seed = 7

        [dataset]
        train_root = /data/mpii
        rotate = 30
        some_unknown_key = whatever
    """))
    return str(p)


def test_load_ini(ini_path, capsys):
    cfg = load_ini(ini_path)
    m, t, d = cfg.model, cfg.train, cfg.data
    assert m.insize == (320, 320)
    assert m.outsize == (10, 10)
    assert m.local_grid_size == (7, 7)
    assert m.parts_scale == 0.25
    assert m.lambda_coor == 4.0
    assert m.detection_thresh == 0.2
    assert m.nms_thresh == 0.35
    assert m.min_num_keypoints == 3
    assert t.batch_size == 16
    assert t.learning_rate == 0.01
    assert t.momentum == 0.95
    assert t.seed == 7
    assert d.root == "/data/mpii"
    assert d.rotate_deg == 30.0
    # untouched knobs keep base defaults
    assert m.keypoint_names[0] == "instance"
    assert cfg.train.weight_decay == 5e-4
    # unknown keys are reported, not swallowed
    assert "some_unknown_key" in capsys.readouterr().out


def test_load_ini_coco_base(ini_path):
    cfg = load_ini(ini_path, base="coco_r18_384")
    assert cfg.model.num_keypoints == 17
    assert cfg.model.insize == (320, 320)


def test_strict_mode_raises_on_unknown_keys(tmp_path):
    import pytest

    from ppn_tpu.configs.ini_compat import load_ini

    ini = tmp_path / "bad.ini"
    ini.write_text("[model]\ninsize = 384\ndetection_tresh = 0.2\n")
    with pytest.raises(KeyError, match="detection_tresh"):
        load_ini(str(ini), strict=True)
    # non-strict still loads (reported, not fatal)
    cfg = load_ini(str(ini))
    assert cfg.model.insize == (384, 384)


def test_insize_only_derives_matching_grid(tmp_path):
    """A reference INI that sets only insize implies the stride-32 grid
    (the reference's outsize IS the backbone output); indivisible sizes
    must be rejected, not silently mis-gridded."""
    import pytest

    from ppn_tpu.configs.ini_compat import load_ini

    p = tmp_path / "c.ini"
    p.write_text("[model_param]\ninsize = 224x224\n")
    cfg = load_ini(str(p), base="tiny_test")
    assert cfg.model.outsize == (7, 7)
    assert all(isinstance(v, int) for v in cfg.model.outsize)

    p.write_text("[model_param]\ninsize = 100x100\n")
    with pytest.raises(ValueError):
        load_ini(str(p), base="tiny_test")


def test_resolve_config_shared_cli_resolution(tmp_path):
    """resolve_config (the every-CLI `--config [--ini]` path) returns the
    registry config untouched without an INI and overlays one when given."""
    from ppn_tpu.configs import get_config, resolve_config

    assert resolve_config("tiny_test") == get_config("tiny_test")
    p = tmp_path / "c.ini"
    p.write_text("[train]\nlearning_rate = 0.125\n")
    cfg = resolve_config("tiny_test", str(p))
    assert cfg.train.learning_rate == 0.125

"""Evaluation CLI regression tests (SURVEY.md §3.4 eval path as an app)."""

import json


def test_evaluate_cli_synthetic(tmp_path, capsys):
    """train 2 steps → evaluate the checkpoint via the CLI. Regression for
    the synthetic path crashing on a missing train_size attribute."""
    from ppn_tpu.apps import evaluate as eval_app
    from ppn_tpu.apps import train as train_app

    ckpt = tmp_path / "ckpt"
    train_app.main([
        "--config", "tiny_test", "--overfit", "2", "--steps", "2",
        "--ckpt-dir", str(ckpt), "--no-resume",
    ])
    capsys.readouterr()
    eval_app.main([
        "--config", "tiny_test", "--ckpt-dir", str(ckpt),
        "--data", "synthetic", "--max-images", "4", "--batch-size", "2",
    ])
    out = capsys.readouterr().out
    summary = json.loads(out[out.index("{"):])
    assert "pckh/mean" in summary
    assert 0.0 <= summary["pckh/mean"] <= 1.0

    # threshold overrides parse and run (the reference's config.ini knobs)
    eval_app.main([
        "--config", "tiny_test", "--ckpt-dir", str(ckpt),
        "--data", "synthetic", "--max-images", "2", "--batch-size", "2",
        "--detection-thresh", "0.05", "--nms-thresh", "0.45", "--flip-tta",
    ])
    out = capsys.readouterr().out
    summary = json.loads(out[out.index("{"):])
    assert "pckh/mean" in summary


def test_evaluate_cli_oks_metric(tmp_path, capsys):
    """--metric oks runs the COCO-style OKS AP path end-to-end."""
    from ppn_tpu.apps import evaluate as eval_app
    from ppn_tpu.apps import train as train_app

    ckpt = tmp_path / "ckpt"
    train_app.main([
        "--config", "tiny_test", "--overfit", "2", "--steps", "2",
        "--ckpt-dir", str(ckpt), "--no-resume",
    ])
    capsys.readouterr()
    eval_app.main([
        "--config", "tiny_test", "--ckpt-dir", str(ckpt),
        "--data", "synthetic", "--max-images", "4", "--batch-size", "2",
        "--metric", "oks",
    ])
    out = capsys.readouterr().out
    summary = json.loads(out[out.index("{"):])
    assert "oks/AP" in summary
    assert 0.0 <= summary["oks/AP"] <= 1.0

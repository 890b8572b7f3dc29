"""End-to-end train/evaluate CLI runs on real-data-shaped fixture files.

The synthetic path is covered elsewhere; these tests exercise the MPII and
COCO *file* pipelines (annotation parsing → image load/resize → training →
checkpoint → evaluation) exactly as a user with real data would run them
(SURVEY.md §3.1/§3.4; VERDICT r1 missing #10 — no real datasets exist in
this environment, so fixture files stand in for them).
"""

import json

import numpy as np
import pytest
from PIL import Image

from ppn_tpu.configs import get_config


@pytest.fixture
def mpii_root(tmp_path):
    root = tmp_path / "mpii"
    (root / "images").mkdir(parents=True)
    (root / "annot").mkdir()
    rng = np.random.default_rng(3)
    records = []
    for i in range(4):
        name = f"img_{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)).save(
                root / "images" / name)
        records.append({
            "image": name,
            "joints": rng.uniform([5, 5], [155, 115], size=(16, 2)).tolist(),
            "joints_vis": [1] * 16,
            "center": [80, 60],
            "scale": 0.6,
            "headbox": [60, 10, 100, 40],
        })
    with open(root / "annot" / "train.json", "w") as f:
        json.dump(records, f)
    with open(root / "annot" / "valid.json", "w") as f:
        json.dump(records[:2], f)
    return str(root)


@pytest.fixture
def coco_root(tmp_path):
    root = tmp_path / "coco"
    (root / "train2017").mkdir(parents=True)
    (root / "val2017").mkdir()
    (root / "annotations").mkdir()
    rng = np.random.default_rng(4)
    images, anns = [], []
    for i in range(4):
        name = f"c_{i}.jpg"
        img = Image.fromarray(
            rng.integers(0, 255, (120, 160, 3), dtype=np.uint8))
        img.save(root / "train2017" / name)
        img.save(root / "val2017" / name)
        images.append({"id": i, "file_name": name,
                       "width": 160, "height": 120})
        kps = []
        for _ in range(17):
            kps += [float(rng.uniform(5, 155)), float(rng.uniform(5, 115)),
                    2]
        anns.append({"id": 100 + i, "image_id": i, "category_id": 1,
                     "iscrowd": 0, "num_keypoints": 17, "keypoints": kps,
                     "bbox": [10.0, 10.0, 120.0, 90.0], "area": 10800.0})
    blob = {"images": images, "annotations": anns,
            "categories": [{"id": 1, "name": "person"}]}
    for split in ("train2017", "val2017"):
        with open(root / "annotations"
                  / f"person_keypoints_{split}.json", "w") as f:
            json.dump(blob, f)
    return str(root)


def test_train_and_evaluate_cli_on_mpii_files(mpii_root, tmp_path, capsys):
    from ppn_tpu.apps import evaluate as eval_app
    from ppn_tpu.apps import train as train_app

    ck = str(tmp_path / "ck")
    train_app.main([
        "--config", "tiny_test", "--data", "mpii", "--data-root", mpii_root,
        "--steps", "2", "--batch-size", "2", "--ckpt-dir", ck,
        "--no-resume",
    ])
    capsys.readouterr()
    eval_app.main([
        "--config", "tiny_test", "--data", "mpii", "--data-root", mpii_root,
        "--ckpt-dir", ck, "--max-images", "2", "--batch-size", "2",
    ])
    out = capsys.readouterr().out
    summary = json.loads(out[out.index("{"):])
    assert "pckh/mean" in summary


def test_train_and_evaluate_cli_on_coco_files(coco_root, tmp_path, capsys):
    from ppn_tpu.apps import evaluate as eval_app
    from ppn_tpu.apps import train as train_app

    small = ["--set", "model.insize=(64, 64)",
             "--set", "model.outsize=(2, 2)",
             "--set", "model.local_grid_size=(3, 3)",
             "--set", "model.max_instances=4",
             "--set", "train.warmup_steps=2"]
    ck = str(tmp_path / "ck")
    train_app.main([
        "--config", "coco_r18_384", "--data", "coco",
        "--data-root", coco_root, "--steps", "2", "--batch-size", "2",
        "--ckpt-dir", ck, "--no-resume", *small,
    ])
    capsys.readouterr()
    eval_app.main([
        "--config", "coco_r18_384", "--data", "coco",
        "--data-root", coco_root, "--ckpt-dir", ck,
        "--max-images", "2", "--batch-size", "2", "--metric", "oks", *small,
    ])
    out = capsys.readouterr().out
    summary = json.loads(out[out.index("{"):])
    assert "oks/AP" in summary

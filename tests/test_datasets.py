"""MPII/COCO parser tests against generated fixture annotation files."""

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
    rng = np.random.default_rng(0)
    records = []
    for i in range(3):
        name = f"img_{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)).save(
                root / "images" / name)
        for person in range(1 + i % 2):
            joints = rng.uniform([10, 10], [310, 230],
                                 size=(16, 2)).tolist()
            records.append({
                "image": name,
                "joints": joints,
                "joints_vis": [1] * 14 + [0, 1],
                "center": [160, 120],
                "scale": 1.2,
                "headbox": [100, 20, 140, 60],
            })
    with open(root / "annot" / "train.json", "w") as f:
        json.dump(records, f)
    with open(root / "annot" / "valid.json", "w") as f:
        json.dump(records[:2], f)
    return str(root)


def test_mpii_dataset(mpii_root):
    from ppn_tpu.data.mpii import make_mpii_datasets

    cfg = get_config("mpii_r18_384")
    train, val = make_mpii_datasets(cfg, mpii_root)
    assert len(train) == 3 and len(val) == 2
    s = train[1]
    m = cfg.model
    assert s["image"].shape == (*m.insize, 3)
    assert s["keypoints"].shape == (cfg.data.max_persons, m.num_keypoints, 2)
    assert s["valid"].sum() == 2  # img_1 has 2 persons
    # keypoints scaled into the input frame
    kp = s["keypoints"][s["valid"]]
    vis = s["visible"][s["valid"]]
    assert np.all(kp[vis] >= 0) and np.all(kp[vis][:, 0] < m.insize[1])
    # headsize from the provided headbox, scaled
    hs = s["headsizes"][s["valid"]]
    assert np.all(hs > 0)
    # joint remapping: r_ankle (MPII idx 0) lands at class r_ankle
    cls = m.keypoint_names.index("r_ankle") - 1
    assert np.isfinite(s["keypoints"][0, cls]).all()


def test_mpii_center_scale_instance_box(mpii_root):
    """center/scale (MPII: square of side 200·scale around center) defines
    the instance box; it must differ from the keypoint-extent heuristic."""
    from ppn_tpu.data.mpii import MPIIDataset, make_mpii_datasets

    cfg = get_config("mpii_r18_384")
    train, _ = make_mpii_datasets(cfg, mpii_root)
    s = train[0]  # fixture: center=[160,120], scale=1.2, image 320×240
    sx, sy = 384 / 320, 384 / 240
    np.testing.assert_allclose(
        s["bboxes"][0], [160 * sx, 120 * sy, 240 * sx, 240 * sy], rtol=1e-5)
    # extent heuristic gives a different box for the same record
    ext = MPIIDataset._instance_box(
        {}, s["keypoints"][0], s["visible"][0], sx, sy)
    assert not np.allclose(s["bboxes"][0], ext)


def test_mpii_center_scale_sentinel_falls_back(mpii_root, tmp_path):
    """center=[-1,-1] / scale=0 records use the extent heuristic."""
    import json as _json

    from ppn_tpu.data.mpii import MPIIDataset

    cfg = get_config("mpii_r18_384")
    with open(f"{mpii_root}/annot/train.json") as f:
        recs = _json.load(f)
    recs[0]["center"] = [-1, -1]
    recs[0]["scale"] = 0
    ann = tmp_path / "sentinel.json"
    with open(ann, "w") as f:
        _json.dump(recs[:1], f)
    ds = MPIIDataset(cfg, mpii_root, str(ann))
    s = ds[0]
    kp, vis = s["keypoints"][0], s["visible"][0]
    vpts = kp[vis]
    cx, cy = (vpts.min(0) + vpts.max(0)) / 2
    np.testing.assert_allclose(s["bboxes"][0, :2], [cx, cy], rtol=1e-4)


def test_mpii_overfit_mode(mpii_root):
    from ppn_tpu.data.mpii import make_mpii_datasets

    cfg = get_config("mpii_r18_384")
    train, val = make_mpii_datasets(cfg, mpii_root, overfit=2)
    assert len(train) == 2 and val is train


def test_mpii_missing_annotations(tmp_path):
    from ppn_tpu.data.mpii import make_mpii_datasets

    cfg = get_config("mpii_r18_384")
    with pytest.raises(FileNotFoundError, match="MPII annotation"):
        make_mpii_datasets(cfg, str(tmp_path))


@pytest.fixture
def coco_root(tmp_path):
    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "train2017").mkdir()
    (root / "val2017").mkdir()
    rng = np.random.default_rng(0)
    images, anns = [], []
    aid = 1
    for i in range(2):
        name = f"{i:012d}.jpg"
        for d in ("train2017", "val2017"):
            Image.fromarray(
                rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)).save(
                    root / d / name)
        images.append({"id": i, "file_name": name, "width": 300,
                       "height": 200})
        for p in range(2):
            kps = []
            for k in range(17):
                kps += [float(rng.uniform(5, 295)),
                        float(rng.uniform(5, 195)), 2]
            anns.append({"id": aid, "image_id": i, "category_id": 1,
                         "keypoints": kps, "num_keypoints": 17,
                         "bbox": [20, 20, 100, 150], "area": 15000,
                         "iscrowd": 0})
            aid += 1
    blob = {"images": images, "annotations": anns,
            "categories": [{"id": 1, "name": "person"}]}
    for split in ("train2017", "val2017"):
        with open(root / "annotations" /
                  f"person_keypoints_{split}.json", "w") as f:
            json.dump(blob, f)
    return str(root)


def test_coco_dataset(coco_root):
    from ppn_tpu.data.coco import make_coco_datasets

    cfg = get_config("coco_r18_384")
    train, val = make_coco_datasets(cfg, coco_root)
    assert len(train) == 2 and len(val) == 2
    s = train[0]
    m = cfg.model
    assert s["image"].shape == (*m.insize, 3)
    assert s["valid"].sum() == 2
    assert s["keypoints"].shape[1] == 17
    assert np.all(s["headsizes"][s["valid"]] > 0)
    assert np.all(s["areas"][s["valid"]] > 0)


def test_coco_end_to_end_encode(coco_root):
    """COCO sample flows through encode with the coco config (K=17, L=17)."""
    from ppn_tpu.data.coco import make_coco_datasets
    from ppn_tpu.ops import encode as enc

    cfg = get_config("coco_r18_384")
    train, _ = make_coco_datasets(cfg, coco_root)
    s = train[0]
    t = enc.encode_single(cfg.model, s["keypoints"], s["visible"],
                          s["bboxes"], s["valid"])
    assert np.asarray(t.delta).sum() > 0
    assert t.te.shape[2] == cfg.model.num_limbs


def test_mpii_headsize_fallback_uses_keypoint_extent(tmp_path):
    """A record with center/scale but no headbox must get its PCKh
    threshold from the tight keypoint extent, not the 200*scale instance
    box (regression: the box-based fallback loosened PCKh ~45% for
    exactly the persons lacking head annotations)."""
    import json as _json

    from PIL import Image as _Image

    from ppn_tpu.data.mpii import MPIIDataset

    root = tmp_path / "mpii2"
    (root / "images").mkdir(parents=True)
    (root / "annot").mkdir()
    _Image.fromarray(np.zeros((240, 320, 3), np.uint8)).save(
        root / "images" / "a.jpg")
    joints = [[100 + 5 * i, 100 + 3 * i] for i in range(16)]
    # upper_neck (8) unannotated -> no head-segment headsize either
    jv = [1] * 16
    jv[8] = 0
    rec = {"image": "a.jpg", "joints": joints, "joints_vis": jv,
           "center": [160, 120], "scale": 1.5}
    with open(root / "annot" / "train.json", "w") as f:
        _json.dump([rec], f)

    cfg = get_config("mpii_r18_384")
    ds = MPIIDataset(cfg, str(root), "annot/train.json")
    s = ds[0]
    hs = float(s["headsizes"][0])
    box_diag_based = 0.2 * float(np.hypot(*s["bboxes"][0, 2:4]))
    kp = s["keypoints"][0][s["visible"][0]]
    ext_based = 0.2 * float(np.hypot(
        max(kp[:, 0].max() - kp[:, 0].min(), 8.0) * 1.15,
        max(kp[:, 1].max() - kp[:, 1].min(), 8.0) * 1.15))
    assert abs(hs - ext_based) < 1e-3
    assert hs < box_diag_based * 0.8  # clearly tighter than the box diag

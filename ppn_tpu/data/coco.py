"""COCO keypoints dataset (ref:coco_dataset.py†, SURVEY.md §2.1) — pure-JSON
parser (this environment has no pycocotools; the official
``person_keypoints_*.json`` format is plain JSON anyway).

COCO keypoint order matches configs.COCO_KEYPOINT_NAMES[1:] one-to-one, so
no joint remapping is needed — only grouping annotations by image, resizing
to the network input frame, and padding to the static max-persons contract.
COCO has no head boxes; the PCKh-style ``headsizes`` fallback is
0.6 · nose↔ear span (OKS-based COCO eval uses instance area instead — see
eval/coco_eval.py for the native COCO metric).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from ppn_tpu.configs.base import Config


class COCOKeypointsDataset:
    def __init__(self, cfg: Config, root: str, annotations: str,
                 image_dir: str, indices: Optional[List[int]] = None,
                 min_keypoints: int = 1, native_jpeg: bool = True):
        self.cfg = cfg
        self.image_dir = os.path.join(root, image_dir)
        self.native_jpeg = native_jpeg  # C++ JPEG path (see data/imageio.py)

        with open(annotations if os.path.isabs(annotations)
                  else os.path.join(root, annotations)) as f:
            data = json.load(f)
        images = {im["id"]: im for im in data["images"]}
        by_image: Dict[int, List[dict]] = {}
        for ann in data["annotations"]:
            if ann.get("iscrowd"):
                continue
            if ann.get("num_keypoints", 0) < min_keypoints:
                continue
            by_image.setdefault(ann["image_id"], []).append(ann)
        self.ids = sorted(by_image)
        self.by_image = by_image
        self.images = images
        if indices is not None:
            self.ids = [self.ids[i] for i in indices]

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        from ppn_tpu.data.imageio import load_resized

        cfg = self.cfg
        img_id = self.ids[idx]
        info = self.images[img_id]
        anns = self.by_image[img_id][: cfg.data.max_persons]

        Ht, Wt = cfg.model.insize
        img, W0, H0 = load_resized(
            os.path.join(self.image_dir, info["file_name"]), (Ht, Wt),
            native_jpeg=self.native_jpeg)
        sx, sy = Wt / W0, Ht / H0

        P = cfg.data.max_persons
        K = cfg.model.num_keypoints
        keypoints = np.zeros((P, K, 2), np.float32)
        visible = np.zeros((P, K), bool)
        bboxes = np.zeros((P, 4), np.float32)
        valid = np.zeros((P,), bool)
        headsizes = np.zeros((P,), np.float32)
        areas = np.zeros((P,), np.float32)

        for p, ann in enumerate(anns):
            kp = np.asarray(ann["keypoints"], np.float32).reshape(K, 3)
            xy = kp[:, :2] * np.asarray([sx, sy], np.float32)
            vis = kp[:, 2] > 0
            if not vis.any():
                continue
            bx, by, bw, bh = ann["bbox"]
            keypoints[p] = xy
            visible[p] = vis
            bboxes[p] = ((bx + bw / 2) * sx, (by + bh / 2) * sy,
                         bw * sx, bh * sy)
            valid[p] = True
            areas[p] = ann.get("area", bw * bh) * sx * sy
            # nose(0) ↔ ears(3,4) span as a PCKh-style proxy
            nose, lear, rear = xy[0], xy[3], xy[4]
            span = max(float(np.hypot(*(nose - lear))),
                       float(np.hypot(*(nose - rear))))
            headsizes[p] = 0.6 * span if span > 0 else 0.1 * np.hypot(
                bw * sx, bh * sy)

        return {
            "image": img,  # float32 [0,1] from load_resized
            "keypoints": keypoints,
            "visible": visible,
            "bboxes": bboxes,
            "valid": valid,
            "headsizes": headsizes,
            "areas": areas,
        }


def make_coco_datasets(cfg: Config, root: str,
                       overfit: Optional[int] = None):
    pairs = [
        ("annotations/person_keypoints_train2017.json", "train2017",
         "annotations/person_keypoints_val2017.json", "val2017"),
        ("annotations/person_keypoints_train2014.json", "train2014",
         "annotations/person_keypoints_val2014.json", "val2014"),
    ]
    for at, dt, av, dv in pairs:
        if os.path.exists(os.path.join(root, at)):
            train = COCOKeypointsDataset(
                cfg, root, at, dt,
                indices=list(range(overfit)) if overfit else None)
            if overfit:
                return train, train
            val = (COCOKeypointsDataset(cfg, root, av, dv)
                   if os.path.exists(os.path.join(root, av)) else None)
            return train, val
    raise FileNotFoundError(
        f"no COCO person_keypoints annotations under {root}")

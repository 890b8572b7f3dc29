"""Synthetic generator invariants (data/synthetic.py).

The annotation model must be subtree-consistent: tree-walk parsing
(ops/parse.py) can only assemble a joint whose every ancestor up to the
root is annotated, so an annotated joint under an unannotated ancestor
would be structurally unscoreable — a benchmark artifact, not a model
failure (real MPII annotates occluded joints with coordinates).
"""

import numpy as np

from ppn_tpu.configs import get_config


def _parents(cfg):
    return {d: s for s, d in cfg.edges}


def test_no_visible_joint_under_invisible_ancestor():
    from ppn_tpu.data.synthetic import random_people

    for config in ("mpii_r18_384", "coco_r18_384"):
        cfg = get_config(config).model
        parent = _parents(cfg)
        rng = np.random.default_rng(7)
        for _ in range(50):
            s = random_people(rng, cfg, max_persons=3)
            for p in range(3):
                if not s["valid"][p]:
                    continue
                vis = s["visible"][p]
                for cls in range(1, cfg.num_classes):
                    if not vis[cls - 1]:
                        continue
                    a = parent[cls]
                    while a != 0:
                        assert vis[a - 1], (
                            f"{config}: joint {cls} annotated but ancestor "
                            f"{a} is not")
                        a = parent[a]


def test_root_child_always_annotated():
    from ppn_tpu.data.synthetic import random_people

    cfg = get_config("mpii_r18_384").model
    root = next(d for s, d in cfg.edges if s == 0)
    rng = np.random.default_rng(11)
    for _ in range(20):
        s = random_people(rng, cfg, max_persons=2)
        for p in range(2):
            if s["valid"][p]:
                assert s["visible"][p][root - 1]


def test_annotation_dropout_still_occurs():
    """The generator must still exercise the masked-loss / partial-person
    paths: some joints unannotated across a modest sample."""
    from ppn_tpu.data.synthetic import random_people

    cfg = get_config("mpii_r18_384").model
    rng = np.random.default_rng(13)
    vis, tot = 0, 0
    for _ in range(30):
        s = random_people(rng, cfg, max_persons=2)
        vis += s["visible"][s["valid"]].sum()
        tot += s["valid"].sum() * cfg.num_keypoints
    assert vis < tot, "expected some unannotated joints"
    assert vis > 0.6 * tot, "annotation rate collapsed"

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


def test_render_is_chirality_consistent_under_flip():
    """np.flip(render(GT)) must equal render(mirrored GT with L/R class
    swap) exactly — the property that makes flip-with-class-swap
    augmentation and flip-TTA label-noise-free on synthetic data.
    (Pixel-grid mirror: index u ↔ W−1−u, so keypoint x maps to W−1−x.)"""
    from ppn_tpu.data.synthetic import random_people, render

    cfg = get_config("mpii_r18_384").model
    W = cfg.insize[1]
    rng = np.random.default_rng(23)
    s = random_people(rng, cfg, max_persons=2, num_persons=2)

    perm = np.arange(cfg.num_keypoints)
    for a, b in cfg.flip_pairs:
        perm[a - 1], perm[b - 1] = perm[b - 1], perm[a - 1]

    m = {k: v.copy() for k, v in s.items()}
    m["keypoints"][..., 0] = (W - 1) - m["keypoints"][..., 0]
    m["keypoints"] = m["keypoints"][:, perm]
    m["visible"] = m["visible"][:, perm]
    m["bboxes"][..., 0] = (W - 1) - m["bboxes"][..., 0]

    np.testing.assert_array_equal(
        np.flip(render(cfg, s), axis=1), render(cfg, m))


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


def test_materialize_collated_disk_memoization(tmp_path, monkeypatch):
    """materialize_collated equals a plain full collate, publishes a disk
    cache on first call, and serves identical data from it afterwards —
    including to a fresh dataset object (a new process, in effect)."""
    from ppn_tpu.data.pipeline import collate
    from ppn_tpu.data.synthetic import SyntheticPoseDataset

    monkeypatch.setenv("PPN_SYNTH_CACHE", str(tmp_path))
    cfg = get_config("tiny_test")
    ds = SyntheticPoseDataset(cfg, size=5, seed=3, num_persons=2)
    want = collate([ds[i] for i in range(5)], image_uint8=True)

    got = ds.materialize_collated(image_uint8=True)
    for k, v in want.items():
        np.testing.assert_array_equal(np.asarray(got[k]), v)
    published = [p for p in tmp_path.iterdir() if p.is_dir()]
    assert len(published) == 1 and (published[0] / "_complete").exists()

    again = SyntheticPoseDataset(cfg, size=5, seed=3,
                                 num_persons=2).materialize_collated()
    for k, v in want.items():
        np.testing.assert_array_equal(np.asarray(again[k]), v)
    assert isinstance(again["image"], np.memmap)  # served from disk

    # a different seed must NOT hit the same cache entry
    other = SyntheticPoseDataset(cfg, size=5, seed=4,
                                 num_persons=2).materialize_collated()
    assert not np.array_equal(np.asarray(other["image"]),
                              np.asarray(want["image"]))


def test_device_cache_uses_disk_memoized_feed(tmp_path, monkeypatch):
    """DeviceCache built twice over the same synthetic dataset renders only
    once (second build mmap-loads) and yields identical batches."""
    import jax

    from ppn_tpu.data.device_cache import DeviceCache
    from ppn_tpu.data.synthetic import SyntheticPoseDataset

    monkeypatch.setenv("PPN_SYNTH_CACHE", str(tmp_path))
    cfg = get_config("tiny_test")
    ds = SyntheticPoseDataset(cfg, size=6, seed=5, num_persons=1)
    a = DeviceCache(ds, image_uint8=True)
    b = DeviceCache(SyntheticPoseDataset(cfg, size=6, seed=5,
                                         num_persons=1), image_uint8=True)
    for k in a.data:
        np.testing.assert_array_equal(np.asarray(jax.device_get(a.data[k])),
                                      np.asarray(jax.device_get(b.data[k])))

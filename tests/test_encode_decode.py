"""Round-trip contract tests for the target-grid encode / box decode pair.

The reference has no test suite (SURVEY.md §4); these tests pin the §2.2 data
contract: encode(GT) -> perfect feature map -> decode must recover every GT
box at its responsible cell.
"""

import numpy as np
import pytest

from ppn_tpu.configs import get_config
from ppn_tpu.data.synthetic import random_people
from ppn_tpu.ops import decode as dec
from ppn_tpu.ops import encode as enc


@pytest.fixture(params=["tiny_test", "mpii_r18_384", "coco_r18_384"])
def cfg(request):
    return get_config(request.param)


def _sample(cfg, seed=0, num_persons=None):
    rng = np.random.default_rng(seed)
    return random_people(rng, cfg.model, cfg.data.max_persons, num_persons)


def test_encode_shapes(cfg):
    m = cfg.model
    s = _sample(cfg)
    t = enc.encode_single(m, s["keypoints"], s["visible"], s["bboxes"],
                          s["valid"])
    H, W = m.outsize
    Hl, Wl = m.local_grid_size
    assert t.delta.shape == (H, W, m.num_classes)
    assert t.tx.shape == t.ty.shape == t.tw.shape == t.th.shape == t.delta.shape
    assert t.te.shape == (H, W, m.num_limbs, Hl, Wl)
    assert set(np.unique(np.asarray(t.delta))) <= {0.0, 1.0}
    assert set(np.unique(np.asarray(t.te))) <= {0.0, 1.0}
    # offsets within the cell
    d = np.asarray(t.delta) > 0.5
    assert np.all(np.asarray(t.tx)[d] >= 0) and np.all(np.asarray(t.tx)[d] < 1)
    assert np.all(np.asarray(t.ty)[d] >= 0) and np.all(np.asarray(t.ty)[d] < 1)


def test_invalid_persons_do_not_scatter(cfg):
    m = cfg.model
    s = _sample(cfg)
    none = dict(s, valid=np.zeros_like(s["valid"]))
    t = enc.encode_single(m, none["keypoints"], none["visible"],
                          none["bboxes"], none["valid"])
    for g in t:
        assert float(np.abs(np.asarray(g)).sum()) == 0.0


def test_out_of_bounds_keypoints_dropped(cfg):
    m = cfg.model
    s = _sample(cfg, num_persons=1)
    s["keypoints"][:] = -1000.0  # far outside the image
    t = enc.encode_single(m, s["keypoints"], s["visible"], s["bboxes"],
                          s["valid"])
    delta = np.asarray(t.delta)
    assert delta[..., 1:].sum() == 0.0  # no keypoint scatters
    assert delta[..., 0].sum() == 1.0   # instance box still in-bounds


def test_roundtrip_recovers_gt(cfg):
    """encode -> perfect feature map -> decode reproduces each GT box."""
    m = cfg.model
    s = _sample(cfg, seed=3)
    t = enc.encode_single(m, s["keypoints"], s["visible"], s["bboxes"],
                          s["valid"])
    fm = enc.targets_to_feature_map(m, t)
    assert fm.shape == (*m.outsize, m.num_channels)
    act, props = dec.decode(m, fm)

    boxes = np.asarray(props.boxes)   # (H, W, K+1, 4)
    score = np.asarray(props.score)
    delta = np.asarray(t.delta)
    sy, sx = m.stride
    img_h, img_w = m.insize

    # Reconstruct expected per-person-class centers/sizes as encode does.
    kp = s["keypoints"]
    bb = s["bboxes"]
    inst_wh = bb[:, 2:4] * m.instance_scale
    part_side = m.parts_scale * np.hypot(inst_wh[:, 0], inst_wh[:, 1])
    checked = 0
    for p in range(kp.shape[0]):
        if not s["valid"][p]:
            continue
        entries = [(0, bb[p, 0], bb[p, 1], inst_wh[p, 0], inst_wh[p, 1])]
        for k in range(m.num_keypoints):
            if s["visible"][p, k]:
                entries.append((k + 1, kp[p, k, 0], kp[p, k, 1],
                                part_side[p], part_side[p]))
        for c, x, y, w, h in entries:
            ix, iy = int(x // sx), int(y // sy)
            if not (0 <= ix < m.outsize[1] and 0 <= iy < m.outsize[0]):
                continue
            assert delta[iy, ix, c] == 1.0
            got = boxes[iy, ix, c]
            # Another person may have overwritten this cell/class slot; only
            # check cells where the decoded box matches *some* GT entry.
            err = np.abs(got - np.array([x, y, w, h]))
            tol = np.array([sx * 1e-3 + 0.05, sy * 1e-3 + 0.05,
                            img_w * 1e-4 + 0.05, img_h * 1e-4 + 0.05])
            if np.all(err < tol):
                assert score[iy, ix, c] > 0.99
                checked += 1
    assert checked > 0


def test_roundtrip_limbs(cfg):
    """te entries decode to e ≈ 1 exactly at encoded (cell, offset) slots."""
    m = cfg.model
    s = _sample(cfg, seed=5)
    t = enc.encode_single(m, s["keypoints"], s["visible"], s["bboxes"],
                          s["valid"])
    fm = enc.targets_to_feature_map(m, t)
    act, _ = dec.decode(m, fm)
    e = np.asarray(act.e)
    te = np.asarray(t.te)
    assert e.shape == te.shape
    assert np.all(e[te > 0.5] > 0.99)
    assert np.all(e[te < 0.5] < 0.01)
    # at least one positive limb in a multi-person scene
    if s["valid"].sum() > 0:
        Hl, Wl = m.local_grid_size
        # every positive limb's implied dst cell is in bounds
        ys, xs, ls, dys, dxs = np.where(te > 0.5)
        H, W = m.outsize
        yd = ys + dys - Hl // 2
        xd = xs + dxs - Wl // 2
        assert np.all((yd >= 0) & (yd < H) & (xd >= 0) & (xd < W))


def test_encode_batch_matches_single(cfg):
    m = cfg.model
    samples = [_sample(cfg, seed=i) for i in range(3)]
    batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
    tb = enc.encode_batch(m, batch["keypoints"], batch["visible"],
                          batch["bboxes"], batch["valid"])
    for i, s in enumerate(samples):
        ts = enc.encode_single(m, s["keypoints"], s["visible"], s["bboxes"],
                               s["valid"])
        for a, b in zip(tb, ts):
            np.testing.assert_allclose(np.asarray(a)[i], np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

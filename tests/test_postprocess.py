"""NMS + greedy parsing parity tests against a reference-style CPU oracle.

SURVEY.md §7.3 names tie-breaking/threshold parity between the fixed-shape
TPU parsing and the reference's dynamic CPU loops as the main PCKh risk, and
prescribes exactly this: an independent Python-loop oracle implementing the
reference algorithm (ref:predict.py† get_humans_by_feature), compared
elementwise with the vectorized version.
"""

import numpy as np
import pytest

from ppn_tpu.configs import get_config
from ppn_tpu.data.synthetic import random_people
from ppn_tpu.ops import decode as dec
from ppn_tpu.ops import encode as enc
from ppn_tpu.ops import nms as nmsops
from ppn_tpu.ops import parse as parseops
from ppn_tpu.ops import postprocess as post


def _overlaps(a, b, nms_t):
    """The framework's divide-free "IoU > t" decision
    (ops/boxes.py pairwise_overlap_above_cxcywh): inter > t·max(union, eps),
    decision-equal to inter/union > t in exact arithmetic."""
    ax0, ay0, ax1, ay1 = a[0] - a[2] / 2, a[1] - a[3] / 2, a[0] + a[2] / 2, a[1] + a[3] / 2
    bx0, by0, bx1, by1 = b[0] - b[2] / 2, b[1] - b[3] / 2, b[0] + b[2] / 2, b[1] + b[3] / 2
    iw = max(min(ax1, bx1) - max(ax0, bx0), 0.0)
    ih = max(min(ay1, by1) - max(ay0, by0), 0.0)
    inter = iw * ih
    union = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return inter > nms_t * max(union, 1e-9)


def oracle_nms(boxes, scores, det_t, nms_t):
    """Reference-style greedy NMS: returns keep mask over N proposals."""
    n = scores.shape[0]
    keep = np.zeros(n, bool)
    kept = []
    for i in np.argsort(-scores, kind="stable"):
        if scores[i] <= det_t:
            continue
        if any(_overlaps(boxes[i], boxes[j], nms_t) for j in kept):
            continue
        keep[i] = True
        kept.append(i)
    return keep


def oracle_parse(m, e, score, boxes):
    """Reference-style greedy person assembly (dynamic Python)."""
    H, W = m.outsize
    Hl, Wl = m.local_grid_size
    K1 = m.num_classes
    P = m.max_instances

    inst = score[..., 0].reshape(-1)
    order = np.argsort(-inst, kind="stable")[:P]
    people = []
    for pi in order:
        if inst[pi] <= 0:
            people.append(None)
            continue
        ys, xs = divmod(int(pi), W)
        kp = {0: (ys, xs, float(inst[pi]))}
        for l, (s_cls, d_cls) in enumerate(m.edges):
            if s_cls not in kp:
                continue
            sy, sx_ = kp[s_cls][0], kp[s_cls][1]
            best, best_val = None, 0.0
            for dy in range(Hl):
                for dx in range(Wl):
                    yc = sy + dy - Hl // 2
                    xc = sx_ + dx - Wl // 2
                    if not (0 <= yc < H and 0 <= xc < W):
                        continue
                    v = e[sy, sx_, l, dy, dx] * score[yc, xc, d_cls]
                    if v > best_val:
                        best_val = v
                        best = (yc, xc, float(score[yc, xc, d_cls]))
            if best is not None:
                kp[d_cls] = best
        people.append(kp)
    return people


def _random_fm(m, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(0.0, 2.0, (*m.outsize, m.num_channels)).astype(
        np.float32)


@pytest.fixture(params=["tiny_test", "mpii_r18_384"])
def cfg(request):
    return get_config(request.param)


def test_nms_matches_oracle(cfg):
    m = cfg.model
    for seed in range(3):
        fm = _random_fm(m, seed)
        act, props = dec.decode(m, fm)
        got = nmsops.nms_single(m, props)
        boxes = np.asarray(props.boxes)
        score = np.asarray(props.score)
        for c in range(m.num_classes):
            b = boxes[..., c, :].reshape(-1, 4)
            s = score[..., c].reshape(-1)
            want = oracle_nms(b, s, m.detection_thresh, m.nms_thresh)
            np.testing.assert_array_equal(
                np.asarray(got.keep)[..., c].reshape(-1), want,
                err_msg=f"class {c} seed {seed}")


def test_wave_nms_matches_scan_nms(cfg):
    """The parallel-wave NMS must equal the sequential scan formulation."""
    m = cfg.model
    for seed in range(5):
        fm = _random_fm(m, seed)
        act, props = dec.decode(m, fm)
        wave = nmsops.nms_single(m, props)
        scan = nmsops.nms_single_scan(m, props)
        np.testing.assert_array_equal(np.asarray(wave.keep),
                                      np.asarray(scan.keep),
                                      err_msg=f"seed {seed}")


def test_parse_matches_oracle(cfg):
    m = cfg.model
    for seed in range(3):
        fm = _random_fm(m, seed)
        act, props = dec.decode(m, fm)
        nms = nmsops.nms_single(m, props)
        got = parseops.parse_single(m, act, props, nms)
        want = oracle_parse(m, np.asarray(act.e), np.asarray(nms.score),
                            np.asarray(props.boxes))
        for p, kp in enumerate(want):
            if kp is None:
                assert not bool(np.asarray(got.kp_valid)[p, 0]), p
                continue
            want_n = len(kp) - 1
            got_valid = np.asarray(got.kp_valid)[p]
            person_ok = (1 if 0 in kp else 0) and want_n >= m.min_num_keypoints
            assert bool(np.asarray(got.valid)[p]) == bool(person_ok), p
            if not person_ok:
                continue
            assert int(np.asarray(got.num_kp)[p]) == want_n
            for c, (yy, xx, sc) in kp.items():
                assert got_valid[c], (p, c)
                np.testing.assert_array_equal(
                    np.asarray(got.kp_cell)[p, c], (yy, xx))
                np.testing.assert_allclose(
                    np.asarray(got.kp_score)[p, c], sc, rtol=1e-5)


def test_postprocess_recovers_synthetic_gt(cfg):
    """On oracle-perfect feature maps, parsing must reproduce GT persons."""
    m = cfg.model
    rng = np.random.default_rng(4)
    s = random_people(rng, m, max_persons=3, num_persons=2)
    t = enc.encode_single(m, s["keypoints"], s["visible"], s["bboxes"],
                          s["valid"])
    fm = enc.targets_to_feature_map(m, t)
    ppl = post.postprocess_single(m, fm)

    sy, sx = m.stride
    n_gt = int(s["valid"].sum())
    # GT persons whose instance centers fall in distinct cells must be found.
    cells = set()
    for p in range(n_gt):
        cx, cy = s["bboxes"][p, 0], s["bboxes"][p, 1]
        cells.add((int(cy // sy), int(cx // sx)))
    found = {tuple(c) for c, v in
             zip(np.asarray(ppl.kp_cell)[:, 0], np.asarray(ppl.valid)) if v}
    # Overlapping GT instances may legitimately suppress each other in NMS,
    # so: every parsed person sits on a GT instance cell, and at least one
    # GT person is recovered.
    assert found <= cells
    assert len(found) >= 1


def test_postprocess_batch_consistent(cfg):
    m = cfg.model
    fms = np.stack([_random_fm(m, s) for s in range(2)])
    got_b = post.postprocess_batch(m, fms)
    for i in range(2):
        got_s = post.postprocess_single(m, fms[i])
        for a, b in zip(got_b, got_s):
            np.testing.assert_array_equal(np.asarray(a)[i], np.asarray(b))

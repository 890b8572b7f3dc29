"""Minimum end-to-end slice (SURVEY.md §7.4): overfit a tiny synthetic set —
loss must drop sharply and decoded poses must land on GT cells."""

import numpy as np
import pytest

from ppn_tpu.configs import get_config
from ppn_tpu.data.synthetic import SyntheticPoseDataset
from ppn_tpu.train import steps as st


def _tiny_batch(cfg, n=4):
    ds = SyntheticPoseDataset(cfg, size=n, seed=11, num_persons=1)
    samples = [ds[i] for i in range(n)]
    return {
        "image": np.stack([s["image"] for s in samples]).astype(np.float32),
        "keypoints": np.stack([s["keypoints"] for s in samples]),
        "visible": np.stack([s["visible"] for s in samples]),
        "bboxes": np.stack([s["bboxes"] for s in samples]),
        "valid": np.stack([s["valid"] for s in samples]),
    }


@pytest.mark.slow
def test_overfit_tiny():
    cfg = get_config("tiny_test")
    batch = _tiny_batch(cfg)
    graphdef, state, tx = st.create_train_state(cfg)
    import dataclasses

    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, num_steps=100, warmup_steps=10, learning_rate=0.02,
            lr_schedule="cosine"))
    train_step = st.make_train_step(cfg, graphdef, tx)

    first = None
    terms = {}
    for i in range(100):
        state, terms = train_step(state, batch)
        if first is None:
            first = float(terms["loss_total"])
    last = float(terms["loss_total"])
    assert np.isfinite(last)
    assert last < first * 0.25, (first, last)

    # Decoded responsibility should peak at the GT instance cells.
    forward = st.make_forward(cfg, graphdef)
    fm = forward(state, batch["image"])
    from ppn_tpu.ops import decode as dec, encode as enc

    act, props = dec.decode(cfg.model, np.asarray(fm))
    t = enc.encode_batch(cfg.model, batch["keypoints"], batch["visible"],
                         batch["bboxes"], batch["valid"])
    delta = np.asarray(t.delta)
    score = np.asarray(props.score)
    hits = 0
    for b in range(delta.shape[0]):
        gt_cell = np.unravel_index(delta[b, ..., 0].argmax(),
                                   delta.shape[1:3])
        top_cell = np.unravel_index(score[b, ..., 0].argmax(),
                                    score.shape[1:3])
        hits += int(gt_cell == top_cell)
    assert hits >= delta.shape[0] - 1, f"instance cell hits {hits}"

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


def test_ema_params_track_and_drive_eval():
    """ema_decay>0: EMA leaves lag params, eval_params returns them;
    disabled: ema_params is None and eval_params returns live params."""
    import dataclasses

    import jax

    cfg = get_config("tiny_test")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.9,
                                       warmup_steps=0, num_steps=5,
                                       learning_rate=0.05,
                                       lr_schedule="constant"))
    batch = _tiny_batch(cfg, n=2)
    graphdef, state, tx = st.create_train_state(cfg)
    assert state.ema_params is not None
    p0 = jax.device_get(jax.tree.leaves(state.params)[0])
    train_step = st.make_train_step(cfg, graphdef, tx)
    for _ in range(3):
        state, _ = train_step(state, batch)
    live, ema = (jax.device_get(jax.tree.leaves(t)[0])
                 for t in (state.params, state.ema_params))
    assert not np.allclose(live, ema)          # EMA lags the live params
    assert not np.allclose(ema, p0)            # ...but did move
    # EMA stays closer to the init than the live params do (it averages
    # the whole trajectory starting at p0)
    assert np.abs(ema - p0).mean() < np.abs(live - p0).mean()
    got = st.eval_params(state)
    assert got is state.ema_params

    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.0))
    _, state2, _ = st.create_train_state(cfg2)
    assert state2.ema_params is None
    assert st.eval_params(state2) is state2.params

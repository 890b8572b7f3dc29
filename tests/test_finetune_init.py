"""Fine-tune initialization from a committed inference snapshot
(utils/params_io.load_npz_into_train_state — VERDICT r4 directive #1:
the crowding-matched hero fine-tunes from the committed COCO snapshot),
and the crowded-scene preset (directive #5)."""

import dataclasses

import jax
import numpy as np

from ppn_tpu.configs import get_config
from ppn_tpu.train import steps as st
from ppn_tpu.utils.params_io import (load_npz_into_train_state,
                                     save_inference_npz)


def _tree_allclose(a, b, **kw):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


def test_load_npz_into_train_state_roundtrip(tmp_path):
    cfg = get_config("tiny_test")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.999))
    _, src, _ = st.create_train_state(cfg, seed=3)
    path = str(tmp_path / "snap.npz")
    # f32 snapshot so the round-trip is exact (the committed artifacts are
    # f16; quantization tolerance is pinned by test_committed_checkpoint).
    save_inference_npz(path, src, float_dtype=np.float32)

    _, fresh, _ = st.create_train_state(cfg, seed=7)
    loaded = load_npz_into_train_state(path, fresh)
    # eval params of src == EMA of a fresh state == its params (just init'd)
    _tree_allclose(loaded.params, st.eval_params(src), rtol=0, atol=0)
    _tree_allclose(loaded.rest, src.rest, rtol=0, atol=0)
    # EMA seeded from the loaded params, not the fresh random ones
    _tree_allclose(loaded.ema_params, loaded.params, rtol=0, atol=0)
    # optimizer and step restart
    assert int(loaded.step) == 0
    _tree_allclose(loaded.opt_state, fresh.opt_state, rtol=0, atol=0)


def test_load_npz_into_train_state_no_ema(tmp_path):
    cfg = get_config("tiny_test")  # tiny_test default: ema off
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.0))
    _, src, _ = st.create_train_state(cfg, seed=3)
    path = str(tmp_path / "snap.npz")
    save_inference_npz(path, src, float_dtype=np.float32)
    _, fresh, _ = st.create_train_state(cfg, seed=7)
    loaded = load_npz_into_train_state(path, fresh)
    assert loaded.ema_params is None
    _tree_allclose(loaded.params, src.params, rtol=0, atol=0)


def test_trainer_accepts_init_npz(tmp_path):
    """The Trainer wires init_npz through (and resume from an empty ckpt
    dir does not clobber it)."""
    from ppn_tpu.train.trainer import Trainer

    cfg = get_config("tiny_test")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, checkpoint_dir=str(tmp_path / "ckpt"),
            ema_decay=0.0))
    _, src, _ = st.create_train_state(cfg, seed=3)
    path = str(tmp_path / "snap.npz")
    save_inference_npz(path, src, float_dtype=np.float32)

    t = Trainer(cfg, iter([]), val_dataset=None, use_mesh=False,
                init_npz=path)
    try:
        _tree_allclose(t.state.params, src.params, rtol=0, atol=0)
    finally:
        t.close()


def test_crowded_preset():
    """coco_r18_384_crowded = coco_r18_384 at the crowding study's
    operating point; model shapes identical so checkpoints interchange."""
    base = get_config("coco_r18_384")
    crowded = get_config("coco_r18_384_crowded")
    assert crowded.model.nms_thresh == 0.6
    assert crowded.model.detection_thresh == 0.02
    same = dataclasses.replace(crowded.model, nms_thresh=base.model.nms_thresh,
                               detection_thresh=base.model.detection_thresh)
    assert same == base.model

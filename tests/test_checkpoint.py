"""Checkpoint save/restore round trip + Trainer resume (SURVEY.md §5)."""

import dataclasses

import jax
import numpy as np

from ppn_tpu.configs import get_config
from ppn_tpu.data.pipeline import infinite_batches
from ppn_tpu.data.synthetic import SyntheticPoseDataset
from ppn_tpu.train.checkpoint import Checkpointer
from ppn_tpu.train import steps as st


def test_checkpoint_roundtrip(tmp_path):
    cfg = get_config("tiny_test")
    graphdef, state, tx = st.create_train_state(cfg)
    ck = Checkpointer(str(tmp_path / "ck"), async_save=False)
    ck.save(3, jax.device_get(state))
    ck.wait()

    graphdef2, template, _ = st.create_train_state(cfg, seed=99)
    restored = ck.restore_latest(jax.device_get(template))
    assert restored is not None
    step, rstate = restored
    assert step == 3
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(rstate.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ck.close()


def test_trainer_resume(tmp_path):
    from ppn_tpu.train.trainer import Trainer

    cfg = get_config("tiny_test")
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, num_steps=6, checkpoint_every=3, eval_every=0,
        checkpoint_dir=str(tmp_path / "ck"), log_every=100))
    ds = SyntheticPoseDataset(cfg, size=4, seed=0)

    t1 = Trainer(cfg, infinite_batches(ds, cfg.train.batch_size),
                 augment=False)
    t1.run()
    assert t1.step == 6
    params_after = jax.device_get(t1.state.params)
    t1.close()

    # a fresh trainer resumes from step 6 and does no extra work
    t2 = Trainer(cfg, infinite_batches(ds, cfg.train.batch_size),
                 augment=False)
    assert t2.step == 6
    for a, b in zip(jax.tree.leaves(params_after),
                    jax.tree.leaves(jax.device_get(t2.state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    t2.close()


def test_grain_loader_fallback_shapes():
    from ppn_tpu.data.pipeline import make_grain_loader

    cfg = get_config("tiny_test")
    ds = SyntheticPoseDataset(cfg, size=8, seed=0)
    it = make_grain_loader(ds, batch_size=4, seed=0, num_epochs=1)
    batches = list(it)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, *cfg.model.insize, 3)


def test_load_state_ema_template_mismatch(tmp_path):
    """A checkpoint saved by an EMA-enabled run must load under a config
    with EMA off (and vice versa): load_state retries with the opposite
    ema_params template (regression: evaluate CLI failed on EMA runs)."""
    from ppn_tpu.apps.predict import load_state

    cfg_ema = dataclasses.replace(
        get_config("tiny_test"),
        train=dataclasses.replace(get_config("tiny_test").train,
                                  ema_decay=0.999))
    graphdef, state, _ = st.create_train_state(cfg_ema)
    assert state.ema_params is not None
    ck = Checkpointer(str(tmp_path / "ck"), async_save=False)
    ck.save(5, jax.device_get(state))
    ck.close()

    # default config has ema_decay=0 -> template without ema_params
    cfg_plain = get_config("tiny_test")
    assert cfg_plain.train.ema_decay == 0.0
    _, restored = load_state(cfg_plain, str(tmp_path / "ck"))
    assert restored.ema_params is not None
    ev = st.eval_params(restored)
    for a, b in zip(jax.tree.leaves(ev), jax.tree.leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_resume_across_ema_toggle(tmp_path):
    """Resume must survive toggling --ema-decay between runs (regression:
    structure mismatch crashed the resume instead of reconciling)."""
    from ppn_tpu.apps import train as train_app

    ck = str(tmp_path / "ck")
    train_app.main(["--config", "tiny_test", "--overfit", "2", "--steps",
                    "2", "--ckpt-dir", ck])
    # EMA off -> on: resumes, seeds EMA from restored params
    train_app.main(["--config", "tiny_test", "--overfit", "2", "--steps",
                    "4", "--ckpt-dir", ck, "--ema-decay", "0.9"])
    # EMA on -> off: resumes, drops EMA
    train_app.main(["--config", "tiny_test", "--overfit", "2", "--steps",
                    "6", "--ckpt-dir", ck])

"""Host pre-upload downscale path (apps/video.py --pre-resize, VERDICT r4
directive #6) and the shared measurement-artifact writer (directive #9)."""

import json
import os
import sys

import numpy as np

from ppn_tpu.apps.video import host_resize, make_video_pipeline
from ppn_tpu.configs import get_config


def test_host_resize_shapes_and_dtype():
    frame = np.random.default_rng(0).integers(
        0, 255, (720, 1280, 3), dtype=np.uint8)
    small = host_resize(frame, (384, 384))
    assert small.shape == (384, 384, 3)
    assert small.dtype == np.uint8


def test_host_resize_noop_when_already_sized():
    frame = np.random.default_rng(0).integers(
        0, 255, (64, 64, 3), dtype=np.uint8)
    out = host_resize(frame, (64, 64))
    assert out is frame  # zero-copy passthrough


def test_pipeline_pre_resized_accepts_model_size_frame():
    import jax
    from flax import nnx

    from ppn_tpu.train import steps as st

    cfg = get_config("tiny_test")
    model = st.create_model(cfg)
    model.eval()
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    state = st.TrainState(params=params, rest=rest, opt_state=None,
                          step=0, rng=jax.random.PRNGKey(0))
    pipe = make_video_pipeline(cfg, graphdef, pre_resized=True)
    frame = np.random.default_rng(0).integers(
        0, 255, (*cfg.model.insize, 3), dtype=np.uint8)
    people = jax.device_get(pipe(state, frame))
    assert np.asarray(people.valid).shape[0] == cfg.model.max_instances


def test_artifact_writer_provenance(tmp_path):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    try:
        from tools._artifact import write_artifact
    finally:
        sys.path.pop(0)

    out = str(tmp_path / "x.json")
    path = write_artifact({"value": 1.5}, "unit_probe", out)
    assert path == out
    rec = json.load(open(out))
    assert rec["tool"] == "unit_probe"
    assert rec["value"] == 1.5
    assert "measured" in rec and "argv" in rec

"""Predictor API + video pipeline + visualization smoke tests."""

import numpy as np
import pytest

from ppn_tpu.configs import get_config
from ppn_tpu.data.synthetic import SyntheticPoseDataset


def test_predictor_fresh_model():
    from ppn_tpu.inference import Predictor

    cfg = get_config("tiny_test")
    p = Predictor.from_checkpoint(cfg, None)
    ds = SyntheticPoseDataset(cfg, size=2, seed=0)
    imgs = np.stack([ds[i]["image"] for i in range(2)])
    ppl = p.predict(imgs)
    assert np.asarray(ppl.valid).shape == (2, cfg.model.max_instances)
    one = p.predict_single(imgs[0])
    assert np.asarray(one.valid).shape == (cfg.model.max_instances,)


def test_predictor_shape_errors():
    from ppn_tpu.inference import Predictor

    cfg = get_config("tiny_test")
    p = Predictor.from_checkpoint(cfg, None)
    with pytest.raises(ValueError, match="resize first"):
        p.predict(np.zeros((1, 128, 128, 3), np.float32))
    with pytest.raises(ValueError, match="expected"):
        p.predict(np.zeros((64, 64, 3), np.float32))


def test_video_pipeline_fn():
    from ppn_tpu.apps.video import make_video_pipeline, synthetic_frames
    from ppn_tpu.train import steps as st

    cfg = get_config("tiny_test")
    graphdef, state, _ = st.create_train_state(cfg)
    pipeline = make_video_pipeline(cfg, graphdef)
    frames = list(synthetic_frames(2, size=(120, 160)))
    assert frames[0].shape == (120, 160, 3) and frames[0].dtype == np.uint8
    ppl = pipeline(state, frames[0])
    assert np.asarray(ppl.valid).shape == (cfg.model.max_instances,)


def test_draw_people_renders():
    from ppn_tpu.ops import postprocess as post
    from ppn_tpu.ops import encode as enc
    from ppn_tpu.data.synthetic import random_people
    from ppn_tpu.utils.draw import draw_people

    cfg = get_config("mpii_r18_384").model
    rng = np.random.default_rng(3)
    s = random_people(rng, cfg, max_persons=2, num_persons=1)
    t = enc.encode_single(cfg, s["keypoints"], s["visible"], s["bboxes"],
                          s["valid"])
    fm = enc.targets_to_feature_map(cfg, t)
    ppl = post.postprocess_single(cfg, fm)
    img = np.zeros((*cfg.insize, 3), np.float32)
    out = draw_people(cfg, img, ppl)
    arr = np.asarray(out)
    assert arr.shape == (*cfg.insize, 3)
    assert arr.max() > 0  # something was drawn on the black canvas

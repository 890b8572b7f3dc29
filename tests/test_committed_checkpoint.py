"""The committed inference snapshot must reproduce its pinned accuracy
(VERDICT r3 directive #4): every r2/r3 accuracy hero previously lived in
/tmp; this test makes the repo self-contained — load
artifacts/coco_hero_r3_ema_f16.npz and reproduce a pinned PCKh on the
held-out synthetic protocol, entirely on CPU.

Pinned number provenance: the r3 COCO hero (step 80000 EMA,
artifacts/accuracy_coco_hero_r3.json) scored 0.9870 PCKh on the full
128-image 2-person protocol at det 0.02 / nms 0.6; this snapshot is its
f16-quantized EMA params, and 0.9756 is the measured CPU value on the
first 16 images of the same protocol (batch 8). Deterministic given the
committed bytes.
"""

import os

import numpy as np

from ppn_tpu.configs import get_config

SNAPSHOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "coco_hero_r3_ema_f16.npz")

PINNED_PCKH_16 = 0.9756


def test_committed_snapshot_reproduces_pinned_pckh():
    import dataclasses

    from ppn_tpu.apps.train import make_datasets
    from ppn_tpu.eval.runner import evaluate_pckh
    from ppn_tpu.train import steps as st
    from ppn_tpu.utils.params_io import load_inference_npz

    cfg = get_config("coco_r18_384")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, detection_thresh=0.02,
                                       nms_thresh=0.6))

    class _A:
        data = "synthetic"
        data_root = None
        overfit = None
        num_persons = 2
        train_size = 1

    _, val = make_datasets(cfg, _A)
    graphdef, state = load_inference_npz(cfg, SNAPSHOT)
    forward = st.make_forward(cfg, graphdef)
    summary = evaluate_pckh(cfg, forward, state, val,
                            max_images=16, batch_size=8)
    assert abs(summary["pckh/mean"] - PINNED_PCKH_16) < 3e-3, summary
    assert summary["pckh/num_joints"] == 410


def test_snapshot_rejects_wrong_config():
    import pytest

    from ppn_tpu.utils.params_io import load_inference_npz

    with pytest.raises(ValueError, match="leaves|shape"):
        load_inference_npz(get_config("mpii_r18_384"), SNAPSHOT)

"""The committed crowding-matched hero must reproduce its pinned accuracy
(VERDICT r4 directive #1): artifacts/crowd_hero_r5_ema_f16.npz is the r3
COCO hero fine-tuned in three crowding-matched stages (all B=128, EMA
0.999, device-resident K=8 loop): 20k steps lr 0.005 on random-1..8
scenes (8192 imgs, seed 5), 10k steps lr 0.002 on 3..8 scenes (8192,
seed 6), 20k steps lr 0.004 on 3..8 scenes (16384 fresh imgs, seed 7 —
data variety was the binding lever at that point).

Pinned number provenance: 0.9249 PCKh measured on CPU on the first 16
images of the held-out 5-person protocol (seed 10000, batch 8) at the
crowded operating point (coco_r18_384_crowded: det 0.02 / nms 0.6).
Deterministic given the committed bytes. The full crowding sweep lives in
artifacts/crowding_study_r5.json.
"""

import os

from ppn_tpu.configs import get_config

SNAPSHOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "crowd_hero_r5_ema_f16.npz")

PINNED_PCKH_16 = 0.9249


def test_committed_crowd_snapshot_reproduces_pinned_pckh():
    from ppn_tpu.apps.train import make_datasets
    from ppn_tpu.eval.runner import evaluate_pckh
    from ppn_tpu.train import steps as st
    from ppn_tpu.utils.params_io import load_inference_npz

    cfg = get_config("coco_r18_384_crowded")

    class _A:
        data = "synthetic"
        data_root = None
        overfit = None
        num_persons = 5
        train_size = 1

    _, val = make_datasets(cfg, _A)
    graphdef, state = load_inference_npz(cfg, SNAPSHOT)
    forward = st.make_forward(cfg, graphdef)
    summary = evaluate_pckh(cfg, forward, state, val,
                            max_images=16, batch_size=8)
    assert abs(summary["pckh/mean"] - PINNED_PCKH_16) < 3e-3, summary
    assert summary["pckh/num_joints"] == 999

"""The committed MPII hero must reproduce its pinned accuracy (VERDICT r4
directive #4: the r2 MPII hero claim cited /tmp weights that are gone —
this snapshot + pin makes the MPII-family accuracy claim repo-contained).

Provenance: mpii_r18_384 synthetic 2-person, 60k steps B=32 (device-
resident K=8 loop), lr 0.015 cosine, EMA 0.999, train_size 8192, seed 0.
Final training eval 0.9794 (default thresholds); this snapshot scores
0.9831 on the full 128-image held-out protocol and 0.9921 on its first 16
images at det 0.02 / nms 0.45 (CPU, batch 8) — the pin below.
`dryrun_multichip` stage 3 loads the same snapshot for its sharded-eval
numeric check.
"""

import os

from ppn_tpu.configs import get_config

SNAPSHOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "mpii_hero_r5_ema_f16.npz")

PINNED_PCKH_16 = 0.9921


def test_committed_mpii_snapshot_reproduces_pinned_pckh():
    import dataclasses

    from ppn_tpu.apps.train import make_datasets
    from ppn_tpu.eval.runner import evaluate_pckh
    from ppn_tpu.train import steps as st
    from ppn_tpu.utils.params_io import load_inference_npz

    cfg = get_config("mpii_r18_384")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, detection_thresh=0.02,
                                       nms_thresh=0.45))

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
    assert summary["pckh/num_joints"] == 378

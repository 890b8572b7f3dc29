"""Sweep postprocess operating points (detection/NMS thresholds) on a
trained checkpoint — the reference exposes the same knobs in config.ini†
(SURVEY.md §2.1 Config row).

The model forward runs ONCE over the val set; the cached feature maps are
re-postprocessed per (det, nms) point (each distinct cfg re-traces the
jitted postprocess, but never the backbone).

    python tools/threshold_sweep.py --ckpt-dir /tmp/ckpt \
        [--num-persons 2] [--det 0.1,0.15,0.2] [--nms 0.3,0.45] [--flip-tta]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="mpii_r18_384")
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--num-persons", type=int, default=2)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--det", default="0.10,0.15,0.20")
    p.add_argument("--nms", default="0.30,0.45")
    p.add_argument("--flip-tta", action="store_true")
    p.add_argument("--per-joint", action="store_true",
                   help="print the best point's full per-joint PCKh dict")
    args = p.parse_args(argv)

    import jax

    from ppn_tpu.apps.predict import load_state
    from ppn_tpu.configs import get_config
    from ppn_tpu.data.pipeline import epoch_batches
    from ppn_tpu.data.synthetic import SyntheticPoseDataset
    from ppn_tpu.eval.pckh import PCKhEvaluator
    from ppn_tpu.eval.runner import add_pckh_batch, pad_batch
    from ppn_tpu.ops import postprocess as post
    from ppn_tpu.train import steps as st

    base = get_config(args.config)
    val = SyntheticPoseDataset(base, size=args.size, seed=10_000,
                               cache=True, num_persons=args.num_persons)
    graphdef, state = load_state(base, args.ckpt_dir)
    forward = st.make_forward(base, graphdef, flip_tta=args.flip_tta)

    # Forward once; keep (feature map, GT) per batch on host. Batches are
    # padded to one fixed shape (shared pad_batch) so the jitted forward
    # and per-point postprocess each trace exactly once.
    cached = []
    rng = np.random.default_rng(0)
    for batch in epoch_batches(val, args.batch_size, rng=rng,
                               shuffle=False, drop_remainder=False):
        batch, n_real = pad_batch(batch, args.batch_size)
        fm = np.asarray(jax.device_get(forward(state, batch["image"])))
        cached.append((fm, batch, n_real))

    best = None
    for det in (float(x) for x in args.det.split(",")):
        for nms in (float(x) for x in args.nms.split(",")):
            cfg = dataclasses.replace(base, model=dataclasses.replace(
                base.model, detection_thresh=det, nms_thresh=nms))
            ev = PCKhEvaluator(cfg.model)
            for fm, batch, n_real in cached:
                people = jax.device_get(
                    post.postprocess_batch_fast(cfg.model, fm))
                add_pckh_batch(ev, people, batch, n_real)
            summ = ev.summarize()
            rec = {"det": det, "nms": nms,
                   "pckh_mean": round(summ["pckh/mean"], 4)}
            print(json.dumps(rec))
            if best is None or rec["pckh_mean"] > best["pckh_mean"]:
                best = rec
                best_summ = summ
    print("best:", json.dumps(best))
    if args.per_joint:
        print("per_joint:", json.dumps(
            {k: round(v, 4) for k, v in best_summ.items()}))


if __name__ == "__main__":
    main()

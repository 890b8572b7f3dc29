"""Compute the oracle parse ceiling for a synthetic val set.

Feeds GT-perfect feature maps (encode → targets_to_feature_map) through
the identical postprocess + PCKh evaluation used for model predictions.
The resulting PCKh is the ceiling imposed by PPN's parsing semantics
(same-class NMS suppression between nearby people, cross-person limb
steals) — see docs/ARCHITECTURE.md "Accuracy semantics".

    python tools/oracle_ceiling.py [--num-persons 2] [--size 128]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="mpii_r18_384")
    p.add_argument("--num-persons", type=int, default=2)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--seed", type=int, default=10_000,
                   help="10000 = the train CLI's held-out val seed")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="PATH=VALUE",
                   help="dotted-path config override, e.g. "
                        "--set model.nms_thresh=0.6 (the ceiling depends "
                        "on the postprocess operating point)")
    p.add_argument("--per-joint", action="store_true",
                   help="print the full per-joint PCKh dict")
    args = p.parse_args(argv)

    from ppn_tpu.configs import get_config
    from ppn_tpu.data.synthetic import SyntheticPoseDataset
    from ppn_tpu.eval.pckh import PCKhEvaluator
    from ppn_tpu.eval.runner import synthetic_headsizes
    from ppn_tpu.ops import encode as enc
    from ppn_tpu.ops import postprocess as post

    cfg = get_config(args.config)
    if args.overrides:
        from ppn_tpu.configs.overrides import apply_overrides

        cfg = apply_overrides(cfg, args.overrides)
    m = cfg.model
    np_ = args.num_persons if args.num_persons > 0 else None  # 0 = random
    ds = SyntheticPoseDataset(cfg, size=args.size, seed=args.seed,
                              num_persons=np_)
    ev = PCKhEvaluator(m)
    for i in range(args.size):
        s = ds[i]
        t = enc.encode_single(m, s["keypoints"], s["visible"], s["bboxes"],
                              s["valid"])
        fm = np.asarray(enc.targets_to_feature_map(m, t))[None]
        ppl = jax.device_get(post.postprocess_batch(m, fm))
        one = jax.tree.map(lambda x: x[0], ppl)
        ev.add_image(one, s["keypoints"], s["visible"], s["bboxes"],
                     s["valid"], synthetic_headsizes(s["bboxes"]))
    summ = ev.summarize()
    label = (f"{args.num_persons}-person" if np_ is not None
             else f"random-1..{cfg.data.max_persons}-person")
    print(f"oracle ceiling ({label}, {args.size} images, "
          f"seed {args.seed}): PCKh@0.5 mean = {summ['pckh/mean']:.4f}")
    if args.per_joint:
        import json

        print("per_joint:", json.dumps(
            {k: round(v, 4) for k, v in summ.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

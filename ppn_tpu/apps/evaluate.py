"""Evaluation CLI — PCKh@0.5 over a validation set (SURVEY.md §3.4).

Example:
    python -m ppn_tpu.apps.evaluate --config tiny_test \
        --ckpt-dir /tmp/ppn_ckpt --data synthetic --max-images 128
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from ppn_tpu.configs import resolve_config


def main(argv=None):
    p = argparse.ArgumentParser(description="PPN PCKh evaluation")
    p.add_argument("--config", default="mpii_r18_384")
    p.add_argument("--ini", default=None, metavar="PATH",
                   help="reference-style config.ini applied over --config")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--data", default="synthetic",
                   choices=["synthetic", "mpii", "coco"])
    p.add_argument("--data-root", default=None)
    p.add_argument("--max-images", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-persons", type=int, default=None,
                   help="synthetic data: fixed persons per image (default: "
                        "random 1..max_persons) — match the training eval "
                        "protocol")
    p.add_argument("--metric", default="pckh", choices=["pckh", "oks"],
                   help="pckh = MPII PCKh@0.5; oks = COCO-style OKS "
                        "AP/AP50/AP75 (SURVEY.md §6 config 4)")
    p.add_argument("--flip-tta", action="store_true",
                   help="horizontal-flip test-time augmentation: average "
                        "the mirrored prediction in logit space (ops/tta.py)")
    p.add_argument("--detection-thresh", type=float, default=None,
                   help="shorthand for --set model.detection_thresh=X (the "
                        "reference exposes the same knob in config.ini)")
    p.add_argument("--nms-thresh", type=float, default=None,
                   help="shorthand for --set model.nms_thresh=X")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="PATH=VALUE",
                   help="generic dotted-path config override (repeatable)")
    args = p.parse_args(argv)

    cfg = resolve_config(args.config, args.ini)
    # shorthand flags first, generic --set last: --set is documented as
    # "applied after all other flags" (same precedence as apps/train.py)
    overrides = []
    if args.detection_thresh is not None:
        overrides.append(f"model.detection_thresh={args.detection_thresh}")
    if args.nms_thresh is not None:
        overrides.append(f"model.nms_thresh={args.nms_thresh}")
    overrides += list(args.overrides)
    if overrides:
        from ppn_tpu.configs.overrides import apply_overrides

        cfg = apply_overrides(cfg, overrides)
    from ppn_tpu.apps.predict import load_state
    from ppn_tpu.apps.train import make_datasets
    from ppn_tpu.eval.runner import evaluate_oks, evaluate_pckh
    from ppn_tpu.train import steps as st

    class _A:
        data = args.data
        data_root = args.data_root
        overfit = None
        num_persons = args.num_persons
        train_size = 1  # only the val split is used; keep train-gen trivial

    _, val = make_datasets(cfg, _A)
    if val is None:
        raise SystemExit("no validation split available")

    graphdef, state = load_state(cfg, args.ckpt_dir)
    forward = st.make_forward(cfg, graphdef, flip_tta=args.flip_tta)
    evaluate = evaluate_pckh if args.metric == "pckh" else evaluate_oks
    summary = evaluate(cfg, forward, state, val,
                       max_images=args.max_images,
                       batch_size=args.batch_size)
    print(json.dumps({k: round(v, 4) for k, v in summary.items()}, indent=1))


if __name__ == "__main__":
    main()

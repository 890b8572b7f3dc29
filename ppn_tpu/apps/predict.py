"""Single-image inference CLI — ref:predict.py† (SURVEY.md §3.2).

Loads a checkpoint, preprocesses one image (file or synthetic index),
runs forward + on-device decode/NMS/parse, prints poses as JSON and
optionally writes a visualization.

Example:
    python -m ppn_tpu.apps.predict --config tiny_test \
        --ckpt-dir /tmp/ppn_ckpt --synthetic 0 --out /tmp/pose.png
"""

from __future__ import annotations

import argparse
import json

import jax
import numpy as np

from ppn_tpu.configs import get_config, resolve_config


def load_state(cfg, ckpt_dir=None):
    """(graphdef, state): restored from ckpt_dir if given, else fresh init."""
    import dataclasses

    from ppn_tpu.train import steps as st
    from ppn_tpu.train.checkpoint import Checkpointer

    if ckpt_dir and ckpt_dir.endswith(".npz"):
        # committed inference-weights snapshot (utils/params_io.py)
        from ppn_tpu.utils.params_io import load_inference_npz

        graphdef, state = load_inference_npz(cfg, ckpt_dir)
        print(f"loaded inference snapshot {ckpt_dir}")
        return graphdef, state
    if ckpt_dir:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           checkpoint_dir=ckpt_dir))
    graphdef, state, _ = st.create_train_state(cfg)
    if ckpt_dir:
        ck = Checkpointer(ckpt_dir)
        try:
            restored = ck.restore_latest(jax.device_get(state))
        except RuntimeError:
            # The run may have trained with EMA while this config has it
            # off (or vice versa): ema_params is present/absent in the
            # saved tree. Retry with the opposite template before failing.
            ema = 0.0 if cfg.train.ema_decay > 0 else 0.999
            cfg2 = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, ema_decay=ema))
            graphdef, state, _ = st.create_train_state(cfg2)
            restored = ck.restore_latest(jax.device_get(state))
        if restored is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        step, state = restored
        print(f"loaded checkpoint step {step}")
    return graphdef, state


def load_image(cfg, args) -> np.ndarray:
    """(H, W, 3) float32 [0,1] at the network input size."""
    if args.synthetic is not None:
        from ppn_tpu.data.synthetic import SyntheticPoseDataset

        ds = SyntheticPoseDataset(cfg, size=max(args.synthetic + 1, 1),
                                  seed=11)
        return ds[args.synthetic]["image"]
    from PIL import Image

    img = Image.open(args.image).convert("RGB")
    img = img.resize((cfg.model.insize[1], cfg.model.insize[0]),
                     Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def people_to_json(cfg, people) -> list:
    out = []
    kp_box = np.asarray(people.kp_box)
    kp_valid = np.asarray(people.kp_valid)
    kp_score = np.asarray(people.kp_score)
    for p in range(np.asarray(people.valid).shape[0]):
        if not np.asarray(people.valid)[p]:
            continue
        person = {"score": float(kp_score[p, 0]),
                  "instance_box": [round(float(v), 2) for v in kp_box[p, 0]],
                  "keypoints": {}}
        for c in range(1, cfg.model.num_classes):
            if kp_valid[p, c]:
                person["keypoints"][cfg.model.keypoint_names[c]] = {
                    "xy": [round(float(kp_box[p, c, 0]), 2),
                           round(float(kp_box[p, c, 1]), 2)],
                    "score": round(float(kp_score[p, c]), 4)}
        out.append(person)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="PPN single-image inference")
    p.add_argument("--config", default="mpii_r18_384")
    p.add_argument("--ini", default=None, metavar="PATH",
                   help="reference-style config.ini applied over --config")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--image", default=None)
    p.add_argument("--synthetic", type=int, default=None,
                   help="use synthetic sample N instead of --image")
    p.add_argument("--out", default=None, help="write visualization PNG")
    p.add_argument("--flip-tta", action="store_true",
                   help="horizontal-flip TTA: merge the mirrored "
                        "prediction in logit space (ops/tta.py)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="PATH=VALUE",
                   help="dotted-path config override, e.g. "
                        "model.detection_thresh=0.05 (repeatable)")
    args = p.parse_args(argv)
    if (args.image is None) == (args.synthetic is None):
        p.error("exactly one of --image / --synthetic is required")

    cfg = resolve_config(args.config, args.ini)
    if args.overrides:
        from ppn_tpu.configs.overrides import apply_overrides

        cfg = apply_overrides(cfg, args.overrides)
    from ppn_tpu.ops import postprocess as post
    from ppn_tpu.train import steps as st

    graphdef, state = load_state(cfg, args.ckpt_dir)
    image = load_image(cfg, args)
    forward = st.make_forward(cfg, graphdef, flip_tta=args.flip_tta)
    fm = forward(state, image[None])
    people = post.postprocess_batch_fast(cfg.model, fm)
    people = jax.device_get(jax.tree.map(lambda x: x[0], people))

    print(json.dumps(people_to_json(cfg, people), indent=1))
    if args.out:
        from ppn_tpu.utils.draw import draw_people

        draw_people(cfg.model, image, people).save(args.out)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Training CLI — the ``python train.py`` surface of the reference
(ref:train.py†, SURVEY.md §3.1), rebuilt TPU-native.

Examples:
    python -m ppn_tpu.apps.train --config tiny_test --data synthetic \
        --steps 200 --overfit 8
    python -m ppn_tpu.apps.train --config mpii_r18_384 --data mpii \
        --data-root /data/mpii
"""

from __future__ import annotations

import argparse
import dataclasses

from ppn_tpu.configs import get_config


def _persons_arg(s: str):
    """--num-persons value: int, or 'LO-HI' crowding range."""
    if "-" in s[1:]:
        lo, hi = s[1:].split("-", 1)
        return (int(s[0] + lo), int(hi))
    return int(s)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train a Pose Proposal Network")
    p.add_argument("--config", default="mpii_r18_384")
    p.add_argument("--ini", default=None, metavar="PATH",
                   help="reference-style config.ini applied over --config "
                        "(configs/ini_compat; same knob names as the "
                        "reference scheme)")
    p.add_argument("--data", default="synthetic",
                   choices=["synthetic", "mpii", "coco"])
    p.add_argument("--data-root", default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--overfit", type=int, default=None, metavar="N",
                   help="restrict training to N fixed samples "
                        "(the SURVEY.md §7.4 minimum slice)")
    p.add_argument("--num-persons", type=_persons_arg, default=None,
                   help="synthetic data: fixed persons per image, 0 for "
                        "random 1..max_persons, or 'LO-HI' for a uniform "
                        "crowding range (e.g. 3-8)")
    p.add_argument("--train-size", type=int, default=1024,
                   help="synthetic data: number of distinct training images")
    p.add_argument("--eval-every", type=int, default=None)
    p.add_argument("--ema-decay", type=float, default=None,
                   help="EMA of params for eval/inference (e.g. 0.999); "
                        "0 disables (default from config)")
    p.add_argument("--backbone", default=None,
                   choices=["resnet18", "resnet34", "resnet50"],
                   help="override the config's backbone")
    p.add_argument("--pretrained", default=None, metavar="PATH",
                   help="torchvision-format ResNet .pth to initialize the "
                        "backbone from (the reference starts from ImageNet "
                        "resnet18 weights)")
    p.add_argument("--init-npz", default=None, metavar="PATH",
                   help="fine-tune from a committed inference snapshot "
                        "(utils/params_io .npz): params+BN loaded, "
                        "optimizer/schedule fresh")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="PATH=VALUE",
                   help="generic dotted-path config override, applied after "
                        "all other flags (e.g. --set data.rotate_deg=20 "
                        "--set model.nms_thresh=0.45); repeatable")
    p.add_argument("--steps-per-call", type=int, default=None,
                   help="device-resident loop: SGD steps per dispatch "
                        "(lax.scan over the device cache; requires the "
                        "cache). Erases per-dispatch host overhead")
    p.add_argument("--device-cache", choices=["auto", "on", "off"],
                   default="auto",
                   help="hold the whole dataset in device memory and sample "
                        "batches there (host sends only indices). auto: on "
                        "when the dataset fits comfortably in HBM")
    return p


def make_datasets(cfg, args):
    """Returns (train_dataset, val_dataset)."""
    if args.data == "synthetic":
        from ppn_tpu.data.synthetic import SyntheticPoseDataset

        n = args.overfit or args.train_size
        np_ = getattr(args, "num_persons", None)
        if np_ == 0:       # 0 = random 1..max_persons crowding, the same
            np_ = None     # convention as tools/oracle_ceiling.py
        train = SyntheticPoseDataset(cfg, size=n, seed=cfg.train.seed,
                                     cache=True, num_persons=np_)
        val = (train if args.overfit
               else SyntheticPoseDataset(cfg, size=128, seed=10_000,
                                         cache=True, num_persons=np_))
        return train, val
    if args.data == "mpii":
        from ppn_tpu.data.mpii import make_mpii_datasets

        return make_mpii_datasets(cfg, args.data_root or cfg.data.root,
                                  overfit=args.overfit)
    if args.data == "coco":
        from ppn_tpu.data.coco import make_coco_datasets

        return make_coco_datasets(cfg, args.data_root or cfg.data.root,
                                  overfit=args.overfit)
    raise ValueError(args.data)


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.ini:
        from ppn_tpu.configs.ini_compat import load_ini

        cfg = load_ini(args.ini, base=args.config)
    else:
        cfg = get_config(args.config)

    tr = cfg.train
    updates = {}
    if args.steps is not None:
        updates["num_steps"] = args.steps
    if args.batch_size is not None:
        updates["batch_size"] = args.batch_size
    if args.lr is not None:
        updates["learning_rate"] = args.lr
    if args.seed is not None:
        updates["seed"] = args.seed
    if args.ckpt_dir is not None:
        updates["checkpoint_dir"] = args.ckpt_dir
    if args.no_resume:
        updates["resume"] = False
    if args.eval_every is not None:
        updates["eval_every"] = args.eval_every
    if args.ema_decay is not None:
        updates["ema_decay"] = args.ema_decay
    if args.steps_per_call is not None:
        updates["steps_per_call"] = args.steps_per_call
    if updates:
        tr = dataclasses.replace(tr, **updates)
        cfg = dataclasses.replace(cfg, train=tr)
    if args.backbone is not None:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, backbone=args.backbone))
    if args.overrides:
        from ppn_tpu.configs.overrides import apply_overrides

        cfg = apply_overrides(cfg, args.overrides)

    from ppn_tpu.data.pipeline import infinite_batches
    from ppn_tpu.train.trainer import Trainer

    train_ds, val_ds = make_datasets(cfg, args)
    Hc, Wc = cfg.model.insize
    px_bytes = 1 if cfg.data.transfer_uint8 else 4  # uint8 vs float32 cache
    est_bytes = len(train_ds) * Hc * Wc * 3 * px_bytes  # images dominate
    use_cache = (args.device_cache == "on"
                 or (args.device_cache == "auto" and est_bytes < 2 << 30))
    if use_cache:
        from ppn_tpu.data.device_cache import DeviceCache

        cache = DeviceCache(train_ds, image_uint8=cfg.data.transfer_uint8)
        print(f"device cache: {len(train_ds)} samples, "
              f"{cache.nbytes() / 1e6:.0f} MB on device")
        batches = cache.infinite_batches(cfg.train.batch_size,
                                         seed=cfg.train.seed)
    else:
        batches = infinite_batches(train_ds, cfg.train.batch_size,
                                   seed=cfg.train.seed,
                                   image_uint8=cfg.data.transfer_uint8)
    # --overfit memorizes fixed samples; augmentation would defeat that.
    augment = False if args.overfit else None
    trainer = Trainer(cfg, batches, val_dataset=val_ds, logdir=args.log_dir,
                      augment=augment, pretrained=args.pretrained,
                      device_cache=cache if use_cache else None,
                      init_npz=args.init_npz)
    try:
        final = trainer.run()
        print("final:", {k: round(v, 4) for k, v in final.items()})
        if val_ds is not None:
            print("eval:", {k: round(v, 4)
                            for k, v in trainer.evaluate().items()})
    finally:
        trainer.close()


if __name__ == "__main__":
    main()

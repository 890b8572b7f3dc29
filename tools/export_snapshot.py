"""Export a training checkpoint's eval weights to a committed f16 npz.

The committable-artifact path (VERDICT r3 directive #4 / r4 directive #4):
Orbax checkpoints live in /tmp and carry 4-5× the parameter bytes; this
exports just (eval params — EMA when tracked — + BN stats) via
utils/params_io.save_inference_npz, the format the committed-checkpoint CI
tests and `--init-npz` fine-tuning consume.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python \
        tools/export_snapshot.py --config coco_r18_384 \
        --ckpt-dir /tmp/r5_crowd_hero --ema \
        --out artifacts/crowd_hero_r5_ema_f16.npz
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--ema", action="store_true",
                   help="the checkpoint tracks EMA params (the template "
                        "tree must match the saved tree)")
    args = p.parse_args(argv)

    from ppn_tpu.configs import get_config
    from ppn_tpu.train import steps as st
    from ppn_tpu.train.checkpoint import Checkpointer
    from ppn_tpu.utils.params_io import save_inference_npz

    cfg = get_config(args.config)
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, ema_decay=0.999 if args.ema else 0.0))
    _, tmpl, _ = st.create_train_state(cfg)
    ckpt = Checkpointer(args.ckpt_dir)
    try:
        restored = ckpt.restore_latest(jax.device_get(tmpl))
    finally:
        ckpt.close()
    if restored is None:
        raise SystemExit(f"no checkpoint under {args.ckpt_dir}")
    step, state = restored
    n = save_inference_npz(args.out, state)
    mb = os.path.getsize(args.out) / 1e6
    print(f"step {step}: wrote {n} leaves "
          f"({'EMA' if state.ema_params is not None else 'raw'} params) "
          f"-> {args.out} ({mb:.1f} MB)")


if __name__ == "__main__":
    main()

"""Backward-pass stage attribution (VERDICT r4 directive #2).

`tools/fwd_split.py` proved the forward is ~80% MXU at the residual
blocks and roofline-bound at the stem; this tool gives the BACKWARD the
same treatment: per-stage fwd-only vs fwd+vjp device latency (param AND
input cotangents — conv weight grads are the heavy half of a conv bwd),
swept over batch sizes, to (a) name the stage behind the B=64 train-step
pathology (`docs/ARCHITECTURE.md` journal: 0.64 ms/img @64 vs 0.59 @32
and 0.46 @128) and (b) bound how far train MFU can rise.

Stages (ResNet-18/34 basic-block topology @384²):
    stem   conv7/s2+BN+relu+maxpool      (B, 384, 384, 3)  -> (B, 96, 96, 64)
    s1..s4 residual stages               spatial /2 each from 96²
    head   ConvBN3x3-512 + leaky + 1x1   (B, 12, 12, 512)
Each stage runs with train-mode BatchNorm (what the train step runs);
timing via the chained-slope probe (utils/profiling.device_latency_ms),
so numbers are device-honest. Writes artifacts/bwd_split_latest.json.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="mpii_r18_384")
    p.add_argument("--batches", default="32,64,128",
                   help="comma list of batch sizes to sweep")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--stages", default="stem,s1,s2,s3,s4,head")
    p.add_argument("--fwd-only", action="store_true",
                   help="skip the vjp probes (fwd rows only)")
    p.add_argument("--skip-fwd", action="store_true",
                   help="fwd+bwd rows only — halves the remote-compile "
                        "count (each probe compiles 2 chained programs); "
                        "use for the batch-sweep anomaly hunt, then rerun "
                        "the culprit stage without it")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from ppn_tpu.configs import get_config
    from ppn_tpu.train import steps as st
    from ppn_tpu.utils.profiling import device_latency_ms

    cfg = get_config(args.config)
    model = st.create_model(cfg)  # train mode (BN batch stats), bf16
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    H, W = cfg.model.insize
    assert cfg.model.backbone in ("resnet18", "resnet34"), (
        "stage table below assumes basic-block stages")

    def merged(pp):
        # re-box the BN stats at this trace level (train-mode BN mutates
        # them; flax forbids mutating outer-trace Variables)
        m = nnx.merge(graphdef, pp, jax.tree.map(lambda x: x, rest))
        m.train()
        return m

    nb = len(model.backbone.blocks) // 4  # blocks per stage (2 for r18)

    def stage_fn(name):
        if name == "stem":
            def f(m, x):
                y = nnx.relu(m.backbone.stem(x))
                return nnx.max_pool(y, window_shape=(3, 3), strides=(2, 2),
                                    padding="SAME")
            return f
        if name.startswith("s"):
            i = int(name[1:]) - 1

            def f(m, x, i=i):
                for blk in m.backbone.blocks[i * nb:(i + 1) * nb]:
                    x = blk(x)
                return x
            return f
        if name == "head":
            return lambda m, x: m.head(x)
        raise ValueError(name)

    widths = (64, 128, 256, 512)

    def stage_input(name, B):
        if name == "stem":
            return jnp.zeros((B, H, W, 3), jnp.bfloat16)
        if name.startswith("s"):
            i = int(name[1:]) - 1
            # stage input = previous stage's output: s1/s2 enter at H/4
            # (96² @384; s2's first block strides to 48²), s3 at 48², s4
            # at 24²; channels follow the widths table one stage behind
            sp = (H // 4) >> max(0, i - 1)
            cin = widths[max(0, i - 1)]
            return jnp.zeros((B, sp, sp, cin), jnp.bfloat16)
        if name == "head":
            return jnp.zeros((B, H // 32, W // 32, widths[3]), jnp.bfloat16)
        raise ValueError(name)

    rec = {"config": args.config, "iters": args.iters, "batches": []}
    for B in [int(b) for b in args.batches.split(",")]:
        row = {"batch": B, "stages": {}}
        total_f = total_fb = 0.0
        for name in args.stages.split(","):
            f = stage_fn(name)
            x = stage_input(name, B)

            def fwd_body(x, f=f):
                return f(merged(params), x)

            d_f = (None if args.skip_fwd
                   else device_latency_ms(fwd_body, x, iters=args.iters))

            if args.fwd_only:
                row["stages"][name] = {"fwd_ms": round(d_f, 3)}
                total_f += d_f
                print(f"B={B} {name}: fwd {d_f:.3f} ms", flush=True)
                continue

            # Cotangent = y itself, NOT ones: a constant cotangent lets
            # XLA fold whole backward chains (and with the forward output
            # otherwise dead, delete the forward too — observed: the stem
            # probe read 0.03 ms). y as cotangent keeps every stage's
            # forward and backward live with realistic data flow.
            # Return the FULL gradient tree: returning only dx (or one dp
            # leaf) lets XLA dead-code every other gradient — the weight-
            # grad convs are separate computations from the input-grad
            # convs, and training needs them all. (Observed: a one-leaf
            # return read 0.03 ms for the whole stem.)
            if name == "stem":
                # The image is DATA: real training never computes
                # dL/d(input) for the first conv (XLA prunes it), and that
                # input-gradient is a full-resolution transposed conv back
                # to (B, H, W, 3) — ~16 ms of work the train step does not
                # contain. Params-only VJP here; every later stage's dx
                # genuinely flows in training and stays included.
                def fwdbwd_body(x, f=f):
                    y, vjp = jax.vjp(
                        lambda pp: f(merged(pp), x), params)
                    (dp,) = vjp(y)
                    return dp
            else:
                def fwdbwd_body(x, f=f):
                    y, vjp = jax.vjp(
                        lambda pp, xx: f(merged(pp), xx), params, x)
                    dp, dx = vjp(y)
                    return dp, dx

            d_fb = device_latency_ms(fwdbwd_body, x, iters=args.iters)
            row["stages"][name] = {
                "fwdbwd_ms": round(d_fb, 3),
                "ms_per_img_fwdbwd": round(d_fb / B, 4),
            }
            if d_f is not None:
                row["stages"][name].update({
                    "fwd_ms": round(d_f, 3),
                    "bwd_ms": round(d_fb - d_f, 3),
                    "bwd_over_fwd": (round((d_fb - d_f) / d_f, 2)
                                     if d_f else None),
                })
                total_f += d_f
            total_fb += d_fb
            print(f"B={B} {name}: fwd "
                  f"{'-' if d_f is None else f'{d_f:.3f}'} | "
                  f"fwd+bwd {d_fb:.3f} ms", flush=True)
        if not args.skip_fwd:
            row["sum_fwd_ms"] = round(total_f, 3)
        if not args.fwd_only:
            row["sum_fwdbwd_ms"] = round(total_fb, 3)
        rec["batches"].append(row)

    from tools._artifact import write_artifact

    write_artifact(rec, "bwd_split", args.out)


if __name__ == "__main__":
    main()

"""Stage attribution for the batch-packed postprocess kernel.

Times the kernel with stages ablated (the `skip` flag of
ops/pallas_post_packed.py) so regressions can be pinned to a stage:

    full        — everything
    no_nms      — suppression-mask build + fixpoint skipped
    no_window   — limb-window maps (and their e DMA stream) skipped
    no_walk     — tree walk + box gather skipped
    decode_only — all three skipped: XLA prep transposes + decode floor

    python tools/packed_split.py [--batch 128] [--config mpii_r18_384]

Note: per-call timings through the remote tunnel include a ~1.8 ms
dispatch floor; differences between variants are still valid.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="mpii_r18_384")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--interpret", action="store_true",
                   help="Pallas interpret mode (auto-enabled off-TPU)")
    p.add_argument("--bf16", action="store_true",
                   help="exact_bf16 prep views (the serving path)")
    p.add_argument("--q", type=int, default=128,
                   help="quantity-block width (images/group = q/max(K1,L))")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    interpret = args.interpret or jax.default_backend() != "tpu"

    from ppn_tpu.configs import get_config
    from ppn_tpu.ops.pallas_post_packed import postprocess_batch_packed

    cfg = get_config(args.config).model
    rng = np.random.default_rng(0)
    fm = jax.device_put(rng.normal(0, 2, (args.batch, *cfg.outsize,
                                          cfg.num_channels)
                                   ).astype(np.float32))

    def scalarize(ppl):
        return (ppl.kp_box.sum() + ppl.kp_score.sum()
                + ppl.valid.astype(jnp.float32).sum())

    def timed(fn):
        out = fn(fm)
        jax.block_until_ready(out)
        float(jax.device_get(out))

        def once():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = fn(fm)
            jax.block_until_ready(o)
            float(jax.device_get(o))
            return (time.perf_counter() - t0) / args.iters

        once()
        return min(once() for _ in range(3))

    results = {}
    for name, sk in (("full", frozenset()),
                     ("no_nms", frozenset({"nms"})),
                     ("no_window", frozenset({"window"})),
                     ("no_walk", frozenset({"walk"})),
                     # seeds can only be skipped together with the walk
                     # (Mosaic crashes strided-slicing the then-constant
                     # cells_a); seeds_ms is the marginal vs no_walk
                     ("no_seeds_walk", frozenset({"seeds", "walk"})),
                     # masks built, fixpoint waves skipped
                     ("no_nmsfix", frozenset({"nmsfix"})),
                     ("decode_only",
                      frozenset({"nms", "window", "walk", "seeds"}))):
        fn = jax.jit(lambda x, sk=sk: scalarize(
            postprocess_batch_packed(cfg, x, interpret, sk,
                                     exact_bf16=args.bf16, q=args.q)))
        results[name] = round(timed(fn) * 1e3, 3)
        print(f"{name}: {results[name]} ms @B={args.batch}", flush=True)

    # Clean prep-vs-kernel split: time view materialization alone (as jit
    # OUTPUTS the transposes must hit HBM — a fused-reduce probe would let
    # XLA elide them) and the kernel alone on prebuilt device views.
    from ppn_tpu.ops.pallas_post_packed import packed_call, packed_views

    views_fn = jax.jit(lambda x: packed_views(cfg, x, exact_bf16=args.bf16,
                                              q=args.q))

    def timed_views():
        o = views_fn(fm)
        jax.block_until_ready(o)
        float(jax.device_get(o[1][0, 0, 0]))

        def once():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = views_fn(fm)
            jax.block_until_ready(o)
            float(jax.device_get(o[1][0, 0, 0]))
            return (time.perf_counter() - t0) / args.iters

        once()
        return min(once() for _ in range(3))

    results["views"] = round(timed_views() * 1e3, 3)
    print(f"views: {results['views']} ms @B={args.batch}", flush=True)

    dev_views = jax.block_until_ready(views_fn(fm))
    kern_fn = jax.jit(lambda v: scalarize(
        packed_call(cfg, args.batch, v, interpret, frozenset(),
                    exact_bf16=args.bf16, q=args.q)))

    def timed_kernel():
        o = kern_fn(dev_views)
        jax.block_until_ready(o)
        float(jax.device_get(o))

        def once():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                o = kern_fn(dev_views)
            jax.block_until_ready(o)
            float(jax.device_get(o))
            return (time.perf_counter() - t0) / args.iters

        once()
        return min(once() for _ in range(3))

    results["kernel"] = round(timed_kernel() * 1e3, 3)
    print(f"kernel: {results['kernel']} ms @B={args.batch}", flush=True)

    full = results["full"]
    print(json.dumps({
        "batch": args.batch,
        "full_ms": full,
        "nms_ms": round(full - results["no_nms"], 3),
        "nms_waves_ms": round(full - results["no_nmsfix"], 3),
        "window_ms": round(full - results["no_window"], 3),
        "walk_ms": round(full - results["no_walk"], 3),
        "seeds_ms": round(results["no_walk"] - results["no_seeds_walk"], 3),
        "prep_and_decode_ms": results["decode_only"],
        "views_ms": results["views"],
        "kernel_ms": results["kernel"],
    }))
    from tools._artifact import write_artifact

    write_artifact(dict(results, batch=args.batch), "packed_split",
                   getattr(args, "out", None))


if __name__ == "__main__":
    main()

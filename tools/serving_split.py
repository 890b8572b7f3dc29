"""Attribute serving-batch time: model forward vs fused postprocess.

Times three jitted stages at the serving batch (forward-only,
postprocess-only on a precomputed feature map, full pipeline) so the
headline img/s number has a cost breakdown — the input for deciding where
the next kernel-optimization effort goes.

    python tools/serving_split.py [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="mpii_r18_384")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ppn_tpu.bench.suite import _flagship
    from ppn_tpu.ops import postprocess as post
    from ppn_tpu.utils.profiling import timeit

    cfg, graphdef, params, rest = _flagship(args.config)
    from flax import nnx

    @jax.jit
    def forward(params, rest, images):
        m = nnx.merge(graphdef, params, rest)
        return m(images)

    @jax.jit
    def forward_scalar(params, rest, images):
        # timing variant: reduce on device so the sync fetches one scalar,
        # not the ~0.8 MB/img feature map over the host link (CLAUDE.md:
        # never time code that fetches big arrays)
        m = nnx.merge(graphdef, params, rest)
        return m(images).astype(jnp.float32).sum()

    def _scalarize(people):
        # reduce to one scalar on device: syncs fetch ~4 bytes, not the
        # ~1 MB People pytree over the host link
        return (people.kp_box.sum()
                + people.kp_score.sum()
                + people.valid.astype(jnp.float32).sum())

    @jax.jit
    def pp(fm):
        return _scalarize(post.postprocess_batch_fast_fn(
            cfg.model, fm, exact_bf16=True))

    @jax.jit
    def full(params, rest, images):
        return _scalarize(post.postprocess_batch_fast_fn(
            cfg.model, nnx.merge(graphdef, params, rest)(images),
            exact_bf16=True))

    img = jax.device_put(np.random.default_rng(0).random(
        (args.batch, *cfg.model.insize, 3), np.float32))
    fm = jax.block_until_ready(forward(params, rest, img))

    t_fwd = timeit(forward_scalar, params, rest, img, iters=args.iters)
    t_pp = timeit(pp, fm, iters=args.iters)
    t_full = timeit(full, params, rest, img, iters=args.iters)

    # device-only (chained-slope) numbers: per-call timings through the
    # remote tunnel sit on a ~1.8 ms dispatch floor; these subtract it
    from ppn_tpu.utils.profiling import device_latency_ms

    def fwd_body(params, rest, images):
        return nnx.merge(graphdef, params, rest)(images).astype(
            jnp.float32).sum()

    def pp_body(fmx):
        return _scalarize(post.postprocess_batch_fast_fn(
            cfg.model, fmx, exact_bf16=True))

    def full_body(params, rest, images):
        return _scalarize(post.postprocess_batch_fast_fn(
            cfg.model, nnx.merge(graphdef, params, rest)(images),
            exact_bf16=True))

    d_fwd = device_latency_ms(fwd_body, params, rest, img, iters=8)
    d_pp = device_latency_ms(pp_body, fm, iters=16)
    d_full = device_latency_ms(full_body, params, rest, img, iters=8)

    rec = {
        "batch": args.batch,
        "forward_ms": round(t_fwd * 1e3, 3),
        "postprocess_ms": round(t_pp * 1e3, 3),
        "full_ms": round(t_full * 1e3, 3),
        "postprocess_share_pct": round(100 * d_pp / d_full, 1),
        "images_per_sec_full": round(args.batch / t_full, 1),
        "device_forward_ms": round(d_fwd, 3),
        "device_postprocess_ms": round(d_pp, 3),
        "device_full_ms": round(d_full, 3),
        "device_images_per_sec": round(args.batch / d_full * 1e3, 1),
        "includes_tunnel_rtt_in_ms_fields": True,
    }
    print(json.dumps(rec))
    from tools._artifact import write_artifact

    write_artifact(rec, "serving_split", getattr(args, "out", None))


if __name__ == "__main__":
    main()

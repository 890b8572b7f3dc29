"""Stage attribution for the fused serving pipeline (transposed-head path).

Splits the bench.py B=128 pipeline into: backbone+head GEMMs
(packed_feature), view massage (views_from_packed_head), and the packed
kernel — all device-honest via the chained-slope method.

    python tools/fused_split.py [--batch 128] [--q 256]
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
    p.add_argument("--q", type=int, default=256)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args(argv)

    import jax
    from flax import nnx

    from ppn_tpu.configs import get_config
    from ppn_tpu.ops import postprocess as post
    from ppn_tpu.ops.pallas_post_packed import (packed_call,
                                                views_from_packed_head)
    from ppn_tpu.train import steps as st
    from ppn_tpu.utils.profiling import device_latency_ms

    cfg = get_config(args.config)
    model = st.create_model(cfg)
    model.eval()
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    q = args.q
    B = args.batch

    images = jax.device_put(np.random.default_rng(0).random(
        (B, *cfg.model.insize, 3), np.float32))

    def fused(params, rest, images):
        m = nnx.merge(graphdef, params, rest)
        return post.forward_postprocess_fast_fn(cfg.model, m, images)

    def head_only(params, rest, images):
        m = nnx.merge(graphdef, params, rest)
        return m.packed_feature(images, q=q)

    def head_views(params, rest, images):
        m = nnx.merge(graphdef, params, rest)
        box_t, e_t = m.packed_feature(images, q=q)
        return views_from_packed_head(cfg.model, box_t, e_t, q=q)[1:]

    def trunk_h(params, rest, images):
        # backbone + head conv block (everything before the 1×1 GEMM)
        import jax.numpy as jnp

        m = nnx.merge(graphdef, params, rest)
        x = (images - jnp.asarray(m.MEAN, images.dtype)) / jnp.asarray(
            m.STD, images.dtype)
        f = m.backbone(x.astype(m.dtype))
        return nnx.leaky_relu(m.head.block(f), negative_slope=0.1)

    results = {
        "batch": B,
        "q": q,
        "fused_ms": device_latency_ms(fused, params, rest, images,
                                      iters=args.iters),
        "trunk_h_ms": device_latency_ms(trunk_h, params, rest, images,
                                        iters=args.iters),
        "packed_feature_ms": device_latency_ms(head_only, params, rest,
                                               images, iters=args.iters),
        "feature_plus_views_ms": device_latency_ms(head_views, params, rest,
                                                   images, iters=args.iters),
    }

    # kernel alone on prebuilt device views
    m = nnx.merge(graphdef, params, rest)
    box_t, e_t = jax.jit(lambda im: m.packed_feature(im, q=q))(images)
    views = jax.block_until_ready(
        jax.jit(lambda b, e: views_from_packed_head(cfg.model, b, e, q=q)
                )(box_t, e_t))

    def kern(b, e):
        return packed_call(cfg.model, B, (None, b, e), exact_bf16=True, q=q)

    results["kernel_ms"] = device_latency_ms(kern, views[1], views[2],
                                             iters=args.iters)
    for k, v in results.items():
        if k.endswith("_ms"):
            results[k] = round(v, 3)
    results["head_gemm_delta_ms"] = round(
        results["packed_feature_ms"] - results["trunk_h_ms"], 3)
    results["views_delta_ms"] = round(
        results["feature_plus_views_ms"] - results["packed_feature_ms"], 3)
    results["kernel_delta_ms"] = round(
        results["fused_ms"] - results["feature_plus_views_ms"], 3)
    print(json.dumps(results))
    from tools._artifact import write_artifact

    write_artifact(results, "fused_split", getattr(args, "out", None))


if __name__ == "__main__":
    main()

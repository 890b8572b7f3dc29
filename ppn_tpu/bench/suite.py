"""The five BASELINE.json benchmark configs as a reproducible suite
(SURVEY.md §6):

1. Single 384×384 image latency: forward + grid decode + greedy parse.
2. Batched (B=32) inference throughput with NMS + parsing.
3. Training step (fwd/bwd + multi-term loss + augmentation), data-parallel.
4. COCO multi-person pipeline (K=17, larger limb graph).
5. Streaming 720p video: on-device resize + continuous inference (p50).

Run:  python -m ppn_tpu.bench.suite [--configs 1,2,5] [--out results.json]
Each record: {"config", "metric", "value", "unit", ...}.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List

import jax
import numpy as np


def _flagship(config_name="mpii_r18_384"):
    from flax import nnx

    from ppn_tpu.configs import get_config
    from ppn_tpu.train import steps as st

    cfg = get_config(config_name)
    model = st.create_model(cfg)
    model.eval()
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    return cfg, graphdef, params, rest


def _pipeline_fn(cfg, graphdef):
    from flax import nnx

    from ppn_tpu.ops import postprocess as post

    @jax.jit
    def pipeline(params, rest, images):
        m = nnx.merge(graphdef, params, rest)
        fm = m(images)
        p = post.postprocess_batch_fast_fn(cfg.model, fm)
        return p.kp_box, p.kp_score, p.valid

    return pipeline


def bench_single_latency() -> Dict:
    from ppn_tpu.utils.profiling import latency_percentiles

    cfg, graphdef, params, rest = _flagship()
    pipeline = _pipeline_fn(cfg, graphdef)
    img = jax.device_put(np.random.default_rng(0).random(
        (1, *cfg.model.insize, 3), np.float32))
    lat = latency_percentiles(pipeline, params, rest, img, calls=50)
    return {"config": "1_single_image_latency",
            "metric": "p50_latency", "value": round(lat["p50_ms"], 3),
            "unit": "ms", **{k: round(v, 3) for k, v in lat.items()}}


def _throughput(config_name: str, batch: int) -> float:
    from ppn_tpu.utils.profiling import timeit

    cfg, graphdef, params, rest = _flagship(config_name)
    pipeline = _pipeline_fn(cfg, graphdef)
    imgs = jax.device_put(np.random.default_rng(0).random(
        (batch, *cfg.model.insize, 3), np.float32))
    t = timeit(pipeline, params, rest, imgs, iters=30)
    return batch / t


def bench_batched_inference(batch: int = 32) -> Dict:
    ips = _throughput("mpii_r18_384", batch)
    return {"config": "2_batched_inference",
            "metric": "images_per_sec_chip", "value": round(ips, 2),
            "unit": "images/sec", "batch": batch,
            "vs_baseline": round(ips / 500.0, 4)}


def bench_train_step(batch: int = 32) -> Dict:
    from ppn_tpu.configs import get_config
    from ppn_tpu.data.pipeline import collate
    from ppn_tpu.data.synthetic import SyntheticPoseDataset
    from ppn_tpu.parallel import make_mesh, replicate, shard_batch
    from ppn_tpu.train import steps as st
    from ppn_tpu.utils.profiling import timeit
    import dataclasses

    cfg = get_config("mpii_r18_384")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=batch))
    mesh = make_mesh((-1,), ("data",))
    graphdef, state, tx = st.create_train_state(cfg)
    state = replicate(mesh, state)
    step = st.make_train_step(cfg, graphdef, tx, augment=True)

    ds = SyntheticPoseDataset(cfg, size=batch, seed=0)
    batch_np = collate([ds[i] for i in range(batch)])
    batch_dev = shard_batch(mesh, {k: batch_np[k] for k in (
        "image", "keypoints", "visible", "bboxes", "valid")})

    state, out0 = step(state, batch_dev)
    # force compile+first-run completion: this backend compiles
    # asynchronously, so an unsynced warmup leaks compile time into the loop
    jax.device_get(out0["loss_total"])

    import time

    s = state
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        s, out = step(s, batch_dev)
    jax.device_get(out["loss_total"])
    t = (time.perf_counter() - t0) / iters
    return {"config": "3_train_step",
            "metric": "train_images_per_sec", "value": round(batch / t, 2),
            "unit": "images/sec", "batch": batch,
            "devices": mesh.devices.size}


def bench_coco_pipeline(batch: int = 32) -> Dict:
    ips = _throughput("coco_r18_384", batch)
    return {"config": "4_coco_pipeline",
            "metric": "images_per_sec_chip", "value": round(ips, 2),
            "unit": "images/sec", "batch": batch}


def bench_video_stream() -> Dict:
    from flax import nnx

    from ppn_tpu.ops import postprocess as post
    from ppn_tpu.ops.image import resize_bilinear
    from ppn_tpu.utils.profiling import latency_percentiles

    cfg, graphdef, params, rest = _flagship()

    @jax.jit
    def frame_pipeline(params, rest, frame_u8):
        img = frame_u8.astype(np.float32) / 255.0
        img = resize_bilinear(img, cfg.model.insize)
        m = nnx.merge(graphdef, params, rest)
        fm = m(img[None])
        p = post.postprocess_single_fn(cfg.model, fm[0])
        return p.kp_box, p.valid

    frame = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (720, 1280, 3), dtype=np.uint8))
    lat = latency_percentiles(frame_pipeline, params, rest, frame, calls=50)
    return {"config": "5_video_stream_720p",
            "metric": "p50_latency", "value": round(lat["p50_ms"], 3),
            "unit": "ms", **{k: round(v, 3) for k, v in lat.items()}}


_BENCHES = {
    "1": bench_single_latency,
    "2": bench_batched_inference,
    "3": bench_train_step,
    "4": bench_coco_pipeline,
    "5": bench_video_stream,
}


def main(argv=None):
    p = argparse.ArgumentParser(description="PPN benchmark suite")
    p.add_argument("--configs", default="1,2,3,4,5")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    results: List[Dict] = []
    for c in args.configs.split(","):
        c = c.strip()
        print(f"running benchmark {c}...", flush=True)
        rec = _BENCHES[c]()
        print(json.dumps(rec), flush=True)
        results.append(rec)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

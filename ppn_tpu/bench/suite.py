"""The five BASELINE.json benchmark configs as a reproducible suite
(SURVEY.md §6):

1. Single 384×384 image latency: forward + grid decode + greedy parse.
2. Batched (B=32) inference throughput with NMS + parsing.
3. Training step (fwd/bwd + multi-term loss + augmentation), data-parallel.
4. COCO multi-person pipeline (K=17, larger limb graph).
5. Streaming 720p video: on-device resize + continuous inference (p50).
6. JPEG→poses: native C++ decode pool → device → poses (the BASELINE
   latency metric as literally defined).
7. Micro-batched serving: N client threads → PoseServer batch buckets
   (beyond-BASELINE; ppn_tpu/serving.py).

Run:  python -m ppn_tpu.bench.suite [--configs 1,2,5] [--out results.json]
Each record: {"config", "metric", "value", "unit", ...}.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List

import jax
import jax.numpy as jnp
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


def _pipeline_body(cfg, graphdef):
    """Unjitted forward+postprocess body (jit at the call site; the
    unjitted body also feeds device_latency_ms's chained-call probe)."""
    from flax import nnx

    from ppn_tpu.ops import postprocess as post

    def body(params, rest, images):
        m = nnx.merge(graphdef, params, rest)
        # wide batches take the transposed-head GEMM fast path (the head
        # emits the packed kernel's views directly — ops/postprocess.py)
        p = post.forward_postprocess_fast_fn(cfg.model, m, images)
        return p.kp_box, p.kp_score, p.valid

    return body


def _pipeline_fn(cfg, graphdef):
    return jax.jit(_pipeline_body(cfg, graphdef))


_SESSION_REF: Dict = {}


def session_ref_p50_ms() -> float:
    """Same-session config-1 reference p50 (VERDICT r4 directive #7).

    The tunneled rig's end-to-end latency drifts ±30% across sessions
    (r4's config-6 "regression" was rig drift, argued only from a
    cross-day config-1 memory). Every latency record now embeds this
    probe — the config-1 single-image end-to-end p50, measured once per
    process — so drift attribution is self-contained: compare a record's
    value *relative to its own* session_ref_p50_ms across rounds.
    """
    if "p50" not in _SESSION_REF:
        from ppn_tpu.utils.profiling import latency_percentiles

        cfg, graphdef, params, rest = _flagship()
        pipeline = _pipeline_fn(cfg, graphdef)
        img = jax.device_put(np.random.default_rng(0).random(
            (1, *cfg.model.insize, 3), np.float32))
        lat = latency_percentiles(pipeline, params, rest, img, calls=30)
        _SESSION_REF["p50"] = round(lat["p50_ms"], 3)
    return _SESSION_REF["p50"]


def bench_single_latency() -> Dict:
    from ppn_tpu.utils.profiling import device_latency_ms, latency_percentiles

    cfg, graphdef, params, rest = _flagship()
    body = _pipeline_body(cfg, graphdef)
    pipeline = jax.jit(body)
    img = jax.device_put(np.random.default_rng(0).random(
        (1, *cfg.model.insize, 3), np.float32))
    lat = latency_percentiles(pipeline, params, rest, img, calls=50)
    # device-only per-call latency: comparable to a local deployment —
    # the end-to-end p50 above includes the host↔device round trip
    # (here: a network tunnel; VERDICT r2 weak #3)
    dev_ms = device_latency_ms(body, params, rest, img)
    # config 1 IS the session reference; record its own p50 as such
    _SESSION_REF.setdefault("p50", round(lat["p50_ms"], 3))
    return {"config": "1_single_image_latency",
            "metric": "p50_latency", "value": round(lat["p50_ms"], 3),
            "unit": "ms", **{k: round(v, 3) for k, v in lat.items()},
            "device_ms": round(dev_ms, 3), "includes_tunnel_rtt": True,
            "session_ref_p50_ms": _SESSION_REF["p50"]}


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

    # Device-honest step time: the host loop above pays a per-dispatch
    # pytree-enqueue cost through the remote tunnel (~4 ms/step on this
    # rig — tools/train_split.py attribution); chain the whole stateless
    # step body (augment+encode+fwd/bwd+optimizer+EMA) on device instead.
    import optax
    from flax import nnx

    from ppn_tpu.ops import encode as enc
    from ppn_tpu.ops.augment import augment_batch
    from ppn_tpu.train.loss import ppn_loss
    from ppn_tpu.utils.profiling import device_latency_ms

    m = cfg.model
    params, rest = s.params, s.rest
    opt_state, rng = s.opt_state, s.rng

    def full_body(kp, vis, bb, val, img):
        out = augment_batch(m, cfg.data, rng, {
            "image": img, "keypoints": kp, "visible": vis,
            "bboxes": bb, "valid": val})
        targets = enc.encode_batch(m, out["keypoints"], out["visible"],
                                   out["bboxes"], out["valid"])

        def loss_fn(pp):
            model = nnx.merge(graphdef, pp, jax.tree.map(lambda x: x, rest))
            return ppn_loss(m, model(out["image"]), targets)[0]

        total, g = jax.value_and_grad(loss_fn)(params)
        updates, _ = tx.update(g, opt_state, params)
        newp = optax.apply_updates(params, updates)
        d = cfg.train.ema_decay
        if d > 0:
            newp = jax.tree.map(lambda e, q: e * d + q * (1.0 - d),
                                params, newp)
        return total + optax.global_norm(g) + jax.tree.leaves(newp)[0].sum()

    dev_ms = device_latency_ms(
        full_body, batch_dev["keypoints"], batch_dev["visible"],
        batch_dev["bboxes"], batch_dev["valid"], batch_dev["image"],
        iters=8)

    return {"config": "3_train_step",
            "metric": "train_images_per_sec",
            "value": round(batch / dev_ms * 1e3, 2),
            "unit": "images/sec", "batch": batch,
            "devices": mesh.devices.size,
            "device_step_ms": round(dev_ms, 3),
            "host_loop_images_per_sec": round(batch / t, 2),
            "host_loop_includes_tunnel_rtt": True}


def bench_train_device_resident(batch: int = 128, k: int = 8,
                                cache_size: int = 256,
                                config_name: str = "mpii_r18_384") -> Dict:
    """Config 3c: the device-resident training loop end to end — the
    dataset lives in HBM (data/device_cache.DeviceCache), each dispatch
    scans ``k`` SGD steps (train/steps.py make_multi_train_step), and the
    host sends one (k, B) int32 index block per dispatch. This is the
    REAL trainer hot loop (host-timed, everything included): the number
    config 3/3b's device-honest chained body predicts, delivered without
    per-dispatch host/tunnel overhead.
    """
    import dataclasses
    import time

    from ppn_tpu.configs import get_config
    from ppn_tpu.data.device_cache import DeviceCache
    from ppn_tpu.data.synthetic import SyntheticPoseDataset
    from ppn_tpu.parallel import make_mesh, replicate
    from ppn_tpu.train import steps as st

    cfg = get_config(config_name)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=batch,
                                       steps_per_call=k))
    mesh = make_mesh((-1,), ("data",))
    graphdef, state, tx = st.create_train_state(cfg)
    state = replicate(mesh, state)
    ds = SyntheticPoseDataset(cfg, size=cache_size, seed=0)
    cache = DeviceCache(ds, image_uint8=True,
                        mesh=mesh if mesh.devices.size > 1 else None)

    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    multi = st.make_multi_train_step(cfg, graphdef, tx, augment=True,
                                     steps_per_call=k)
    rng = np.random.default_rng(0)

    def block():
        return jnp.asarray(
            rng.integers(0, cache.size, (k, batch)).astype(np.int32))

    state, terms = multi(state, cache.data, block(), sharding)
    jax.device_get(terms["loss_total"])  # compile + first run complete

    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        state, terms = multi(state, cache.data, block(), sharding)
    jax.device_get(terms["loss_total"])
    per_step_ms = (time.perf_counter() - t0) / (iters * k) * 1e3

    return {"config": "3c_train_device_resident",
            "metric": "train_images_per_sec",
            "value": round(batch / per_step_ms * 1e3, 2),
            "unit": "images/sec", "batch": batch, "steps_per_call": k,
            "devices": mesh.devices.size,
            "host_loop_step_ms": round(per_step_ms, 3),
            "note": "host-timed end-to-end; one (k,B) int32 block per "
                    "dispatch — per-dispatch overhead amortized over k "
                    "steps"}


def bench_coco_pipeline(batch: int = 32) -> Dict:
    ips = _throughput("coco_r18_384", batch)
    return {"config": "4_coco_pipeline",
            "metric": "images_per_sec_chip", "value": round(ips, 2),
            "unit": "images/sec", "batch": batch}


def bench_coco_crowded(batch: int = 128) -> Dict:
    """Config 4b (VERDICT r4 directive #5): the COCO crowded operating
    point — coco_r18_384_crowded (det 0.02 / nms 0.6 per the r4 crowding
    study) — at the serving batch B=128 through the packed fast path.
    K=17/L=18 changes the packing geometry vs the MPII flagship, so this
    is the crowded-parsing stress record, device-honest + MFU."""
    import os

    from ppn_tpu.utils.profiling import device_latency_ms, timeit

    cfg, graphdef, params, rest = _flagship("coco_r18_384_crowded")
    body = _pipeline_body(cfg, graphdef)
    pipeline = jax.jit(body)
    imgs = jax.device_put(np.random.default_rng(0).random(
        (batch, *cfg.model.insize, 3), np.float32))
    t = timeit(pipeline, params, rest, imgs, iters=20)
    dev_ms = device_latency_ms(body, params, rest, imgs, iters=10)
    ips = batch / dev_ms * 1e3
    try:
        cost = pipeline.lower(params, rest, imgs).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost["flops"]) / batch
    except Exception:
        flops = 10.7e9
    peak = float(os.environ.get("PPN_PEAK_TFLOPS", "197")) * 1e12
    return {"config": "4b_coco_crowded_serving_batch",
            "metric": "images_per_sec_chip", "value": round(ips, 2),
            "unit": "images/sec", "batch": batch,
            "preset": "coco_r18_384_crowded",
            "det_thresh": cfg.model.detection_thresh,
            "nms_thresh": cfg.model.nms_thresh,
            "device_batch_ms": round(dev_ms, 3),
            "mfu_pct": round(flops * ips / peak * 100.0, 2),
            "host_loop_images_per_sec": round(batch / t, 2),
            "host_loop_includes_tunnel_rtt": True}


def bench_video_stream(frames: int = 64, pre_resize: bool = False) -> Dict:
    """Measures the ACTUAL streaming loop (apps/video.py: capture thread,
    latest-frame slot, double-buffered dispatch/fetch overlap) on synthetic
    720p frames — suite and app report the same number (VERDICT r2 weak
    #4) — plus the device-only per-frame latency of the frame pipeline.

    ``pre_resize=True`` (config 5p) adds the host pre-upload downscale
    (VERDICT r4 directive #6): 0.44 MB/frame instead of 2.76 MB through
    the tunnel — the rig-side mitigation for the link-bound stream."""
    import contextlib
    import io

    from flax import nnx

    from ppn_tpu.apps import video
    from ppn_tpu.ops import postprocess as post
    from ppn_tpu.ops.image import resize_bilinear
    from ppn_tpu.utils.profiling import device_latency_ms

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        video.main(["--config", "mpii_r18_384", "--source", "synthetic",
                    "--frames", str(frames), "--json"]
                   + (["--pre-resize"] if pre_resize else []))
    summary = json.loads(
        [ln for ln in buf.getvalue().splitlines()
         if ln.startswith("{")][-1])

    cfg, graphdef, params, rest = _flagship()

    def frame_body(params, rest, frame_u8):
        img = frame_u8.astype(np.float32) / 255.0
        img = resize_bilinear(img, cfg.model.insize)
        m = nnx.merge(graphdef, params, rest)
        fm = m(img[None])
        p = post.postprocess_single_fn(cfg.model, fm[0])
        return p.kp_box, p.valid

    frame = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (720, 1280, 3), dtype=np.uint8))
    dev_ms = device_latency_ms(frame_body, params, rest, frame)

    return {"config": ("5p_video_stream_720p_preresize" if pre_resize
                       else "5_video_stream_720p"),
            "metric": "p50_latency", "value": summary["p50_ms"],
            "unit": "ms", "p50_ms": summary["p50_ms"],
            "p90_ms": summary["p90_ms"], "fps": summary["fps"],
            "frames": summary["frames"],
            "pre_resize": pre_resize,
            "device_ms": round(dev_ms, 3), "includes_tunnel_rtt": True,
            "session_ref_p50_ms": session_ref_p50_ms(),
            "loop": "apps.video double-buffered",
            "note": ("host pre-upload downscale: ~0.44 MB/frame uploaded"
                     if pre_resize else
                     "on this rig every 720p frame is a ~2.8 MB host->device"
                     " copy over a ~25-30 MB/s remote-TPU tunnel; device_ms"
                     " is the per-frame chip cost a local deployment would"
                     " see")}


def bench_jpeg_to_poses(n_frames: int = 96) -> Dict:
    """BASELINE's metric as defined: p50 end-to-end JPEG bytes → poses.

    Host encodes synthetic 720p frames to JPEG once (not timed); the timed
    path is: JPEG bytes → native C++ decode+resize pool (ppn_tpu/native)
    → device upload → forward + fused postprocess → poses fetched.
    Reports per-frame p50 (serial, honest end-to-end latency including the
    host-link round trip) plus sustained img/s with the decode pool and
    device pipelined, and the decode pool's own throughput.
    """
    import io
    import time

    from PIL import Image

    from ppn_tpu.native.loader import NativeJpegLoader, available

    cfg, graphdef, params, rest = _flagship()
    pipeline = _pipeline_fn(cfg, graphdef)
    rec: Dict = {"config": "6_jpeg_to_poses", "metric": "p50_latency",
                 "unit": "ms", "frames": n_frames}
    if not available():
        return {**rec, "value": None, "skipped": "native loader unavailable"}

    rng = np.random.default_rng(0)
    frames = []
    for _ in range(8):  # 8 distinct frames cycled n_frames times
        arr = (rng.random((720, 1280, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=90)
        frames.append(buf.getvalue())
    jpegs = [frames[i % len(frames)] for i in range(n_frames)]

    loader = NativeJpegLoader(cfg.model.insize, num_workers=8)
    try:
        # warmup: one frame through the whole path (compile included)
        loader.submit(0, jpegs[0])
        _, img = loader.get()
        out = pipeline(params, rest, jax.device_put(img[None]))
        jax.block_until_ready(out)

        # decode-pool-only throughput
        t0 = time.perf_counter()
        for i, data in enumerate(jpegs):
            loader.submit(i, data)
        for _ in jpegs:
            loader.get()
        decode_ips = n_frames / (time.perf_counter() - t0)

        # serial per-frame latency: JPEG bytes → fetched poses
        lats = []
        for data in jpegs:
            t0 = time.perf_counter()
            loader.submit(0, data)
            _, img = loader.get()
            out = pipeline(params, rest, jax.device_put(img[None]))
            jax.block_until_ready(out)
            jax.device_get(out[2])
            lats.append((time.perf_counter() - t0) * 1e3)
        lats = np.sort(np.asarray(lats))

        # pipelined sustained throughput: pool + device overlapped
        t0 = time.perf_counter()
        for i, data in enumerate(jpegs):
            loader.submit(i, data)
        out = None
        for _ in jpegs:
            _, img = loader.get()
            out = pipeline(params, rest, jax.device_put(img[None]))
        jax.block_until_ready(out)
        jax.device_get(out[2])
        sustained_ips = n_frames / (time.perf_counter() - t0)
    finally:
        loader.close()

    return {**rec,
            "value": round(float(lats[len(lats) // 2]), 3),
            "p50_ms": round(float(lats[len(lats) // 2]), 3),
            "p90_ms": round(float(lats[int(len(lats) * 0.9)]), 3),
            "sustained_images_per_sec": round(sustained_ips, 2),
            "decode_pool_images_per_sec": round(decode_ips, 2),
            "includes_tunnel_rtt": True,
            "session_ref_p50_ms": session_ref_p50_ms(),
            "note": "rig-bound: the decode pool shares ONE host core and"
                    " each decoded 384x384 f32 image is a ~1.7 MB tunnel"
                    " upload; the chip-side pipeline is the config-1/2"
                    " path (device_ms there)"}


def bench_serving(n: int = 512, threads: int = 16,
                  max_batch: int = 32, window_ms: float = 3) -> Dict:
    """Micro-batched serving (beyond-BASELINE config: ppn_tpu/serving.py).

    N client threads submit single images; reports sustained img/s, per-
    request latency and how well the batcher packs (batch histogram)."""
    import contextlib
    import io

    from ppn_tpu.apps import serve

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = serve.main(["--config", "mpii_r18_384",
                         "--selftest", str(n), "--threads", str(threads),
                         "--max-batch", str(max_batch),
                         "--window-ms", str(window_ms), "--json"])
    rec = json.loads(
        [ln for ln in buf.getvalue().splitlines() if ln.startswith("{")][-1])
    return {"config": "7_serving_microbatch", "metric": "images_per_sec",
            "value": rec["images_per_sec"], "unit": "images/sec",
            "selftest_rc": rc, **{k: rec[k] for k in (
                "p50_ms", "p90_ms", "batches_by_size", "mismatches",
                "threads", "requests")},
            "window_ms": window_ms,
            "includes_tunnel_rtt": True,
            "session_ref_p50_ms": session_ref_p50_ms()}


def bench_serving_window_sweep(windows=(2, 5, 10, 20)) -> Dict:
    """Config 7w (VERDICT r4 directive #8): the serving batch window swept
    at fixed load, to validate the `window_ms + device_batch_ms` floor
    model's *window* term with data from this rig. On the tunneled rig the
    absolute floor is masked by the ~0.25 s/bucket link cost, but the
    sweep's deltas isolate the window contribution: p50 should rise ~1:1
    with the window once the window (not the link) paces dispatch."""
    points = []
    for w in windows:
        rec = bench_serving(window_ms=w)
        points.append({k: rec[k] for k in (
            "window_ms", "value", "p50_ms", "p90_ms", "batches_by_size",
            "mismatches")})
    return {"config": "7w_serving_window_sweep",
            "metric": "images_per_sec_by_window",
            "value": points[0]["value"], "unit": "images/sec",
            "points": points,
            "includes_tunnel_rtt": True,
            "session_ref_p50_ms": session_ref_p50_ms()}


_BENCHES = {
    "1": bench_single_latency,
    "2": bench_batched_inference,
    "3": bench_train_step,
    # training at the serving batch: fwd/bwd MFU rises with B just like
    # inference did (VERDICT r3 next #3) — both batches are recorded
    "3b": lambda: bench_train_step(batch=128),
    # the device-resident loop (DeviceCache + lax.scan over K steps):
    # the trainer-delivered number matching 3b's device-honest body
    "3c": bench_train_device_resident,
    "4": bench_coco_pipeline,
    "5": bench_video_stream,
    # host pre-upload downscale variant (VERDICT r4 directive #6)
    "5p": lambda: bench_video_stream(pre_resize=True),
    "6": bench_jpeg_to_poses,
    "7": bench_serving,
    # window sweep at fixed load (VERDICT r4 directive #8)
    "7w": bench_serving_window_sweep,
    # COCO crowded operating point at the serving batch (directive #5)
    "4b": bench_coco_crowded,
}


def main(argv=None):
    p = argparse.ArgumentParser(description="PPN benchmark suite")
    p.add_argument("--configs", default="1,2,3,3b,3c,4,5,6,7")
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

"""Realtime / streaming video pose CLI — ref:high_speed.py† (SURVEY.md §3.3).

Capture thread + latest-frame inference loop, with resize/normalize fused on
device (BASELINE config #5: streaming 720p). Sources:

* ``--source cam`` / ``--source <video-file>`` (OpenCV capture)
* ``--source <directory>`` — a folder of JPEG frames, decoded through the
  native C++ pool (ppn_tpu/native) pipelined ahead of the device
* ``--source synthetic`` — deterministic generated 720p frames, so the
  latency path is drivable offline and in CI.

Reports p50/p90 end-to-end latency (frame-in-hand → parsed poses on host)
and FPS — the BASELINE.json p50 metric.

Example:
    python -m ppn_tpu.apps.video --config mpii_r18_384 --source synthetic \
        --frames 64 --out /tmp/video_out
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time

import jax
import numpy as np

from ppn_tpu.configs import get_config, resolve_config
from ppn_tpu.train import steps as st


def make_video_pipeline(cfg, graphdef, pre_resized: bool = False):
    """Jitted uint8 frame (H0, W0, 3) → parsed People (on-device resize).

    ``pre_resized=True``: the frame arrives already at ``insize`` (host
    pre-upload downscale, ``--pre-resize``) and the device resize is
    skipped — on a remote-tunneled rig this cuts the per-frame upload
    ~6.4× (720p 2.76 MB → 384² 0.44 MB), which is the difference between
    a link-bound and a source-bound stream (VERDICT r4 directive #6)."""
    from flax import nnx

    from ppn_tpu.ops import postprocess as post
    from ppn_tpu.ops.image import resize_bilinear

    @jax.jit
    def run(state, frame_u8):
        img = frame_u8.astype(np.float32) / 255.0
        if not pre_resized:
            img = resize_bilinear(img, cfg.model.insize)
        model = nnx.merge(graphdef, st.eval_params(state), state.rest)
        model.eval()
        fm = model(img[None])
        people = post.postprocess_batch_fast_fn(cfg.model, fm,
                                                exact_bf16=True)
        return jax.tree.map(lambda x: x[0], people)

    return run


def host_resize(frame_u8: np.ndarray, insize) -> np.ndarray:
    """Host-side uint8 bilinear downscale to the model input (PIL — C
    speed, a few ms/frame on one core). Numerics differ from the device
    ``resize_bilinear`` in the last bits (different bilinear taps); the
    trade is documented at the ``--pre-resize`` flag."""
    from PIL import Image

    if frame_u8.shape[:2] == tuple(insize):
        return frame_u8
    return np.asarray(Image.fromarray(frame_u8).resize(
        (insize[1], insize[0]), Image.BILINEAR))


def synthetic_frames(n: int, size=(720, 1280), seed: int = 0,
                     pool: int = 16, fps: float = 30.0):
    """Deterministic 720p frames with moving stick figures.

    A small pool of unique frames is pre-rendered BEFORE streaming starts
    and cycled: rendering costs ~50+ ms/frame of host CPU on this rig
    while a camera delivers frames for free, so on-demand generation
    would starve the capture thread and the benchmark would measure the
    generator instead of the serving loop (BASELINE config #5 is the
    latter).

    Frames are paced at ``fps`` (default 30, a standard camera rate): a
    pre-rendered pool yields infinitely fast, and an unpaced producer
    races through the whole stream while the consumer handles its first
    frame — the latest-frame slot then drops everything and the
    "stream" degenerates to a single sample. Pacing models the source a
    streaming-pose deployment actually has; the pipeline's own rate
    still shows up as frames-processed/wall (it can't exceed fps)."""
    from ppn_tpu.data.synthetic import SyntheticPoseDataset
    import dataclasses

    from ppn_tpu.configs import get_config as gc

    cfg = gc("mpii_r18_384")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, insize=size,
                                       outsize=(size[0] // 32,
                                                size[1] // 32)))
    uniq = min(n, pool)
    ds = SyntheticPoseDataset(cfg, size=uniq, seed=seed, num_persons=2)
    frames = [(ds[i]["image"] * 255).astype(np.uint8) for i in range(uniq)]
    period = 1.0 / fps if fps > 0 else 0.0
    t_next = time.perf_counter()
    for i in range(n):
        if period:
            now = time.perf_counter()
            delay = t_next - now
            if delay > 0:
                time.sleep(delay)
            # No catch-up bursts: if the consumer stalled us (e.g. its
            # first-frame compile), a real camera would have dropped
            # those frames, not delivered them all at once.
            t_next = max(t_next, now) + period
        yield frames[i % uniq]


def jpeg_frames(dirpath: str, n: int, insize):
    """JPEG files from a directory through the native decode pool.

    Frames are decoded+resized to the network input size off the GIL with
    submits pipelined a window ahead of consumption, then yielded as uint8
    (the frame contract of the serving loop) — the DataLoader-worker
    analog for file streams (ref:high_speed.py† reads cv2 frames; here the
    host half of JPEG→poses runs in C++)."""
    import os

    from ppn_tpu.native.loader import NativeJpegLoader, available

    files = sorted(
        os.path.join(dirpath, f) for f in os.listdir(dirpath)
        if f.lower().endswith((".jpg", ".jpeg")))
    if not files:
        raise RuntimeError(f"no .jpg files in {dirpath!r}")
    paths = [files[i % len(files)] for i in range(n)]

    if not available():
        from ppn_tpu.native.loader import decode_resize

        for p in paths:
            with open(p, "rb") as f:
                img = decode_resize(f.read(), insize)  # PIL fallback
            yield (img * 255.0 + 0.5).astype(np.uint8)
        return

    loader = NativeJpegLoader(insize, num_workers=4)
    try:
        window = 8
        submitted = 0
        for p in paths[:window]:
            with open(p, "rb") as f:
                loader.submit(submitted, f.read())
            submitted += 1
        # Workers race (num_workers=4), so completions can return out of
        # submission order; buffer by request id and emit next-expected so
        # file streams keep temporal order (ADVICE r3).
        pending = {}
        next_rid = 0
        for _ in range(n):
            rid, img = loader.get()
            pending[rid] = img
            if submitted < n:
                with open(paths[submitted], "rb") as f:
                    loader.submit(submitted, f.read())
                submitted += 1
            while next_rid in pending:
                img = pending.pop(next_rid)
                next_rid += 1
                if img is None:
                    continue  # corrupt frame: skip, keep streaming
                yield (img * 255.0 + 0.5).astype(np.uint8)
    finally:
        loader.close()


def capture_frames(source: str):
    import cv2

    cap = cv2.VideoCapture(0 if source == "cam" else source)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open video source {source!r}")
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        yield frame[..., ::-1]  # BGR → RGB
    cap.release()


def main(argv=None):
    p = argparse.ArgumentParser(description="PPN streaming video pose")
    p.add_argument("--config", default="mpii_r18_384")
    p.add_argument("--ini", default=None, metavar="PATH",
                   help="reference-style config.ini applied over --config")
    p.add_argument("--ckpt-dir", default=None)
    p.add_argument("--source", default="synthetic",
                   help="'synthetic', 'cam', or a video file path")
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--out", default=None,
                   help="directory for annotated frames (PNG)")
    p.add_argument("--json", action="store_true",
                   help="print latency summary as one JSON line")
    p.add_argument("--no-overlap", action="store_true",
                   help="disable double buffering (dispatch frame N+1 "
                        "before fetching frame N's poses)")
    p.add_argument("--pre-resize", action="store_true",
                   help="downscale each frame to the model input on the "
                        "host before upload (6.4× less host->device "
                        "traffic for 720p->384²; the resize runs in the "
                        "capture thread, overlapping device work). Host "
                        "PIL bilinear instead of the on-device resize — "
                        "last-bit numeric differences")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="PATH=VALUE",
                   help="dotted-path config override (repeatable)")
    args = p.parse_args(argv)

    cfg = resolve_config(args.config, args.ini)
    if args.overrides:
        from ppn_tpu.configs.overrides import apply_overrides

        cfg = apply_overrides(cfg, args.overrides)
    from ppn_tpu.apps.predict import load_state
    from ppn_tpu.utils.draw import draw_people

    graphdef, state = load_state(cfg, args.ckpt_dir)
    pipeline = make_video_pipeline(cfg, graphdef,
                                   pre_resized=args.pre_resize)

    import os

    if args.source == "synthetic":
        frames = synthetic_frames(args.frames)
    elif os.path.isdir(args.source):
        frames = jpeg_frames(args.source, args.frames, cfg.model.insize)
    else:
        frames = capture_frames(args.source)
    if args.pre_resize:
        # Runs in the producer (capture) thread: the downscale overlaps
        # device work and the slot/queue carry the small frame onward.
        frames = (host_resize(f, cfg.model.insize) for f in frames)

    # Compile the frame pipeline BEFORE the capture thread starts: the
    # latest-frame slot below drops stale frames by design, so a cold
    # first-dispatch compile (tens of seconds through a remote-compile
    # endpoint) would silently eat the whole stream — the producer races
    # through its frames while the consumer is stuck in XLA. Peek the
    # first frame, warm the exact shape/dtype, then chain it back.
    import itertools

    frames = iter(frames)
    first = next(frames, None)
    if first is not None:
        jax.device_get(pipeline(state, first))
        frames = itertools.chain([first], frames)

    # Capture thread feeding a latest-frame slot (drop stale frames), the
    # reference's capture-thread pattern (SURVEY.md §3.3).
    slot: "queue.Queue[np.ndarray]" = queue.Queue(maxsize=1)
    done = threading.Event()

    def producer():
        for f in frames:
            try:
                slot.get_nowait()          # drop stale
            except queue.Empty:
                pass
            slot.put(f)
        done.set()

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    latencies = []
    n = 0
    if args.out:
        import os

        os.makedirs(args.out, exist_ok=True)

    def finish(t0, handle, frame):
        """Fetch one frame's poses; record end-to-end latency; draw."""
        nonlocal n
        people = jax.device_get(handle)   # poses on host = end of pipeline
        latencies.append(time.perf_counter() - t0)
        if args.out and n < 8:
            small = frame.astype(np.float32) / 255.0
            # draw in the frame's own coordinate system by rescaling boxes
            scale = np.array([frame.shape[1] / cfg.model.insize[1],
                              frame.shape[0] / cfg.model.insize[0],
                              frame.shape[1] / cfg.model.insize[1],
                              frame.shape[0] / cfg.model.insize[0]],
                             np.float32)
            people = people._replace(kp_box=people.kp_box * scale)
            draw_people(cfg.model, small, people).save(
                f"{args.out}/frame_{n:04d}.png")
        n += 1

    # Pipelined serving loop (VERDICT r1 weak #4): jax dispatch is async,
    # so the main loop only dispatches; a consumer thread fetches each
    # result as soon as the device finishes it. Frame N+1's upload+compute
    # overlaps frame N's result fetch, and the recorded latency is
    # dispatch→result per frame — it never includes the wait for the
    # *next* frame to arrive from the source (which the old
    # finish-on-next-dispatch scheme folded into every sample).
    # maxsize=2 IS the double-buffering: frame N+1 uploads/computes while
    # frame N's result is fetched. A deeper queue would only add in-flight
    # frames ahead of a slower-than-source pipeline, inflating every
    # recorded latency by (depth × service time) of pure queue wait —
    # the drop-stale slot upstream already absorbs the rate mismatch.
    results: queue.Queue = queue.Queue(maxsize=2)
    consumer_error: list = []

    def consumer():
        while True:
            item = results.get()
            if item is None:
                return
            try:
                finish(*item)
            except BaseException as e:  # surface in the main thread
                consumer_error.append(e)
                return

    def put_checked(item):
        """Enqueue without deadlocking if the consumer died mid-run."""
        while True:
            if consumer_error:
                raise consumer_error[0]
            try:
                results.put(item, timeout=0.5)
                return
            except queue.Full:
                continue

    ct = threading.Thread(target=consumer, daemon=True)
    ct.start()
    t_start = time.perf_counter()
    while not (done.is_set() and slot.empty()):
        try:
            frame = slot.get(timeout=0.5)
        except queue.Empty:
            continue
        t0 = time.perf_counter()
        handle = pipeline(state, frame)
        if args.no_overlap:
            finish(t0, handle, frame)
        else:
            put_checked((t0, handle, frame))
    put_checked(None)
    ct.join()
    if consumer_error:
        raise consumer_error[0]
    wall = time.perf_counter() - t_start

    lat = np.asarray(latencies[3:] or latencies)  # skip warmup/compile
    summary = {
        "frames": n,
        "fps": round(n / wall, 2),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1000, 2),
        "p90_ms": round(float(np.percentile(lat, 90)) * 1000, 2),
    }
    if args.json:
        print(json.dumps(summary))
    else:
        print(f"{n} frames, {summary['fps']} fps, "
              f"p50 {summary['p50_ms']} ms, p90 {summary['p90_ms']} ms")


if __name__ == "__main__":
    main()

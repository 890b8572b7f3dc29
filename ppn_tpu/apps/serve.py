"""Serving CLI: micro-batched pose inference (ppn_tpu/serving.py).

The reference's inference surface stops at single-image ``predict.py†``
and a webcam loop (SURVEY.md §3.2–3.3); this app is the production
companion: N client threads submit single images, the server batches
them onto the chip.

    # self-test + micro-benchmark on synthetic data (no checkpoint needed:
    # random-init weights still exercise the full serving path)
    python -m ppn_tpu.apps.serve --config mpii_r18_384 --selftest 64 \
        --threads 8 --max-batch 32 --window-ms 5 --json

Prints one JSON line: latency percentiles per request, sustained img/s,
and the batch-size histogram (how well the batcher is packing).
"""

from __future__ import annotations

import argparse
import json
import threading
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="mpii_r18_384")
    p.add_argument("--ini", default=None, metavar="PATH",
                   help="reference-style config.ini applied over --config")
    p.add_argument("--ckpt-dir", default=None,
                   help="checkpoint to serve (default: fresh init)")
    p.add_argument("--flip-tta", action="store_true")
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--window-ms", type=float, default=5.0)
    p.add_argument("--selftest", type=int, default=64, metavar="N",
                   help="serve N synthetic images and verify against "
                        "direct Predictor outputs")
    p.add_argument("--threads", type=int, default=8)
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    import numpy as np

    from ppn_tpu.configs import resolve_config
    from ppn_tpu.data.synthetic import SyntheticPoseDataset
    from ppn_tpu.inference import Predictor
    from ppn_tpu.serving import PoseServer

    cfg = resolve_config(args.config, args.ini)
    if args.ckpt_dir:
        predictor = Predictor.from_checkpoint(cfg, args.ckpt_dir,
                                              flip_tta=args.flip_tta)
    else:
        from flax import nnx

        from ppn_tpu.train import steps as st

        model = st.create_model(cfg)
        model.eval()
        predictor = Predictor(cfg, *nnx.split(model, nnx.Param, ...),
                              flip_tta=args.flip_tta)

    n = args.selftest
    ds = SyntheticPoseDataset(cfg, size=min(n, 32), seed=7, num_persons=2)
    images = [np.clip(ds[i % len(ds)]["image"] * 255 + 0.5, 0,
                      255).astype(np.uint8) for i in range(n)]

    with PoseServer(predictor, max_batch=args.max_batch,
                    batch_window_ms=args.window_ms) as server:
        server.warmup()

        lat = [0.0] * n
        results = [None] * n

        def client(tid):
            for i in range(tid, n, args.threads):
                t0 = time.perf_counter()
                results[i] = server.predict(images[i])
                lat[i] = time.perf_counter() - t0

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client, args=(t,))
                   for t in range(args.threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        stats = server.stats()

    # verify: every request got ITS image's poses (batching must not
    # permute or cross-contaminate). Per-row independence makes a request's
    # result bitwise-equal to a direct predict at the SAME batch (bucket)
    # shape: conv/matmul rows never reduce across the batch axis, so only
    # the compiled program (the static batch size), never the sibling
    # images, can move bits. We therefore require EXACT equality against
    # a direct predict at some bucket size the server actually used — a
    # genuine box regression of any magnitude cannot pass (the pre-r4
    # rtol/atol=1e-2 check would have accepted a 1% box error).
    import jax

    buckets = sorted(int(b) for b in stats["batches_by_size"])
    want_by_bucket = {}
    for b in buckets:
        per_img = []
        for s in range(0, n, b):
            chunk = images[s:s + b]
            arr = np.stack(list(chunk) + [np.zeros_like(images[0])]
                           * (b - len(chunk)))
            res = jax.tree.map(np.asarray, predictor.predict(arr))
            per_img.extend(jax.tree.map(lambda x, j=j: x[j], res)
                           for j in range(len(chunk)))
        want_by_bucket[b] = per_img

    def _exact(got, want):
        if not np.array_equal(np.asarray(got.valid), want.valid):
            return False
        v = want.valid
        if not v.any():
            return True
        return (np.array_equal(np.asarray(got.kp_cell)[v], want.kp_cell[v])
                and np.array_equal(np.asarray(got.kp_box)[v],
                                   want.kp_box[v]))

    mism = sum(
        0 if any(_exact(results[i], want_by_bucket[b][i]) for b in buckets)
        else 1
        for i in range(n))
    ls = np.sort(np.asarray(lat)) * 1e3
    out = {
        "requests": n, "threads": args.threads, "wall_s": round(wall, 3),
        "images_per_sec": round(n / wall, 2),
        "p50_ms": round(float(ls[n // 2]), 3),
        "p90_ms": round(float(ls[int(n * 0.9)]), 3),
        "batches_by_size": stats["batches_by_size"],
        "mismatches": mism,
    }
    print(json.dumps(out) if args.json else out)
    return 1 if mism else 0


if __name__ == "__main__":
    raise SystemExit(main())

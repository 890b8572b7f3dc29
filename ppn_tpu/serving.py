"""Micro-batching pose server — the production-serving surface.

A TPU serves best at large static batches (this model: ~8200 img/s at
B=128 vs ~1700 img/s dispatching B=1), but request traffic arrives one
image at a time. ``PoseServer`` bridges the two the TPU-native way:

* requests queue on the host; a dispatcher thread drains up to
  ``max_batch`` images, waiting at most ``batch_window_ms`` after the
  first request of a batch;
* the batch is padded to the next power-of-two **bucket**, so only
  ``log2(max_batch)+1`` static shapes ever compile (XLA recompiles on
  any new shape — buckets keep tail latency flat after ``warmup()``);
* one jitted forward + fused postprocess runs per batch; every request
  resolves its own ``concurrent.futures.Future`` with a per-image
  ``People``.

The reference has no serving component (single-image ``predict.py†`` and
a webcam loop are its whole inference surface, SURVEY.md §2.1/§3.2–3.3);
this subsystem is beyond-parity, motivated by the production-serving
mandate in BASELINE.md.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from ppn_tpu.inference import Predictor
from ppn_tpu.ops.parse import People


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class PoseServer:
    """Threaded micro-batcher over a :class:`ppn_tpu.inference.Predictor`.

    >>> server = PoseServer(Predictor.from_checkpoint(cfg, ckpt))
    >>> fut = server.submit(image)          # (H, W, 3) uint8/float32
    >>> people = fut.result()               # per-image People
    """

    def __init__(self, predictor: Predictor, max_batch: int = 32,
                 batch_window_ms: float = 5.0):
        if max_batch < 1 or max_batch & (max_batch - 1):
            raise ValueError(f"max_batch must be a power of two, "
                             f"got {max_batch}")
        self._p = predictor
        self.max_batch = max_batch
        self.batch_window_s = batch_window_ms / 1e3
        self._q: "queue.SimpleQueue[Optional[Tuple[np.ndarray, Future]]]" \
            = queue.SimpleQueue()
        self._closed = False
        # submit() and close() race on _closed: without mutual exclusion a
        # request enqueued concurrently with close() can land *after* the
        # shutdown sentinel and its Future would never resolve (ADVICE r3).
        self._close_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self._batches_by_size: Dict[int, int] = {}
        self._images = 0
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="ppn-pose-server")
        self._thread.start()

    # ---- client API --------------------------------------------------------
    def submit(self, image: np.ndarray) -> "Future[People]":
        """Enqueue one (H, W, 3) image at the config's insize."""
        h, w = self._p.cfg.model.insize
        if image.shape != (h, w, 3):
            raise ValueError(f"expected ({h}, {w}, 3), got {image.shape}; "
                             "resize before submitting")
        fut: "Future[People]" = Future()
        with self._close_lock:
            if self._closed:
                raise RuntimeError("server is closed")
            self._q.put((np.asarray(image), fut))
        return fut

    def predict(self, image: np.ndarray,
                timeout: Optional[float] = None) -> People:
        return self.submit(image).result(timeout=timeout)

    def warmup(self, dtypes=(np.uint8, np.float32)) -> None:
        """Compile every bucket shape up front (serving tail latency).

        The jit cache keys on input dtype, so each transport dtype a
        client may submit (uint8 is the 4×-cheaper wire format; float32
        the [0,1] convenience one) needs its own bucket compiles — a
        missing dtype here silently moves minutes of XLA compilation
        into the first live requests.
        """
        h, w = self._p.cfg.model.insize
        for dt in dtypes:
            zero = np.zeros((h, w, 3), dt)
            b = 1
            while True:
                self._p.predict(np.broadcast_to(zero, (b, h, w, 3)))
                if b == self.max_batch:
                    break
                b *= 2

    def stats(self) -> Dict:
        with self._stats_lock:
            return {"images": self._images,
                    "batches_by_size": dict(self._batches_by_size)}

    def close(self) -> None:
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)
        self._thread.join()
        # Defensive drain: the lock makes a post-sentinel enqueue
        # impossible, but if anything is ever left behind, fail its
        # Future loudly instead of letting a timeout-less .result() hang.
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None and item[1].set_running_or_notify_cancel():
                item[1].set_exception(RuntimeError("server closed"))

    def __enter__(self) -> "PoseServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ---- dispatcher --------------------------------------------------------
    def _drain(self) -> Optional[List[Tuple[np.ndarray, Future]]]:
        item = self._q.get()
        if item is None:
            return None
        batch = [item]
        deadline = time.monotonic() + self.batch_window_s
        while len(batch) < self.max_batch:
            left = deadline - time.monotonic()
            if left <= 0:
                break
            try:
                nxt = self._q.get(timeout=left)
            except queue.Empty:
                break
            if nxt is None:           # close() while draining: stop after
                self._q.put(None)     # this batch, re-post the sentinel
                break
            batch.append(nxt)
        return batch

    def _loop(self) -> None:
        while True:
            batch = self._drain()
            if batch is None:
                return
            # executor protocol: a client may have cancelled its Future
            # while it sat in the queue — set_result would then raise and
            # kill the dispatcher. Claim each future; drop cancelled ones.
            batch = [(img, fut) for img, fut in batch
                     if fut.set_running_or_notify_cancel()]
            if not batch:
                continue
            images = np.stack([img for img, _ in batch])
            n = images.shape[0]
            b = _bucket(n, self.max_batch)
            if b > n:                 # pad to the bucket's static shape
                pad = np.zeros((b - n, *images.shape[1:]), images.dtype)
                images = np.concatenate([images, pad])
            try:
                people = self._p.predict(images)
            except Exception as e:    # noqa: BLE001 — resolve, don't die
                for _, fut in batch:
                    fut.set_exception(e)
                continue
            with self._stats_lock:
                self._batches_by_size[b] = (
                    self._batches_by_size.get(b, 0) + 1)
                self._images += n
            for i, (_, fut) in enumerate(batch):
                fut.set_result(jax.tree.map(lambda x, i=i: x[i], people))

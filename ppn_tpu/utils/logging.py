"""Structured metrics logging (SURVEY.md §5 metrics row).

The reference prints per-term losses to stdout (ref:train.py†). Here:
stdout + JSONL with identical term names (loss_resp/iou/coor/size/limb) so
curves are comparable side-by-side with the reference for parity debugging.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, logdir: Optional[str] = None, stdout: bool = True,
                 name: str = "train", tensorboard: bool = False):
        self.stdout = stdout
        self._fh = None
        self._tb = None
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            self._fh = open(os.path.join(logdir, f"{name}_metrics.jsonl"),
                            "a", buffering=1)
            if tensorboard:
                try:
                    import tensorflow as tf

                    self._tb = tf.summary.create_file_writer(
                        os.path.join(logdir, "tb", name))
                except Exception as e:  # TF optional
                    print(f"tensorboard writer unavailable: {e}")
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in metrics.items()})
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=int(step))
        if self.stdout:
            parts = " ".join(
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items() if k not in ("time",))
            print(f"[{rec['time']:9.1f}s] {parts}", flush=True)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
        if self._tb is not None:
            self._tb.close()

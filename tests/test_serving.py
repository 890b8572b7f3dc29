"""Micro-batching pose server (ppn_tpu/serving.py)."""

import threading

import jax
import numpy as np
import pytest
from flax import nnx

from ppn_tpu.configs import get_config


@pytest.fixture(scope="module")
def predictor():
    from ppn_tpu.inference import Predictor
    from ppn_tpu.train import steps as st

    cfg = get_config("tiny_test")
    model = st.create_model(cfg)
    model.eval()
    return Predictor(cfg, *nnx.split(model, nnx.Param, ...))


def _images(cfg, n, seed=0):
    from ppn_tpu.data.synthetic import SyntheticPoseDataset

    ds = SyntheticPoseDataset(cfg, size=n, seed=seed, num_persons=1)
    return [np.clip(ds[i]["image"] * 255 + 0.5, 0, 255).astype(np.uint8)
            for i in range(n)]


def test_server_matches_direct_batch_bitwise(predictor):
    """Submitting exactly one bucket's worth with a generous window makes
    the server run the same (B, H, W, 3) shape a direct predict would —
    per-request results must then be bitwise identical and correctly
    attributed (no permutation, no cross-contamination)."""
    from ppn_tpu.serving import PoseServer

    imgs = _images(predictor.cfg, 4)
    want = predictor.predict(np.stack(imgs))
    with PoseServer(predictor, max_batch=4,
                    batch_window_ms=2000.0) as server:
        futs = [server.submit(im) for im in imgs]
        got = [f.result(timeout=300) for f in futs]
        stats = server.stats()
    assert stats == {"images": 4, "batches_by_size": {4: 1}}
    for i, g in enumerate(got):
        for name in want._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(g, name)),
                np.asarray(getattr(want, name))[i],
                err_msg=f"request {i} field {name}")


def test_server_pads_to_bucket_and_survives_odd_counts(predictor):
    from ppn_tpu.serving import PoseServer

    imgs = _images(predictor.cfg, 3, seed=1)
    with PoseServer(predictor, max_batch=8,
                    batch_window_ms=1000.0) as server:
        got = [f.result(timeout=300)
               for f in [server.submit(im) for im in imgs]]
        stats = server.stats()
    assert stats["images"] == 3
    assert list(stats["batches_by_size"]) == [4]  # 3 padded to bucket 4
    want = predictor.predict(np.stack(imgs + [np.zeros_like(imgs[0])]))
    for i, g in enumerate(got):
        np.testing.assert_array_equal(np.asarray(g.valid),
                                      np.asarray(want.valid)[i])


def test_server_concurrent_clients_each_get_their_own(predictor):
    from ppn_tpu.serving import PoseServer

    imgs = _images(predictor.cfg, 8, seed=2)
    results = [None] * len(imgs)
    with PoseServer(predictor, max_batch=8,
                    batch_window_ms=500.0) as server:
        def client(i):
            results[i] = server.predict(imgs[i], timeout=300)

        ts = [threading.Thread(target=client, args=(i,))
              for i in range(len(imgs))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    # attribute-check each result against a direct single predict:
    # decisions must match (float low bits may differ across shapes)
    for i, g in enumerate(results):
        want = jax.tree.map(lambda x: x[0],
                            predictor.predict(imgs[i][None]))
        np.testing.assert_array_equal(np.asarray(g.valid),
                                      np.asarray(want.valid),
                                      err_msg=f"request {i}")
        v = np.asarray(want.valid)
        if v.any():
            np.testing.assert_array_equal(
                np.asarray(g.kp_cell)[v], np.asarray(want.kp_cell)[v],
                err_msg=f"request {i}")


def test_server_rejects_bad_shapes_and_closes(predictor):
    from ppn_tpu.serving import PoseServer

    server = PoseServer(predictor, max_batch=2, batch_window_ms=1.0)
    with pytest.raises(ValueError):
        server.submit(np.zeros((8, 8, 3), np.uint8))
    server.close()
    with pytest.raises(RuntimeError):
        server.submit(np.zeros((*predictor.cfg.model.insize, 3), np.uint8))
    with pytest.raises(ValueError):
        PoseServer(predictor, max_batch=3)


def test_server_survives_cancelled_futures(predictor):
    """A Future cancelled while queued must not kill the dispatcher
    (set_result on a cancelled Future raises); the server keeps serving."""
    from ppn_tpu.serving import PoseServer

    imgs = _images(predictor.cfg, 4, seed=3)
    with PoseServer(predictor, max_batch=4,
                    batch_window_ms=300.0) as server:
        futs = [server.submit(im) for im in imgs[:3]]
        futs[1].cancel()  # may or may not win the race with the dispatcher
        for i in (0, 2):
            assert futs[i].result(timeout=300) is not None
        # the server is still alive and serving after the cancellation
        assert server.predict(imgs[3], timeout=300) is not None

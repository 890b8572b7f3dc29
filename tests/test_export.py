"""AOT export round trip: serialize → deserialize → same results."""

import jax
import numpy as np

from ppn_tpu.configs import get_config
from ppn_tpu.data.synthetic import SyntheticPoseDataset
from ppn_tpu.train import steps as st
from ppn_tpu.utils.export import export_pipeline, load_pipeline


def test_export_roundtrip():
    cfg = get_config("tiny_test")
    graphdef, state, _ = st.create_train_state(cfg)
    blob = export_pipeline(cfg, graphdef, state, batch=2)
    assert isinstance(blob, bytes) and len(blob) > 10_000

    ds = SyntheticPoseDataset(cfg, size=2, seed=3)
    imgs = np.stack([ds[i]["image"] for i in range(2)])

    run = load_pipeline(blob)
    got = jax.device_get(run(imgs))

    # reference: live pipeline on the same state
    from flax import nnx

    from ppn_tpu.ops import postprocess as post

    model = nnx.merge(graphdef, state.params, state.rest)
    model.eval()
    fm = model(imgs)
    want = jax.device_get(post.postprocess_batch(cfg.model, fm))
    # bf16 convs: exported vs live compilations reduce in different orders
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want.kp_box),
                               rtol=5e-3, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(got[2]),
                                  np.asarray(want.valid))

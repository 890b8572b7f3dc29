"""Host pipeline tests: collate dtypes, small-dataset batching."""

import numpy as np

from ppn_tpu.configs import get_config
from ppn_tpu.data.pipeline import collate, infinite_batches
from ppn_tpu.data.synthetic import SyntheticPoseDataset


def test_infinite_batches_smaller_dataset_than_batch():
    """Overfit path: dataset of 4 must still yield batch-of-16 batches
    (sampling with replacement), not hang."""
    cfg = get_config("tiny_test")
    ds = SyntheticPoseDataset(cfg, size=4, seed=0)
    it = infinite_batches(ds, 16, seed=0)
    b = next(it)
    assert b["image"].shape[0] == 16
    b2 = next(it)
    assert b2["image"].shape[0] == 16


def test_collate_uint8_transport():
    cfg = get_config("tiny_test")
    ds = SyntheticPoseDataset(cfg, size=2, seed=0)
    samples = [ds[i] for i in range(2)]
    b8 = collate(samples, image_uint8=True)
    bf = collate(samples, image_uint8=False)
    assert b8["image"].dtype == np.uint8
    assert bf["image"].dtype == np.float32
    np.testing.assert_allclose(
        b8["image"].astype(np.float32) / 255.0, bf["image"], atol=1 / 255.0)


def test_cached_dataset_serves_uint8_consistent_with_collate():
    cfg = get_config("tiny_test")
    ds_c = SyntheticPoseDataset(cfg, size=2, seed=0, cache=True)
    ds_f = SyntheticPoseDataset(cfg, size=2, seed=0, cache=False)
    s_c = ds_c[0]
    s_f = ds_f[0]
    assert s_c["image"].dtype == np.uint8
    want = np.clip(s_f["image"] * 255.0 + 0.5, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(s_c["image"], want)
    # collate passes uint8 through unchanged
    b = collate([s_c], image_uint8=True)
    np.testing.assert_array_equal(b["image"][0], s_c["image"])


def test_uint8_images_flow_through_model_and_augment():
    import jax

    from ppn_tpu.nn import PoseProposalNet
    from flax import nnx
    from ppn_tpu.ops.augment import augment_batch

    cfg = get_config("tiny_test")
    ds = SyntheticPoseDataset(cfg, size=2, seed=0, cache=True)
    batch = collate([ds[0], ds[1]], image_uint8=True)
    model = PoseProposalNet(cfg.model, rngs=nnx.Rngs(0))
    model.eval()
    fm = model(batch["image"])
    assert np.isfinite(np.asarray(fm)).all()
    out = augment_batch(cfg.model, cfg.data, jax.random.PRNGKey(0), {
        k: batch[k] for k in
        ("image", "keypoints", "visible", "bboxes", "valid")})
    assert out["image"].dtype == np.float32

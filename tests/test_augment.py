"""On-device augmentation tests: geometry consistency between pixels and GT."""

import dataclasses

import jax
import numpy as np

from ppn_tpu.configs import get_config
from ppn_tpu.data.synthetic import SyntheticPoseDataset
from ppn_tpu.ops.augment import augment_batch, augment_single


def _identity_dcfg(dcfg, **over):
    kw = dict(rotate_deg=0.0, scale_min=1.0, scale_max=1.0,
              translate_frac=0.0, hflip_prob=0.0, color_jitter=0.0,
              crop_prob=0.0, saturation_jitter=0.0, sharpness_jitter=0.0)
    kw.update(over)
    return dataclasses.replace(dcfg, **kw)


def _one_sample(cfg):
    ds = SyntheticPoseDataset(cfg, size=1, seed=21, num_persons=1)
    return ds[0]


def test_identity_augment_is_noop():
    cfg = get_config("mpii_r18_384")
    s = _one_sample(cfg)
    dcfg = _identity_dcfg(cfg.data)
    img, kp, vis, box, val = augment_single(
        cfg.model, dcfg, jax.random.PRNGKey(0), s["image"], s["keypoints"],
        s["visible"], s["bboxes"], s["valid"])
    np.testing.assert_allclose(np.asarray(img), s["image"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(kp), s["keypoints"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(box), s["bboxes"], atol=1e-3)
    # visibility may only shrink (out-of-frame masking), never grow
    assert not np.any(np.asarray(vis) & ~s["visible"])


def test_flip_mirrors_pixels_and_swaps_classes():
    cfg = get_config("mpii_r18_384")
    m = cfg.model
    s = _one_sample(cfg)
    dcfg = _identity_dcfg(cfg.data, hflip_prob=1.0)
    img, kp, vis, box, val = augment_single(
        m, dcfg, jax.random.PRNGKey(0), s["image"], s["keypoints"],
        s["visible"], s["bboxes"], s["valid"])
    W = m.insize[1]
    # pixels mirrored (inner columns; border interp differs by half pixel)
    got = np.asarray(img)[:, 1:-1]
    want = s["image"][:, ::-1][:, 1:-1]
    assert np.abs(got - want).mean() < 2e-2
    # keypoint classes swapped left/right and x mirrored
    perm = list(range(m.num_keypoints))
    for a, b in m.flip_pairs:
        perm[a - 1], perm[b - 1] = perm[b - 1], perm[a - 1]
    np.testing.assert_allclose(
        np.asarray(kp)[0, :, 0], (W - 1) - s["keypoints"][0, perm, 0],
        atol=1.0)
    np.testing.assert_allclose(
        np.asarray(kp)[0, :, 1], s["keypoints"][0, perm, 1], atol=1e-2)
    np.testing.assert_array_equal(np.asarray(vis)[0],
                                  s["visible"][0, perm])


def test_random_augment_keeps_gt_on_rendered_joints():
    """Pixels and GT move together: the warped image at each transformed
    keypoint matches the original image at the original keypoint."""
    cfg = get_config("mpii_r18_384")
    m = cfg.model
    s = _one_sample(cfg)
    # crop_prob stays at its default so the person-centric crop path is
    # exercised by the pixel/GT consistency check too
    dcfg = dataclasses.replace(cfg.data, hflip_prob=0.0, color_jitter=0.0,
                               saturation_jitter=0.0, sharpness_jitter=0.0)

    matches = total = 0
    for seed in range(4):
        img, kp, vis, box, val = augment_single(
            m, dcfg, jax.random.PRNGKey(seed), s["image"], s["keypoints"],
            s["visible"], s["bboxes"], s["valid"])
        img = np.asarray(img)
        kp = np.asarray(kp)
        vis = np.asarray(vis)
        for k in range(m.num_keypoints):
            if not vis[0, k]:
                continue
            x, y = kp[0, k]
            xi, yi = int(round(x)), int(round(y))
            if not (0 <= xi < img.shape[1] and 0 <= yi < img.shape[0]):
                continue
            x0, y0 = s["keypoints"][0, k]
            orig = s["image"][int(round(y0)), int(round(x0))]
            total += 1
            # bilinear smoothing blurs near disk edges; centers match
            if np.linalg.norm(img[yi, xi] - orig) < 0.35:
                matches += 1
    assert total > 10
    assert matches / total > 0.8, (matches, total)


def test_separable_warp_matches_gather_warp():
    """Two-pass MXU warp ≈ direct bilinear gather warp (same affine)."""
    import jax.numpy as jnp

    from ppn_tpu.ops.image import (affine_warp, affine_warp_separable,
                                   make_affine)

    cfg = get_config("mpii_r18_384")
    s = _one_sample(cfg)
    img = jnp.asarray(s["image"])
    H, W = img.shape[:2]
    center = jnp.asarray([W / 2, H / 2], jnp.float32)
    for angle, scale, tx in [(0.0, 1.0, 0.0), (0.3, 1.1, 12.0),
                             (-0.5, 0.8, -7.0), (0.7, 1.25, 3.0)]:
        bwd, _ = make_affine(center, center, jnp.float32(angle),
                             jnp.float32(scale),
                             jnp.asarray([tx, -tx], jnp.float32), False)
        a = np.asarray(affine_warp(img, bwd, (H, W)))
        b = np.asarray(affine_warp_separable(img, bwd, (H, W)))
        # two-pass separable filtering differs slightly from direct
        # bilinear under rotation; bf16 weights add ~4e-3
        assert np.abs(a - b).mean() < 0.02, (angle, scale)
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.98


def test_separable_warp_identity_exact():
    import jax.numpy as jnp

    from ppn_tpu.ops.image import affine_warp_separable

    cfg = get_config("tiny_test")
    s = _one_sample(cfg)
    img = jnp.asarray(s["image"])
    ident = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = np.asarray(affine_warp_separable(img, ident, img.shape[:2]))
    # bf16 pixels in the einsums: identity is exact up to quantization
    np.testing.assert_allclose(out, s["image"], atol=5e-3)


def test_person_crop_zoom_recenters_and_scales():
    """crop_prob=1: the chosen person's box center lands at the output
    center and its max-dim covers the sampled [crop_frac] fraction."""
    cfg = get_config("mpii_r18_384")
    m = cfg.model
    s = _one_sample(cfg)  # exactly one person → deterministic choice
    dcfg = _identity_dcfg(cfg.data, crop_prob=1.0)
    H, W = m.insize
    lo, hi = dcfg.crop_frac_min, dcfg.crop_frac_max
    for seed in range(3):
        img, kp, vis, box, val = augment_single(
            m, dcfg, jax.random.PRNGKey(seed), s["image"], s["keypoints"],
            s["visible"], s["bboxes"], s["valid"])
        b = np.asarray(box)[0]
        np.testing.assert_allclose(b[:2], [W / 2, H / 2], atol=1e-2)
        got_frac = max(b[2], b[3]) / min(H, W)
        assert lo - 1e-3 <= got_frac <= hi + 1e-3, got_frac
        # zoom preserves the person's aspect ratio
        orig = s["bboxes"][0]
        np.testing.assert_allclose(b[2] / b[3], orig[2] / orig[3],
                                   rtol=1e-4)


def test_crop_skipped_when_no_valid_person():
    cfg = get_config("mpii_r18_384")
    s = _one_sample(cfg)
    dcfg = _identity_dcfg(cfg.data, crop_prob=1.0)
    novalid = np.zeros_like(s["valid"])
    img, kp, vis, box, val = augment_single(
        cfg.model, dcfg, jax.random.PRNGKey(0), s["image"], s["keypoints"],
        s["visible"], s["bboxes"], novalid)
    # no person → identity affine → pixels unchanged
    np.testing.assert_allclose(np.asarray(img), s["image"], atol=1e-5)


def test_saturation_and_sharpness_jitter():
    cfg = get_config("mpii_r18_384")
    s = _one_sample(cfg)
    dcfg = _identity_dcfg(cfg.data, saturation_jitter=0.3,
                          sharpness_jitter=0.5)
    img, *_ = augment_single(
        cfg.model, dcfg, jax.random.PRNGKey(3), s["image"], s["keypoints"],
        s["visible"], s["bboxes"], s["valid"])
    img = np.asarray(img)
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert not np.allclose(img, s["image"], atol=1e-4)  # ops did something
    # saturation preserves luma: gray pixels stay gray
    gray_in = np.full((8, 8, 3), 0.5, np.float32)
    dcfg2 = _identity_dcfg(cfg.data, saturation_jitter=0.3)
    import dataclasses as dc

    tiny = get_config("tiny_test")
    g, *_ = augment_single(
        dc.replace(tiny.model, insize=(8, 8)), dcfg2, jax.random.PRNGKey(1),
        gray_in, np.zeros((3, tiny.model.num_keypoints, 2), np.float32),
        np.zeros((3, tiny.model.num_keypoints), bool),
        np.zeros((3, 4), np.float32), np.zeros((3,), bool))
    np.testing.assert_allclose(np.asarray(g), gray_in, atol=1e-5)


def test_augment_batch_shapes_and_jit():
    cfg = get_config("tiny_test")
    ds = SyntheticPoseDataset(cfg, size=4, seed=5)
    from ppn_tpu.data.pipeline import collate

    batch = collate([ds[i] for i in range(4)])
    batch.pop("headsizes", None)
    fn = jax.jit(lambda k, b: augment_batch(cfg.model, cfg.data, k, b))
    out = fn(jax.random.PRNGKey(0), batch)
    for k in ("image", "keypoints", "visible", "bboxes", "valid"):
        assert out[k].shape == batch[k].shape, k


def test_train_step_with_augmentation_runs():
    import dataclasses as dc

    from ppn_tpu.data.pipeline import collate
    from ppn_tpu.train import steps as stp

    cfg = get_config("tiny_test")
    cfg = dc.replace(cfg, train=dc.replace(cfg.train, batch_size=2))
    ds = SyntheticPoseDataset(cfg, size=2, seed=5)
    batch = collate([ds[i] for i in range(2)])
    graphdef, state, tx = stp.create_train_state(cfg)
    step = stp.make_train_step(cfg, graphdef, tx, augment=True)
    state1, terms = step(state, batch)
    assert np.isfinite(float(terms["loss_total"]))
    # rng must advance so the next step draws new augmentations
    assert not np.array_equal(np.asarray(jax.random.key_data(state1.rng)),
                              np.asarray(jax.random.key_data(
                                  jax.random.PRNGKey(cfg.train.seed))))

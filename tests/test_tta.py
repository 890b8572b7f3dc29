"""Flip-TTA correctness (ops/tta.py).

The mirror map must be *algebraically* exact: a feature map encoded from
mirrored ground truth, mapped back, must match the feature map encoded from
the original ground truth — including the limb window channels.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ppn_tpu.configs import get_config
from ppn_tpu.ops import encode as enc
from ppn_tpu.ops import tta


def _flip_gt(cfg, kp, vis, boxes, valid):
    """Mirror GT about the vertical axis with L/R class swap."""
    W = cfg.insize[1]
    perm = np.asarray(tta.class_permutation(cfg))[1:] - 1   # over K joints
    kp_f = kp.copy()
    kp_f[..., 0] = W - kp_f[..., 0]
    kp_f = kp_f[:, perm]
    vis_f = vis[:, perm]
    boxes_f = boxes.copy()
    boxes_f[..., 0] = W - boxes_f[..., 0]   # center-format cx mirrors
    return kp_f, vis_f, boxes_f, valid


def _sample(cfg, seed=3):
    from ppn_tpu.data.synthetic import SyntheticPoseDataset

    return SyntheticPoseDataset(cfg, size=1, seed=seed, num_persons=2)[0]


def test_class_and_edge_permutations_are_involutions():
    cfg = get_config("mpii_r18_384").model
    cp = tta.class_permutation(cfg)
    ep = tta.edge_permutation(cfg)
    assert cp[0] == 0
    assert np.array_equal(cp[cp], np.arange(cfg.num_classes))
    assert np.array_equal(ep[ep], np.arange(cfg.num_limbs))
    # instance->thorax is self-mirrored; thorax->r_shoulder <-> thorax->l_shoulder
    edges = list(cfg.edges)
    assert ep[edges.index((0, 3))] == edges.index((0, 3))
    assert ep[edges.index((3, 4))] == edges.index((3, 7))


@pytest.mark.parametrize("config", ["mpii_r18_384", "coco_r18_384"])
def test_flip_feature_map_matches_mirrored_encode(config):
    cfg = get_config(config).model
    s = _sample(get_config(config))
    fm = enc.targets_to_feature_map(cfg, enc.encode_single(
        cfg, s["keypoints"], s["visible"], s["bboxes"], s["valid"]))

    kp_f, vis_f, boxes_f, valid = _flip_gt(
        cfg, np.asarray(s["keypoints"]), np.asarray(s["visible"]),
        np.asarray(s["bboxes"]), np.asarray(s["valid"]))
    fm_f = enc.targets_to_feature_map(cfg, enc.encode_single(
        cfg, kp_f, vis_f, boxes_f, valid))

    back = np.asarray(tta.flip_feature_map(cfg, fm_f))
    fm = np.asarray(fm)
    K1 = cfg.num_classes
    # resp/conf and limb channels must match everywhere; offset/size
    # channels only at responsible cells (elsewhere they are don't-care —
    # the loss masks them by delta and decode gates them by score, and
    # tx=0 at empty cells negates to logit(1) instead of logit(0)).
    np.testing.assert_allclose(back[..., :2 * K1], fm[..., :2 * K1],
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(back[..., 6 * K1:], fm[..., 6 * K1:],
                               rtol=0, atol=1e-4)
    resp = fm[..., :K1] > 0
    for g in range(2, 6):
        grp = slice(g * K1, (g + 1) * K1)
        np.testing.assert_allclose(back[..., grp][resp], fm[..., grp][resp],
                                   rtol=0, atol=1e-4)


def test_flip_feature_map_is_involution():
    cfg = get_config("mpii_r18_384").model
    rng = np.random.default_rng(0)
    fm = rng.standard_normal(
        (2, *cfg.outsize, cfg.num_channels)).astype(np.float32)
    twice = tta.flip_feature_map(cfg, tta.flip_feature_map(cfg, fm))
    np.testing.assert_allclose(np.asarray(twice), fm, rtol=0, atol=0)


def test_mirror_images_is_involution_and_matches_warp_convention():
    rng = np.random.default_rng(4)
    x = rng.random((1, 4, 6, 3), np.float32)
    m = np.asarray(tta.mirror_images(x))
    # index u -> W-u (the augment flip-affine convention), not W-1-u
    np.testing.assert_array_equal(m[:, :, 1], x[:, :, 5])
    np.testing.assert_array_equal(m[:, :, 5], x[:, :, 1])
    np.testing.assert_array_equal(
        np.asarray(tta.mirror_images(m)), x)


def test_tta_forward_is_flip_invariant():
    """make_forward(flip_tta=True) commutes with mirroring the input:
    f(mirror(x)) == flip_feature_map(f(x)) — i.e. TTA output carries no
    left/right bias from the network weights."""
    from ppn_tpu.train import steps as st

    cfg = get_config("tiny_test")
    graphdef, state, _ = st.create_train_state(cfg)
    fwd = st.make_forward(cfg, graphdef, flip_tta=True)

    rng = np.random.default_rng(1)
    imgs = rng.random((2, *cfg.model.insize, 3), np.float32)
    fm = fwd(state, imgs)
    fm_m = fwd(state, np.asarray(tta.mirror_images(imgs)))
    np.testing.assert_allclose(
        np.asarray(tta.flip_feature_map(cfg.model, fm_m)), np.asarray(fm),
        rtol=0, atol=2e-5)


def test_tta_forward_matches_plain_on_symmetric_weights():
    """On a mirror-symmetric input and symmetric init the merged map equals
    each branch — sanity that merging averages rather than double-counts."""
    cfg = get_config("mpii_r18_384").model
    fm = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, *cfg.outsize, cfg.num_channels)).astype(np.float32))
    merged = tta.merge_flip_tta(cfg, fm, tta.flip_feature_map(cfg, fm))
    np.testing.assert_allclose(np.asarray(merged), np.asarray(fm),
                               rtol=0, atol=1e-6)

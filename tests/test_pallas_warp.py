"""Pallas VMEM-resident warp vs the dense two-pass MXU warp.

Runs the kernel in Pallas interpret mode on CPU (the same code path the
TPU compiles via Mosaic) and compares against affine_warp_separable — the
same hat weights and precision chain, so agreement is bit-level except at
weight-argument rounding boundaries (a handful of pixels per image, each
off by one bf16 ulp).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppn_tpu.configs import get_config
from ppn_tpu.data.synthetic import SyntheticPoseDataset
from ppn_tpu.ops.image import affine_warp_separable, make_affine
from ppn_tpu.ops.pallas_warp import affine_warp_batch_pallas

CASES = [
    (0.0, 1.0, 0.0, False),      # identity
    (0.3, 1.1, 12.0, False),     # mild rotate + zoom-in + translate
    (-0.5, 0.8, -7.0, False),    # rotate the other way + zoom-out
    (0.7, 1.25, 3.0, True),      # heavy rotate + flip (negative r path)
    (0.69, 3.9, 50.0, False),    # near the max zoom clip
    (-0.69, 0.26, -120.0, True), # near max zoom-out + large shift + flip
]


def _image():
    cfg = get_config("mpii_r18_384")
    ds = SyntheticPoseDataset(cfg, size=1, seed=21, num_persons=1)
    return jnp.asarray(ds[0]["image"])


@pytest.mark.parametrize("angle,scale,tx,flip", CASES)
def test_pallas_warp_matches_separable(angle, scale, tx, flip):
    img = _image()
    H, W = img.shape[:2]
    center = jnp.asarray([W / 2, H / 2], jnp.float32)
    bwd, _ = make_affine(center, center, jnp.float32(angle),
                         jnp.float32(scale),
                         jnp.asarray([tx, -tx], jnp.float32), flip)
    got = np.asarray(affine_warp_batch_pallas(img[None], bwd[None], True))[0]
    want = np.asarray(affine_warp_separable(img, bwd, (H, W)))
    d = np.abs(got - want)
    # ≤1 bf16 ulp at isolated weight-rounding boundaries; fields identical
    # (extreme zooms hit more boundaries — still single-ulp, still sparse)
    assert d.max() <= 5e-3, d.max()
    assert d.mean() < 1e-6, d.mean()
    assert (d > 1e-5).mean() < 1e-2


def test_pallas_warp_batched_heterogeneous_matrices():
    """Each batch row warps with its own affine (per-image SMEM params)."""
    img = _image()
    H, W = img.shape[:2]
    center = jnp.asarray([W / 2, H / 2], jnp.float32)
    mats = []
    for angle, scale, tx, flip in CASES[:3]:
        bwd, _ = make_affine(center, center, jnp.float32(angle),
                             jnp.float32(scale),
                             jnp.asarray([tx, -tx], jnp.float32), flip)
        mats.append(bwd)
    imgs = jnp.stack([img] * 3)
    got = np.asarray(affine_warp_batch_pallas(imgs, jnp.stack(mats), True))
    for i, (angle, scale, tx, flip) in enumerate(CASES[:3]):
        want = np.asarray(affine_warp_separable(img, mats[i], (H, W)))
        assert np.abs(got[i] - want).max() <= 5e-3, i


@pytest.mark.parametrize("angle,scale,tx,flip", CASES[:4])
def test_pallas_warp_bf16_io_matches_f32_rounded(angle, scale, tx, flip):
    """bfloat16 image in/out (the train-step hot path) changes only where
    the rounding lands: pixels hit the matmul operands as bf16 either
    way, so warp(bf16 img) == round_bf16(warp_f32(bf16 img)) exactly."""
    img = _image()
    H, W = img.shape[:2]
    center = jnp.asarray([W / 2, H / 2], jnp.float32)
    bwd, _ = make_affine(center, center, jnp.float32(angle),
                         jnp.float32(scale),
                         jnp.asarray([tx, -tx], jnp.float32), flip)
    img16 = img.astype(jnp.bfloat16)
    got16 = affine_warp_batch_pallas(img16[None], bwd[None], True)[0]
    assert got16.dtype == jnp.bfloat16
    want = affine_warp_batch_pallas(
        img16.astype(jnp.float32)[None], bwd[None], True)[0]
    np.testing.assert_array_equal(
        np.asarray(got16), np.asarray(want.astype(jnp.bfloat16)))


def test_augment_batch_bf16_dtype_flows_through():
    """augment_dtype=bfloat16 (the default) yields a bfloat16 image with
    identical GT transforms; pixels match the float32 chain to bf16
    resolution."""
    import dataclasses as dc

    from ppn_tpu.ops import augment as aug

    cfg = get_config("mpii_r18_384")
    ds = SyntheticPoseDataset(cfg, size=2, seed=11)
    from ppn_tpu.data.pipeline import collate

    batch = collate([ds[i] for i in range(2)])
    batch.pop("headsizes", None)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(5)
    d16 = dc.replace(cfg.data, augment_dtype="bfloat16")
    d32 = dc.replace(cfg.data, augment_dtype="float32")
    # exercise the TPU batch path explicitly (CPU backend would take the
    # vmapped-single route): sample → warp(interpret) → color
    keys = jax.random.split(key, 2)
    bwd, fwd, scale, flip, color = jax.vmap(
        lambda k, bx, vl: aug._sample_params(cfg.model, d16, k, bx, vl)
    )(keys, batch["bboxes"], batch["valid"])
    out16 = affine_warp_batch_pallas(
        batch["image"].astype(jnp.bfloat16), bwd, True)
    out16 = jax.vmap(lambda o, b, c, s, sh:
                     aug._apply_color(d16, o, (b, c, s, sh)))(out16, *color)
    out32 = affine_warp_batch_pallas(batch["image"], bwd, True)
    out32 = jax.vmap(lambda o, b, c, s, sh:
                     aug._apply_color(d32, o, (b, c, s, sh)))(out32, *color)
    assert out16.dtype == jnp.bfloat16
    assert out32.dtype == jnp.float32
    d = np.abs(np.asarray(out16, np.float32) - np.asarray(out32))
    # the bf16 chain rounds at each color stage (warp, contrast,
    # saturation, sharpness, clip) and jitter factors scale up to ~1.2×:
    # a few stacked half-ulp roundings on [0, 1.2] pixels bound at
    # ~4 · 2⁻⁹ · 1.2 ≈ 0.009 (measured max 0.0084); mean stays at bf16
    # noise
    assert d.max() <= 2 ** -6, d.max()
    assert d.mean() <= 2 ** -10, d.mean()


def test_augment_batch_tpu_path_matches_single_path():
    """The batched-warp augment path (vmapped params + one Pallas warp)
    draws the identical random stream: GT transforms match the
    augment_single path exactly and pixels match to warp tolerance."""
    from ppn_tpu.ops import augment as aug

    cfg = get_config("mpii_r18_384")
    dcfg = dataclasses.replace(cfg.data)
    ds = SyntheticPoseDataset(cfg, size=2, seed=7)
    from ppn_tpu.data.pipeline import collate

    batch = collate([ds[i] for i in range(2)])
    batch.pop("headsizes", None)
    key = jax.random.PRNGKey(3)
    keys = jax.random.split(key, 2)

    # reference: per-image augment_single (cpu gather warp)
    want = [aug.augment_single(cfg.model, dcfg, keys[i], batch["image"][i],
                               batch["keypoints"][i], batch["visible"][i],
                               batch["bboxes"][i], batch["valid"][i])
            for i in range(2)]

    # the TPU batch path, minus the backend switch: sample → pallas warp
    # (interpret) → color → gt
    bwd, fwd, scale, flip, color = jax.vmap(
        lambda k, bx, vl: aug._sample_params(cfg.model, dcfg, k, bx, vl)
    )(keys, batch["bboxes"], batch["valid"])
    out = affine_warp_batch_pallas(jnp.asarray(batch["image"]), bwd, True)
    out = jax.vmap(lambda o, b, c, s, sh:
                   aug._apply_color(dcfg, o, (b, c, s, sh)))(out, *color)
    kp, vis, box = jax.vmap(
        lambda f, sc, fl, p, v, bx:
        aug._transform_gt(cfg.model, f, sc, fl, p, v, bx)
    )(fwd, scale, flip, batch["keypoints"], batch["visible"],
      batch["bboxes"])

    for i in range(2):
        w_img, w_kp, w_vis, w_box, _ = want[i]
        # same draws ⇒ identical GT transforms
        np.testing.assert_allclose(np.asarray(kp[i]), np.asarray(w_kp),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(vis[i]), np.asarray(w_vis))
        np.testing.assert_allclose(np.asarray(box[i]), np.asarray(w_box),
                                   rtol=1e-5, atol=1e-4)
        # pixels: separable vs gather warp differ slightly under rotation
        d = np.abs(np.asarray(out[i]) - np.asarray(w_img))
        assert d.mean() < 0.02, d.mean()

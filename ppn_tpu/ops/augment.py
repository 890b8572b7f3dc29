"""On-device training augmentation (ref:dataset.py† ``augment_*``,
SURVEY.md §2.1 Augmentation row), fused and batched.

Per image: random rotation (±rotate_deg), scale jitter, translation,
horizontal flip **with left/right keypoint-class swap**, and color jitter —
the reference's PIL pipeline — implemented as one inverse-warp bilinear
gather plus elementwise math, vmapped over the batch and run inside the
jitted train step (BASELINE: on-device resize/normalize/affine-augment).

Keypoints/boxes are transformed with the matching forward matrix so the
augmented GT stays consistent with the augmented pixels.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ppn_tpu.configs.base import DataConfig, PPNConfig
from ppn_tpu.ops.image import (
    affine_warp,
    affine_warp_separable,
    apply_affine_points,
    make_affine,
)


def _flip_permutation(cfg: PPNConfig) -> jnp.ndarray:
    """Permutation over the K true keypoints (class index − 1) swapping
    left/right pairs."""
    perm = list(range(cfg.num_keypoints))
    for a, b in cfg.flip_pairs:
        perm[a - 1], perm[b - 1] = perm[b - 1], perm[a - 1]
    return jnp.asarray(perm, jnp.int32)


def augment_single(
    cfg: PPNConfig,
    dcfg: DataConfig,
    key: jax.Array,
    image: jnp.ndarray,      # (H, W, 3) float32 [0,1] at insize
    keypoints: jnp.ndarray,  # (P, K, 2)
    visible: jnp.ndarray,    # (P, K)
    bboxes: jnp.ndarray,     # (P, 4) cxcywh
    valid: jnp.ndarray,      # (P,)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    H, W = cfg.insize
    if image.dtype == jnp.uint8:
        image = image.astype(jnp.float32) / 255.0
    k_rot, k_scale, k_trans, k_flip, k_bright, k_contrast = (
        jax.random.split(key, 6))

    angle = jax.random.uniform(
        k_rot, (), minval=-dcfg.rotate_deg, maxval=dcfg.rotate_deg
    ) * (jnp.pi / 180.0)
    scale = jax.random.uniform(k_scale, (), minval=dcfg.scale_min,
                               maxval=dcfg.scale_max)
    trans = jax.random.uniform(
        k_trans, (2,), minval=-dcfg.translate_frac,
        maxval=dcfg.translate_frac) * jnp.asarray([W, H], jnp.float32)
    flip = jax.random.bernoulli(k_flip, dcfg.hflip_prob)

    center = jnp.asarray([W / 2.0, H / 2.0], jnp.float32)
    bwd, fwd = make_affine(center, center, angle, scale, trans, flip)

    # TPU: MXU-matmul two-pass warp (per-pixel gathers are scalar on TPU,
    # ~20× slower); CPU/GPU: direct bilinear gather.
    if jax.default_backend() == "tpu":
        out = affine_warp_separable(image, bwd, (H, W))
    else:
        out = affine_warp(image, bwd, (H, W))

    # color jitter: brightness + contrast around the per-image mean
    b = 1.0 + jax.random.uniform(k_bright, (), minval=-dcfg.color_jitter,
                                 maxval=dcfg.color_jitter)
    c = 1.0 + jax.random.uniform(k_contrast, (), minval=-dcfg.color_jitter,
                                 maxval=dcfg.color_jitter)
    mean = jnp.mean(out, axis=(0, 1), keepdims=True)
    out = jnp.clip(((out - mean) * c + mean) * b, 0.0, 1.0)

    # ---- GT transform -----------------------------------------------------
    kp = apply_affine_points(fwd, keypoints)
    centers = apply_affine_points(fwd, bboxes[..., :2])
    wh = bboxes[..., 2:] * scale  # axis-aligned approximation under rotation
    new_boxes = jnp.concatenate([centers, wh], axis=-1)

    # flip ⇒ swap left/right keypoint classes
    perm = _flip_permutation(cfg)
    kp = jnp.where(flip, kp[:, perm, :], kp)
    vis = jnp.where(flip, visible[:, perm], visible)

    # joints pushed outside the frame become invisible
    inb = ((kp[..., 0] >= 0) & (kp[..., 0] < W)
           & (kp[..., 1] >= 0) & (kp[..., 1] < H))
    vis = vis & inb
    return out, kp, vis, new_boxes, valid


def augment_batch(cfg: PPNConfig, dcfg: DataConfig, key: jax.Array,
                  batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Vmapped batch augmentation; composable inside the jitted train step."""
    B = batch["image"].shape[0]
    keys = jax.random.split(key, B)
    img, kp, vis, box, val = jax.vmap(
        lambda k, i, p, v, b, m: augment_single(cfg, dcfg, k, i, p, v, b, m)
    )(keys, batch["image"], batch["keypoints"], batch["visible"],
      batch["bboxes"], batch["valid"])
    return {"image": img, "keypoints": kp, "visible": vis, "bboxes": box,
            "valid": val}

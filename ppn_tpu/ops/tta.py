"""Horizontal-flip test-time augmentation, fused at the feature-map level.

Standard pose-estimation practice the reference lacks (ref:predict.py†
evaluates a single forward; SURVEY.md §3.2): run the model on the image and
its mirror, map the mirrored prediction back, and average — one postprocess
pass on the merged map. Averaging happens in *pre-activation* (logit) space,
so σ-activations combine as geometric-mean probabilities and the mirror
mapping is exact algebra, not resampling:

* grid columns reverse (W = W'·stride exactly, so cell j ↔ W'−1−j);
* the x-offset channel negates (σ(−t) = 1 − σ(t) ⇔ tx ↔ 1 − tx);
* keypoint classes swap left/right (``cfg.flip_pairs``; class 0 fixed);
* limb channels permute to the mirrored edge and reverse their window's
  x axis (``local_grid_size`` is validated odd, so the reversal is exact).

Everything is static-shape jnp — one extra forward, zero host round-trips —
and composes with jit (see ``train/steps.make_forward(flip_tta=True)``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ppn_tpu.configs.base import PPNConfig
from ppn_tpu.ops.decode import split_feature_map


def class_permutation(cfg: PPNConfig) -> np.ndarray:
    """Permutation over the K+1 classes under horizontal flip (0 fixed)."""
    perm = list(range(cfg.num_classes))
    for a, b in cfg.flip_pairs:
        perm[a], perm[b] = perm[b], perm[a]
    return np.asarray(perm, np.int32)


def edge_permutation(cfg: PPNConfig) -> np.ndarray:
    """Permutation over the L edges under horizontal flip.

    Edge (s, d) maps to (π(s), π(d)) with π the class permutation; the
    skeleton must be closed under the swap (true for the MPII/COCO trees).
    """
    cperm = class_permutation(cfg)
    index = {e: i for i, e in enumerate(cfg.edges)}
    perm = np.empty(len(cfg.edges), np.int32)
    for i, (s, d) in enumerate(cfg.edges):
        mirrored = (int(cperm[s]), int(cperm[d]))
        if mirrored not in index:
            raise ValueError(
                f"edge {(s, d)} has no mirrored edge {mirrored} — the "
                "skeleton is not closed under flip_pairs")
        perm[i] = index[mirrored]
    return perm


def flip_feature_map(cfg: PPNConfig, fm: jnp.ndarray) -> jnp.ndarray:
    """Map a raw feature map predicted on a mirrored image back to the
    original frame. Involution: ``flip(flip(fm)) == fm``."""
    raw = split_feature_map(cfg, fm)
    cperm = jnp.asarray(class_permutation(cfg))
    eperm = jnp.asarray(edge_permutation(cfg))

    def grp(g, negate=False):
        g = jnp.flip(g, axis=-2)[..., cperm]          # W' reverse + L/R swap
        return -g if negate else g

    e = jnp.flip(raw.e, axis=-4)                      # W' reverse
    e = jnp.take(e, eperm, axis=-3)                   # mirrored edges
    e = jnp.flip(e, axis=-1)                          # window x reverse
    e_flat = e.reshape(*e.shape[:-3], cfg.num_limb_channels)
    return jnp.concatenate(
        [grp(raw.resp), grp(raw.conf), grp(raw.x, negate=True),
         grp(raw.y), grp(raw.w), grp(raw.h), e_flat], axis=-1)


def mirror_images(images: jnp.ndarray) -> jnp.ndarray:
    """Mirror (B, H, W, C) pixels under the continuous x → W − x convention.

    This is the convention the augmentation flip-affine and the feature-map
    mirror algebra use (cell j ↔ W'−1−j with offset σ ↔ 1−σ decodes to
    exactly W − x). A bare ``jnp.flip`` maps index u → W−1−u, i.e.
    x → W−1−x — a systematic 1-pixel bias on the mirrored branch; rolling
    the flipped image right by one realigns it (index u → W−u, with the
    wrapped column matching an edge-clamped warp up to one border pixel).
    Exactly involutive: ``mirror_images(mirror_images(x)) == x``.
    """
    return jnp.roll(jnp.flip(images, axis=2), 1, axis=2)


def merge_flip_tta(cfg: PPNConfig, fm: jnp.ndarray,
                   fm_flipped: jnp.ndarray) -> jnp.ndarray:
    """Average the direct map with the mapped-back mirror prediction.

    ``fm_flipped`` is the raw model output on ``mirror_images(images)``.
    """
    fm = fm.astype(jnp.float32)
    return 0.5 * (fm + flip_feature_map(cfg, fm_flipped.astype(jnp.float32)))

"""Vectorized head decode: feature map → activations → boxes + scores.

The reference splits channels and decodes boxes in CPU Python/NumPy inside
``get_humans_by_feature`` (ref:predict.py†/ref:utils.py†, SURVEY.md §3.2).
Here the entire decode is shape-polymorphic jnp running on device — the
"sigmoid/exp box decode per cell as fully vectorized XLA ops" that
BASELINE.json's north-star mandates.

Feature-map layout (NHWC, grouped by quantity then class so slicing is a
single contiguous split):

    channels = [resp(K+1) | conf(K+1) | x(K+1) | y(K+1) | w(K+1) | h(K+1)
                | limbs(L·H_l·W_l)]
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ppn_tpu.configs.base import PPNConfig


class RawHead(NamedTuple):
    """Pre-activation channel groups, each (..., H', W', K+1) except e."""

    resp: jnp.ndarray
    conf: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    w: jnp.ndarray
    h: jnp.ndarray
    e: jnp.ndarray  # (..., H', W', L, H_l, W_l)


class Activations(NamedTuple):
    """Post-activation head quantities (same shapes as RawHead)."""

    resp: jnp.ndarray
    conf: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    w: jnp.ndarray
    h: jnp.ndarray
    e: jnp.ndarray


class Proposals(NamedTuple):
    """Decoded per-cell proposals.

    boxes: (..., H', W', K+1, 4) center-format pixels in the input frame.
    score: (..., H', W', K+1)    = resp·conf (ref:predict.py† scoring).
    """

    boxes: jnp.ndarray
    score: jnp.ndarray


def split_feature_map(cfg: PPNConfig, fm: jnp.ndarray) -> RawHead:
    """Split a (..., H', W', C) head output into its channel groups."""
    K1 = cfg.num_classes
    Hl, Wl = cfg.local_grid_size
    L = cfg.num_limbs
    if fm.shape[-1] != cfg.num_channels:
        raise ValueError(
            f"feature map has {fm.shape[-1]} channels, config expects "
            f"{cfg.num_channels}")
    groups = [fm[..., i * K1:(i + 1) * K1] for i in range(6)]
    e = fm[..., 6 * K1:].reshape(*fm.shape[:-1], L, Hl, Wl)
    return RawHead(*groups, e)


def activate(cfg: PPNConfig, raw: RawHead) -> Activations:
    """Output nonlinearities (SURVEY.md §2.3): σ on resp/conf/offsets/limbs;
    sizes via σ (lineage default) or exp (YOLOv2-style), per config."""
    resp = _sigmoid(raw.resp)
    conf = _sigmoid(raw.conf)
    x = _sigmoid(raw.x)
    y = _sigmoid(raw.y)
    if cfg.size_activation == "sigmoid":
        w = _sigmoid(raw.w)
        h = _sigmoid(raw.h)
    elif cfg.size_activation == "exp":
        w = jnp.exp(jnp.clip(raw.w, -10.0, 4.0))
        h = jnp.exp(jnp.clip(raw.h, -10.0, 4.0))
    else:
        raise ValueError(f"unknown size_activation {cfg.size_activation!r}")
    e = _sigmoid(raw.e)
    return Activations(resp=resp, conf=conf, x=x, y=y, w=w, h=h, e=e)


def _sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid in float32 (head may emit bfloat16)."""
    return jax.nn.sigmoid(x.astype(jnp.float32))


def decode_boxes(cfg: PPNConfig, act: Activations) -> Proposals:
    """Per-cell box decode: centers = (cell + σ(offset))·stride, sizes scaled
    by the input image size (SURVEY.md §2.1 Decode row)."""
    H, W = cfg.outsize
    sy, sx = cfg.stride
    img_h, img_w = cfg.insize

    # Cell index grids, broadcast over leading dims and the class dim.
    iy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)[..., None]
    ix = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)[..., None]

    cx = (ix + act.x) * sx
    cy = (iy + act.y) * sy
    bw = act.w * img_w
    bh = act.h * img_h
    boxes = jnp.stack([cx, cy, bw, bh], axis=-1)
    score = act.resp * act.conf
    return Proposals(boxes=boxes, score=score)


def decode(cfg: PPNConfig, fm: jnp.ndarray) -> tuple[Activations, Proposals]:
    """Full decode pipeline: raw head → activations → proposals."""
    act = activate(cfg, split_feature_map(cfg, fm))
    return act, decode_boxes(cfg, act)

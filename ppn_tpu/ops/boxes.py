"""Box utilities (center-format) shared by encode, loss, NMS and eval.

Boxes are ``(cx, cy, w, h)`` in pixels throughout the framework — the same
convention the reference decodes to in ref:predict.py† (SURVEY.md §2.1 Decode
row). Everything here is pure jnp, shape-polymorphic, and jit/vmap friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_area(wh: jnp.ndarray) -> jnp.ndarray:
    """Area from a trailing-dim-2 (w, h) array."""
    return wh[..., 0] * wh[..., 1]


def cxcywh_to_tlbr(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x0, y0, x1, y1)."""
    cx, cy, w, h = jnp.moveaxis(boxes, -1, 0)
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def iou_cxcywh(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Elementwise IoU of broadcast-compatible center-format boxes.

    Used both for the YOLO-style in-loss confidence target (SURVEY.md §2.3
    λ_iou term) and for NMS overlap tests.
    """
    ax0 = a[..., 0] - a[..., 2] / 2
    ay0 = a[..., 1] - a[..., 3] / 2
    ax1 = a[..., 0] + a[..., 2] / 2
    ay1 = a[..., 1] + a[..., 3] / 2
    bx0 = b[..., 0] - b[..., 2] / 2
    by0 = b[..., 1] - b[..., 3] / 2
    bx1 = b[..., 0] + b[..., 2] / 2
    by1 = b[..., 1] + b[..., 3] / 2

    iw = jnp.maximum(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0.0)
    ih = jnp.maximum(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0.0)
    inter = iw * ih
    union = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return inter / jnp.maximum(union, eps)


def pairwise_iou_cxcywh(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs IoU: a (..., N, 4) × b (..., M, 4) -> (..., N, M).

    The O(N²) boolean-matrix form used by the masked TPU NMS
    (SURVEY.md §7.3: N per class is small, the dense matrix is cheap).
    """
    return iou_cxcywh(a[..., :, None, :], b[..., None, :, :])


def pairwise_overlap_above_cxcywh(a: jnp.ndarray, b: jnp.ndarray,
                                  thresh: float,
                                  eps: float = 1e-9) -> jnp.ndarray:
    """All-pairs "IoU > thresh" decision, divide-free.

    ``inter > thresh·max(union, eps)`` is decision-equivalent to
    ``inter/max(union, eps) > thresh`` in exact arithmetic (union ≥ 0)
    and skips the divide — on the TPU VPU a divide is a multi-pass op,
    and NMS evaluates this over the dense (N, N) mask per class. The
    Pallas postprocess kernels use the same multiply form, keeping the
    kernel↔oracle decision parity exact.
    """
    ax0 = a[..., :, None, 0] - a[..., :, None, 2] / 2
    ay0 = a[..., :, None, 1] - a[..., :, None, 3] / 2
    ax1 = a[..., :, None, 0] + a[..., :, None, 2] / 2
    ay1 = a[..., :, None, 1] + a[..., :, None, 3] / 2
    bx0 = b[..., None, :, 0] - b[..., None, :, 2] / 2
    by0 = b[..., None, :, 1] - b[..., None, :, 3] / 2
    bx1 = b[..., None, :, 0] + b[..., None, :, 2] / 2
    by1 = b[..., None, :, 1] + b[..., None, :, 3] / 2

    iw = jnp.maximum(jnp.minimum(ax1, bx1) - jnp.maximum(ax0, bx0), 0.0)
    ih = jnp.maximum(jnp.minimum(ay1, by1) - jnp.maximum(ay0, by0), 0.0)
    inter = iw * ih
    union = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return inter > thresh * jnp.maximum(union, eps)

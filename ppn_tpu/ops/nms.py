"""Per-class greedy IoU NMS on fixed-size tensors — on-device, exact.

The reference runs an O(n²) CPU Python loop per keypoint class
(ref:predict.py†/ref:utils.py† ``non_maximum_suppression``, SURVEY.md §2.1).
TPU-native replacement (SURVEY.md §7.3): every grid cell is a proposal
(N = H'·W' per class — 144 at the 12×12 grid), the full O(N²) IoU matrix is
computed per class on the VPU, and the *exact* sequential-greedy keep rule is
recovered with a ``lax.scan`` over score-sorted order doing cheap vector work
per step. Results are bit-identical to the reference algorithm: a proposal is
kept iff it clears ``detection_thresh`` and no higher-scored *kept* proposal
of the same class overlaps it above ``nms_thresh``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ppn_tpu.configs.base import PPNConfig
from ppn_tpu.ops import boxes as boxops
from ppn_tpu.ops.decode import Proposals


class NMSResult(NamedTuple):
    keep: jnp.ndarray   # (..., H', W', K+1) bool — surviving proposals
    score: jnp.ndarray  # (..., H', W', K+1) f32 — score where kept, else 0


def _suppression_matrix(cfg: PPNConfig, props: Proposals):
    """(K1, N, N) M[c, i, j] = "j can suppress i": j earlier in greedy order
    (higher score, ties by lower index — exactly argsort(-score, stable))
    and IoU(i, j) > nms_thresh. Plus the (K1, N) above-threshold mask."""
    H, W = cfg.outsize
    K1 = cfg.num_classes
    N = H * W
    score = props.score.reshape(N, K1).T                       # (K1, N)
    boxes = props.boxes.reshape(N, K1, 4).transpose(1, 0, 2)   # (K1, N, 4)

    overlap = boxops.pairwise_overlap_above_cxcywh(boxes, boxes,
                                                   cfg.nms_thresh)
    idx = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)       # i
    jdx = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)       # j
    earlier = ((score[:, None, :] > score[:, :, None])
               | ((score[:, None, :] == score[:, :, None]) & (jdx < idx)))
    above = score > cfg.detection_thresh
    M = overlap & earlier & above[:, None, :]  # only real proposals suppress
    return M, above, score


def nms_single(cfg: PPNConfig, props: Proposals) -> NMSResult:
    """Exact greedy NMS via parallel waves.

    Each wave keeps every undecided proposal whose earlier-ordered
    overlapping proposals are all decided-suppressed, then suppresses
    proposals overlapped by a kept one. This reaches the greedy fixpoint in
    ~2–5 dense iterations instead of N sequential scan steps — the same
    result as the reference's sequential loop, bit-for-bit (tested against
    a CPU oracle and the scan formulation).
    """
    H, W = cfg.outsize
    K1 = cfg.num_classes
    M, above, _ = _suppression_matrix(cfg, props)

    def cond(state):
        kept, undecided = state
        return jnp.any(undecided)

    def body(state):
        kept, undecided = state
        blocked = jnp.einsum("cij,cj->ci", M, kept,
                             preferred_element_type=jnp.float32) > 0
        undecided = undecided & ~blocked
        higher_open = jnp.einsum("cij,cj->ci", M, undecided,
                                 preferred_element_type=jnp.float32) > 0
        newly_keep = undecided & ~higher_open
        kept = kept | newly_keep
        undecided = undecided & ~newly_keep
        return kept, undecided

    kept0 = jnp.zeros_like(above)
    kept, _ = jax.lax.while_loop(cond, body, (kept0, above))
    keep = kept.T.reshape(H, W, K1)
    return NMSResult(keep=keep, score=jnp.where(keep, props.score, 0.0))


def nms_single_scan(cfg: PPNConfig, props: Proposals) -> NMSResult:
    """Reference formulation: sequential greedy via lax.scan over sorted
    order. Kept as a cross-check oracle for the wave version."""
    H, W = cfg.outsize
    K1 = cfg.num_classes
    N = H * W

    score = props.score.reshape(N, K1).T              # (K1, N)
    boxes = props.boxes.reshape(N, K1, 4).transpose(1, 0, 2)  # (K1, N, 4)

    order = jnp.argsort(-score, axis=-1)              # (K1, N) high→low
    s_sorted = jnp.take_along_axis(score, order, axis=-1)
    b_sorted = jnp.take_along_axis(boxes, order[..., None], axis=1)

    overlap = boxops.pairwise_overlap_above_cxcywh(
        b_sorted, b_sorted, cfg.nms_thresh)               # (K1, N, N)
    above = s_sorted > cfg.detection_thresh

    idx = jax.lax.broadcasted_iota(jnp.int32, (K1, N), 1)

    def body(keep, i):
        # suppressed iff any earlier kept proposal overlaps this one
        earlier = idx < i                               # (K1, N)
        sup = jnp.any(overlap[:, i, :] & keep & earlier, axis=-1)
        keep = keep.at[:, i].set(above[:, i] & ~sup)
        return keep, None

    keep0 = jnp.zeros((K1, N), bool)
    keep_sorted, _ = jax.lax.scan(body, keep0, jnp.arange(N))

    # Unsort back to cell order.
    inv = jnp.argsort(order, axis=-1)
    keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)  # (K1, N)
    keep = keep.T.reshape(H, W, K1)
    return NMSResult(keep=keep, score=jnp.where(keep, props.score, 0.0))


def nms_batch(cfg: PPNConfig, props: Proposals) -> NMSResult:
    """Batched NMS via vmap: props leaves have a leading batch dim."""
    return jax.vmap(lambda b, s: nms_single(cfg, Proposals(b, s)))(
        props.boxes, props.score)

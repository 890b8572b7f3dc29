"""Greedy limb parsing (person assembly) on fixed-size tensors, on device.

The reference assembles persons in CPU Python (ref:predict.py†
``get_humans_by_feature`` second half, SURVEY.md §2.1): seed one person per
surviving `instance` proposal, walk the directed limb tree, and for each edge
(s→t) pick the t-candidate inside the local window around s's cell maximizing
limb-probability × t-score; finally drop persons with too few keypoints.

TPU-native version (SURVEY.md §7.3): static `max_instances` person slots via
top-k over the instance score map; the L-edge walk is a static Python loop
(L ≤ 17) of vmapped gathers/argmaxes over the (H_l, W_l) window — all shapes
fixed, fully jittable, batched with vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ppn_tpu.configs.base import PPNConfig
from ppn_tpu.ops.decode import Activations, Proposals
from ppn_tpu.ops.nms import NMSResult


class People(NamedTuple):
    """Fixed-shape parsed output, one row per person slot.

    kp_cell:  (P, K+1, 2) int32 — (iy, ix) grid cell per class (0 = instance)
    kp_box:   (P, K+1, 4) f32   — decoded box at that cell (cx, cy, w, h) px
    kp_score: (P, K+1) f32      — proposal score at that cell
    kp_valid: (P, K+1) bool     — keypoint found for this person
    valid:    (P,) bool         — person survives min_num_keypoints filter
    num_kp:   (P,) int32        — number of valid true keypoints (excl. inst.)
    """

    kp_cell: jnp.ndarray
    kp_box: jnp.ndarray
    kp_score: jnp.ndarray
    kp_valid: jnp.ndarray
    valid: jnp.ndarray
    num_kp: jnp.ndarray


def _edge_best_maps_flat(cfg: PPNConfig, e: jnp.ndarray,
                         score: jnp.ndarray) -> jnp.ndarray:
    """Dense per-edge best-destination maps, shared by all person slots.

    For every source cell n (flat) and limb l:
        best over the (H_l, W_l) window of  e[n, l, j] · score_dst(nbr(j, n))

    Returns maps (H·W, L, 3) = [best_val, dst_flat_cell, dst_score].

    Formulation: each window offset j is a flat-index roll of the dst score
    map (wrap artifacts masked by a static in-bounds table); the winner is
    selected with a first-max one-hot reduction — no gathers, no
    take_along_axis, fully vectorized (the TPU-friendly version of the
    reference's per-candidate CPU loop).
    """
    H, W = cfg.outsize
    Hl, Wl = cfg.local_grid_size
    K1 = cfg.num_classes
    L = cfg.num_limbs
    N = H * W
    NW = Hl * Wl
    ch, cw = Hl // 2, Wl // 2

    dst = jnp.asarray([d for _, d in cfg.edges], jnp.int32)
    D = score.reshape(N, K1)[:, dst]                       # (N, L)

    shifts = [(j // Wl - ch) * W + (j % Wl - cw) for j in range(NW)]
    rolls = jnp.stack([jnp.roll(D, -s, axis=0) for s in shifts],
                      axis=0)                              # (NW, N, L)

    # static in-bounds + clipped neighbor-index tables
    n_idx = np.arange(N)
    yy = n_idx // W
    xx = n_idx % W
    nbrv = np.zeros((NW, N), bool)
    nbrc = np.zeros((NW, N), np.float32)
    for j, s in enumerate(shifts):
        dy, dx = j // Wl - ch, j % Wl - cw
        okj = (yy + dy >= 0) & (yy + dy < H) & (xx + dx >= 0) & (xx + dx < W)
        nbrv[j] = okj
        nbrc[j] = np.where(okj, n_idx + s, 0)
    nbrv_a = jnp.asarray(nbrv)[..., None]                  # (NW, N, 1)
    nbrc_a = jnp.asarray(nbrc)[..., None]

    e_t = jnp.transpose(e.reshape(N, L, NW), (2, 0, 1))    # (NW, N, L)
    esc = jnp.where(nbrv_a, e_t * rolls, 0.0)

    bv = jnp.max(esc, axis=0)                              # (N, L)
    jrow = jax.lax.broadcasted_iota(jnp.int32, (NW, N, L), 0)
    is_best = (esc == bv[None]) & (bv[None] > 0.0)
    firstj = jnp.min(jnp.where(is_best, jrow, NW), axis=0)  # (N, L)
    onehot = (jrow == firstj[None]).astype(jnp.float32)
    dst_flat = jnp.sum(onehot * nbrc_a, axis=0)
    dst_score = jnp.sum(onehot * rolls, axis=0)
    return jnp.stack([bv, dst_flat, dst_score], axis=-1)   # (N, L, 3)


def parse_single(cfg: PPNConfig, act: Activations, props: Proposals,
                 nms: NMSResult) -> People:
    """Assemble persons for one image from post-NMS proposals."""
    H, W = cfg.outsize
    K1 = cfg.num_classes
    P = cfg.max_instances

    score = nms.score                      # (H, W, K1), zeroed where dropped
    boxes = props.boxes                    # (H, W, K1, 4)

    # per-edge maps: flat cell → (best_val, dst_flat_cell, dst_score)
    maps = _edge_best_maps_flat(cfg, act.e, score)     # (H·W, L, 3)

    # ---- seed: top-P surviving instance proposals --------------------------
    inst = score[..., 0].reshape(-1)       # (H·W,)
    top_v, top_i = jax.lax.top_k(inst, P)
    seed_valid = top_v > 0.0

    # Per-class state as static Python lists — the edge walk then emits one
    # gather + a few elementwise ops per edge instead of scatter updates.
    cell_f = [jnp.zeros((P,), jnp.int32) for _ in range(K1)]   # flat cells
    score_c = [jnp.zeros((P,), jnp.float32) for _ in range(K1)]
    valid_c = [jnp.zeros((P,), bool) for _ in range(K1)]
    cell_f[0] = top_i
    score_c[0] = top_v
    valid_c[0] = seed_valid

    for l, (s_cls, d_cls) in enumerate(cfg.edges):
        entry = maps[:, l, :][cell_f[s_cls]]           # (P, 3) single gather
        ok = valid_c[s_cls] & (entry[:, 0] > 0.0)
        cell_f[d_cls] = jnp.where(ok, entry[:, 1].astype(jnp.int32), 0)
        score_c[d_cls] = jnp.where(ok, entry[:, 2], 0.0)
        valid_c[d_cls] = ok

    kp_flat = jnp.stack(cell_f, axis=1)                # (P, K1)
    kp_score = jnp.stack(score_c, axis=1)
    kp_valid = jnp.stack(valid_c, axis=1)
    kp_cell = jnp.stack([kp_flat // W, kp_flat % W], axis=-1)

    # ---- gather boxes at assigned cells ------------------------------------
    cls_idx = jnp.arange(K1)[None, :]
    kp_box = boxes.reshape(H * W, K1, 4)[kp_flat, cls_idx]  # (P, K1, 4)
    kp_box = jnp.where(kp_valid[..., None], kp_box, 0.0)

    num_kp = jnp.sum(kp_valid[:, 1:], axis=-1).astype(jnp.int32)
    valid = kp_valid[:, 0] & (num_kp >= cfg.min_num_keypoints)
    return People(kp_cell=kp_cell, kp_box=kp_box, kp_score=kp_score,
                  kp_valid=kp_valid & valid[:, None], valid=valid,
                  num_kp=num_kp)


def parse_batch(cfg: PPNConfig, act: Activations, props: Proposals,
                nms: NMSResult) -> People:
    return jax.vmap(
        lambda a, p, n: parse_single(cfg, a, p, n))(act, props, nms)

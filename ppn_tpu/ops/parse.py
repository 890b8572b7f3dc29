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


def _edge_best_maps(cfg: PPNConfig, e: jnp.ndarray, score: jnp.ndarray):
    """Dense per-edge best-destination maps, shared by all person slots.

    For every source cell (y, x) and limb l:
        best over the (H_l, W_l) window of  e[y,x,l,dy,dx] · score_dst
    Returns (best_val, dst_iy, dst_ix, dst_score), each (H, W, L).

    This replaces per-person windowed gathers (P·81 dynamic gathers per
    edge) with one dense, fully-vectorized computation — the TPU-friendly
    formulation of the reference's per-candidate loop.
    """
    H, W = cfg.outsize
    Hl, Wl = cfg.local_grid_size
    L = cfg.num_limbs
    ch, cw = Hl // 2, Wl // 2

    dst = jnp.asarray([d for _, d in cfg.edges], jnp.int32)
    score_d = score[..., dst]                              # (H, W, L)
    padded = jnp.pad(score_d, ((ch, ch), (cw, cw), (0, 0)))

    # windows[y, x, l, dy·Wl+dx] = score of dst cell (y+dy−ch, x+dx−cw)
    windows = jnp.stack(
        [padded[dy:dy + H, dx:dx + W] for dy in range(Hl)
         for dx in range(Wl)], axis=-1)                     # (H, W, L, Hl·Wl)

    esc = e.reshape(H, W, L, Hl * Wl) * windows
    best = jnp.argmax(esc, axis=-1)                        # (H, W, L)
    best_val = jnp.take_along_axis(esc, best[..., None], axis=-1)[..., 0]
    dst_score = jnp.take_along_axis(windows, best[..., None],
                                    axis=-1)[..., 0]

    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W, L), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W, L), 1)
    dst_iy = jnp.clip(iy + best // Wl - ch, 0, H - 1)
    dst_ix = jnp.clip(ix + best % Wl - cw, 0, W - 1)
    return best_val, dst_iy, dst_ix, dst_score


def parse_single(cfg: PPNConfig, act: Activations, props: Proposals,
                 nms: NMSResult) -> People:
    """Assemble persons for one image from post-NMS proposals."""
    H, W = cfg.outsize
    K1 = cfg.num_classes
    P = cfg.max_instances

    score = nms.score                      # (H, W, K1), zeroed where dropped
    boxes = props.boxes                    # (H, W, K1, 4)

    best_val, dst_iy, dst_ix, dst_score = _edge_best_maps(
        cfg, act.e, score)
    # one fused per-edge map: flat cell → (best_val, dst_flat, dst_score)
    L = cfg.num_limbs
    dst_flat = (dst_iy * W + dst_ix).astype(jnp.float32)
    maps = jnp.stack(
        [best_val.reshape(H * W, L), dst_flat.reshape(H * W, L),
         dst_score.reshape(H * W, L)], axis=-1)        # (H·W, L, 3)

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

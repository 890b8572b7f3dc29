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


def parse_single(cfg: PPNConfig, act: Activations, props: Proposals,
                 nms: NMSResult) -> People:
    """Assemble persons for one image from post-NMS proposals."""
    H, W = cfg.outsize
    Hl, Wl = cfg.local_grid_size
    K1 = cfg.num_classes
    P = cfg.max_instances

    score = nms.score                      # (H, W, K1), zeroed where dropped
    boxes = props.boxes                    # (H, W, K1, 4)
    e = act.e                              # (H, W, L, Hl, Wl)

    # ---- seed: top-P surviving instance proposals --------------------------
    inst = score[..., 0].reshape(-1)       # (H·W,)
    top_v, top_i = jax.lax.top_k(inst, P)
    seed_iy = top_i // W
    seed_ix = top_i % W
    seed_valid = top_v > 0.0

    kp_cell = jnp.zeros((P, K1, 2), jnp.int32)
    kp_score = jnp.zeros((P, K1), jnp.float32)
    kp_valid = jnp.zeros((P, K1), bool)
    kp_cell = kp_cell.at[:, 0, 0].set(seed_iy).at[:, 0, 1].set(seed_ix)
    kp_score = kp_score.at[:, 0].set(top_v)
    kp_valid = kp_valid.at[:, 0].set(seed_valid)

    dy_off = jax.lax.broadcasted_iota(jnp.int32, (Hl, Wl), 0) - Hl // 2
    dx_off = jax.lax.broadcasted_iota(jnp.int32, (Hl, Wl), 1) - Wl // 2

    # ---- walk the limb tree (static L-iteration loop) ----------------------
    for l, (s_cls, d_cls) in enumerate(cfg.edges):

        def extend(src_cell, src_ok):
            ys, xs = src_cell[0], src_cell[1]
            win = e[ys, xs, l]                            # (Hl, Wl) limb prob
            yc = ys + dy_off
            xc = xs + dx_off
            inb = (yc >= 0) & (yc < H) & (xc >= 0) & (xc < W)
            ycc = jnp.clip(yc, 0, H - 1)
            xcc = jnp.clip(xc, 0, W - 1)
            cand = score[ycc, xcc, d_cls]                 # (Hl, Wl)
            esc = jnp.where(inb & src_ok, win * cand, 0.0)
            flat = esc.reshape(-1)
            best = jnp.argmax(flat)
            val = flat[best]
            by = ycc.reshape(-1)[best]
            bx = xcc.reshape(-1)[best]
            ok = val > 0.0
            dscore = cand.reshape(-1)[best]
            return jnp.stack([by, bx]), dscore, ok

        cells, dscores, oks = jax.vmap(extend)(
            kp_cell[:, s_cls], kp_valid[:, s_cls])
        kp_cell = kp_cell.at[:, d_cls].set(
            jnp.where(oks[:, None], cells, kp_cell[:, d_cls]))
        kp_score = kp_score.at[:, d_cls].set(jnp.where(oks, dscores, 0.0))
        kp_valid = kp_valid.at[:, d_cls].set(oks)

    # ---- gather boxes at assigned cells ------------------------------------
    cls_idx = jnp.arange(K1)[None, :]
    kp_box = boxes[kp_cell[..., 0], kp_cell[..., 1], cls_idx]  # (P, K1, 4)
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

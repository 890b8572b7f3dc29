"""GT → target-grid encoding (the data contract of SURVEY.md §2.2).

The reference does this per-sample in CPU Python inside
``Dataset.__getitem__`` (ref:dataset.py† ``encode()``, SURVEY.md §3.5). Here it
is a fully vectorized, jit-able jnp function with static shapes, so it can run

* on host (inside the grain pipeline, over numpy via jax cpu), or
* fused on device right after augmentation — the BASELINE requirement that
  preprocessing runs on-TPU end-to-end.

Conventions
-----------
* ``keypoints``: (P, K, 2) float — (x, y) pixel coordinates in the *network
  input* frame (after augmentation/resize). K excludes the instance class.
* ``visible``:  (P, K) bool — joint annotated & visible.
* ``bboxes``:   (P, 4) float — person instance boxes (cx, cy, w, h) pixels.
* ``valid``:    (P,) bool — person slot is a real annotation (P is a static
  max-persons pad, DataConfig.max_persons).

Output grids (single image; batch via ``jax.vmap``):
* delta (H', W', K+1)   responsibility, 1 at the cell holding each GT center.
* tx, ty (H', W', K+1)  center offset within the cell, in [0, 1).
* tw, th (H', W', K+1)  box size normalized by the input image size.
* te (H', W', L, H_l, W_l)  limb connectivity indicator; te[y, x, l, dy, dx]=1
  iff some person has limb l's source part in cell (y, x) and its destination
  part in cell (y + dy - ⌊H_l/2⌋, x + dx - ⌊W_l/2⌋).

Collisions (two persons' parts in the same cell/class) resolve by scatter
order — same behavior as the reference's sequential Python loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ppn_tpu.configs.base import PPNConfig


class TargetGrids(NamedTuple):
    """Pytree of encoded training targets (SURVEY.md §2.2)."""

    delta: jnp.ndarray  # (..., H', W', K+1)
    tx: jnp.ndarray     # (..., H', W', K+1)
    ty: jnp.ndarray     # (..., H', W', K+1)
    tw: jnp.ndarray     # (..., H', W', K+1)
    th: jnp.ndarray     # (..., H', W', K+1)
    te: jnp.ndarray     # (..., H', W', L, H_l, W_l)


def encode_single(
    cfg: PPNConfig,
    keypoints: jnp.ndarray,
    visible: jnp.ndarray,
    bboxes: jnp.ndarray,
    valid: jnp.ndarray,
) -> TargetGrids:
    """Encode one image's GT into target grids. See module docstring."""
    P = keypoints.shape[0]
    K = cfg.num_keypoints
    K1 = cfg.num_classes
    H, W = cfg.outsize
    Hl, Wl = cfg.local_grid_size
    L = cfg.num_limbs
    sy, sx = cfg.stride
    img_h, img_w = cfg.insize

    keypoints = keypoints.astype(jnp.float32)
    bboxes = bboxes.astype(jnp.float32)
    valid = valid.astype(bool)
    visible = visible.astype(bool)

    # ---- per-(person, class) centers and box sizes -------------------------
    # class 0 = instance (person box center), classes 1..K = joints.
    centers = jnp.concatenate([bboxes[:, None, :2], keypoints], axis=1)  # (P,K1,2)
    inst_wh = bboxes[:, 2:4] * cfg.instance_scale                        # (P,2)
    # Keypoint boxes: squares of side parts_scale·√(w_inst²+h_inst²)
    # (PPN paper §3.1; SURVEY.md §2.2).
    part_side = cfg.parts_scale * jnp.sqrt(
        jnp.sum(jnp.square(inst_wh), axis=-1))                           # (P,)
    part_wh = jnp.broadcast_to(part_side[:, None, None], (P, K, 2))
    sizes = jnp.concatenate([inst_wh[:, None, :], part_wh], axis=1)      # (P,K1,2)

    ok = jnp.concatenate([valid[:, None], visible & valid[:, None]], axis=1)

    # ---- grid cell + in-cell offset ---------------------------------------
    gx = centers[..., 0] / sx
    gy = centers[..., 1] / sy
    ix = jnp.floor(gx).astype(jnp.int32)
    iy = jnp.floor(gy).astype(jnp.int32)
    in_bounds = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    ok = ok & in_bounds

    # Route invalid scatters to a trash row/col (grids padded by one), the
    # standard static-shape trick (SURVEY.md §7.3 fixed-shape parsing).
    iy_s = jnp.where(ok, iy, H)
    ix_s = jnp.where(ok, ix, W)
    cls = jax.lax.broadcasted_iota(jnp.int32, (P, K1), 1)

    delta = jnp.zeros((H + 1, W + 1, K1), jnp.float32)
    delta = delta.at[iy_s, ix_s, cls].max(ok.astype(jnp.float32))[:H, :W, :]

    # One combined scatter for the box fields: with duplicate indices the
    # winner is unspecified but CONSISTENT across tx/ty/tw/th, so a cell
    # never mixes fields from two different persons.
    box_vals = jnp.stack(
        [gx - ix, gy - iy, sizes[..., 0] / img_w, sizes[..., 1] / img_h],
        axis=-1)                                                 # (P, K1, 4)
    boxes_grid = jnp.zeros((H + 1, W + 1, K1, 4), jnp.float32)
    boxes_grid = boxes_grid.at[iy_s, ix_s, cls].set(box_vals)[:H, :W]
    tx, ty, tw, th = (boxes_grid[..., i] for i in range(4))

    # ---- limb connectivity te ---------------------------------------------
    src = jnp.asarray([e[0] for e in cfg.edges], jnp.int32)   # (L,)
    dst = jnp.asarray([e[1] for e in cfg.edges], jnp.int32)
    iy_src = iy[:, src]   # (P, L)
    ix_src = ix[:, src]
    dy = iy[:, dst] - iy_src + Hl // 2
    dx = ix[:, dst] - ix_src + Wl // 2
    pair_ok = (
        ok[:, src] & ok[:, dst]
        & (dy >= 0) & (dy < Hl) & (dx >= 0) & (dx < Wl)
    )
    iy_e = jnp.where(pair_ok, iy_src, H)
    ix_e = jnp.where(pair_ok, ix_src, W)
    dy_c = jnp.clip(dy, 0, Hl - 1)
    dx_c = jnp.clip(dx, 0, Wl - 1)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1)

    te = jnp.zeros((H + 1, W + 1, L, Hl, Wl), jnp.float32)
    te = te.at[iy_e, ix_e, lidx, dy_c, dx_c].max(
        pair_ok.astype(jnp.float32))[:H, :W]

    return TargetGrids(delta=delta, tx=tx, ty=ty, tw=tw, th=th, te=te)


def targets_to_feature_map(cfg: PPNConfig, t: TargetGrids) -> jnp.ndarray:
    """Formal inverse of the encode/decode contract: build a pre-activation
    feature map that decodes exactly back to the targets.

    Used by the round-trip contract tests (SURVEY.md §4 implications) and as
    a debugging oracle: ``decode(cfg, targets_to_feature_map(cfg, t))`` must
    reproduce every GT box at its responsible cell with score ≈ 1.
    """
    BIG = 12.0  # σ(±12) ≈ 1/0 to ~6e-6

    def logit(p):
        p = jnp.clip(p, 1e-5, 1.0 - 1e-5)
        return jnp.log(p) - jnp.log1p(-p)

    resp = jnp.where(t.delta > 0.5, BIG, -BIG)
    conf = resp  # perfect boxes ⇒ IoU target 1 at responsible cells
    x = logit(t.tx)
    y = logit(t.ty)
    if cfg.size_activation == "sigmoid":
        w = logit(t.tw)
        h = logit(t.th)
    else:
        w = jnp.log(jnp.maximum(t.tw, 1e-5))
        h = jnp.log(jnp.maximum(t.th, 1e-5))
    e = jnp.where(t.te > 0.5, BIG, -BIG)
    e_flat = e.reshape(*e.shape[:-3], cfg.num_limb_channels)
    return jnp.concatenate([resp, conf, x, y, w, h, e_flat], axis=-1)


def encode_batch(
    cfg: PPNConfig,
    keypoints: jnp.ndarray,  # (B, P, K, 2)
    visible: jnp.ndarray,    # (B, P, K)
    bboxes: jnp.ndarray,     # (B, P, 4)
    valid: jnp.ndarray,      # (B, P)
) -> TargetGrids:
    """Batched encoding via vmap (the DataLoader-batch analog of §3.1)."""
    return jax.vmap(lambda k, v, b, m: encode_single(cfg, k, v, b, m))(
        keypoints, visible, bboxes, valid)

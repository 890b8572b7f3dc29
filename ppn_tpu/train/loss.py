"""Multi-term PPN loss (SURVEY.md §2.3; ref:model.py†/ref:train.py† loss).

Five weighted masked-MSE terms:

    L =  λ_resp · Σ (δ − resp̂)²                      all cells/classes
       + λ_iou  · Σ δ · (IoU(box̂, gt) − conf̂)²       YOLOv1-style conf target
       + λ_coor · Σ δ · ((tx−x̂)² + (ty−ŷ)²)
       + λ_size · Σ δ · ((√tw−√ŵ)² + (√th−√ĥ)²)
       + λ_limb · Σ (te − ê)²                         all limb logits

Notes (SURVEY.md §7.3 hard parts):
* The IoU confidence target depends on the *current* predictions — computed
  inside the jitted step with `stop_gradient` so it acts as a label.
* √-space size regression is clamped before sqrt for numerics near zero.
* Terms are summed over cells/classes and averaged over the batch; per-term
  scalars are returned under stable names for parity debugging
  (SURVEY.md §5 metrics row).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ppn_tpu.configs.base import PPNConfig
from ppn_tpu.ops import boxes as boxops
from ppn_tpu.ops import decode as dec
from ppn_tpu.ops.encode import TargetGrids


def limb_mask(cfg: PPNConfig, delta: jnp.ndarray) -> jnp.ndarray:
    """(…, H', W', K+1) responsibility → (…, H', W', L, H_l, W_l) limb-loss
    weights: 1 where the source part sits in the cell OR the destination
    part sits in the window-offset cell (max(δ_src, δ_dst), the lineage
    max_delta_ij mask)."""
    H, W = cfg.outsize
    Hl, Wl = cfg.local_grid_size
    ch, cw = Hl // 2, Wl // 2
    src = jnp.asarray([s for s, _ in cfg.edges])
    dst = jnp.asarray([d for _, d in cfg.edges])

    d_src = delta[..., src]                                  # (..., H, W, L)
    d_dst = delta[..., dst]
    pad = [(0, 0)] * (d_dst.ndim - 3) + [(ch, ch), (cw, cw), (0, 0)]
    padded = jnp.pad(d_dst, pad)
    windows = jnp.stack(
        [padded[..., dy:dy + H, dx:dx + W, :] for dy in range(Hl)
         for dx in range(Wl)], axis=-1)            # (..., H, W, L, Hl·Wl)
    windows = windows.reshape(*windows.shape[:-1], Hl, Wl)
    return jnp.maximum(d_src[..., None, None], windows)


def ppn_loss(
    cfg: PPNConfig,
    feature_map: jnp.ndarray,   # (B, H', W', C) pre-activation head output
    targets: TargetGrids,       # batched (B, ...)
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total weighted loss + per-term logs. All math in float32."""
    fm = feature_map.astype(jnp.float32)
    act, props = dec.decode(cfg, fm)
    B = fm.shape[0]
    sy, sx = cfg.stride
    img_h, img_w = cfg.insize

    delta = targets.delta.astype(jnp.float32)

    # --- responsibility ----------------------------------------------------
    loss_resp = jnp.sum(jnp.square(delta - act.resp))

    # --- IoU confidence target (stop-gradient, YOLOv1-style) ---------------
    H, W = cfg.outsize
    iy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)[..., None]
    ix = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)[..., None]
    gt_boxes = jnp.stack([
        (ix + targets.tx) * sx,
        (iy + targets.ty) * sy,
        targets.tw * img_w,
        targets.th * img_h,
    ], axis=-1)
    iou_t = jax.lax.stop_gradient(boxops.iou_cxcywh(props.boxes, gt_boxes))
    loss_iou = jnp.sum(delta * jnp.square(iou_t - act.conf))

    # --- coordinate offsets ------------------------------------------------
    loss_coor = jnp.sum(delta * (jnp.square(targets.tx - act.x) +
                                 jnp.square(targets.ty - act.y)))

    # --- box size in sqrt space --------------------------------------------
    eps = 1e-6
    loss_size = jnp.sum(delta * (
        jnp.square(jnp.sqrt(jnp.maximum(targets.tw, eps)) -
                   jnp.sqrt(jnp.maximum(act.w, eps))) +
        jnp.square(jnp.sqrt(jnp.maximum(targets.th, eps)) -
                   jnp.sqrt(jnp.maximum(act.h, eps)))))

    # --- limbs -------------------------------------------------------------
    limb_sq = jnp.square(targets.te.astype(jnp.float32) - act.e)
    if cfg.limb_loss_mode == "paired":
        # mask to entries where either endpoint part exists (the lineage
        # max_delta_ij weighting): without it the dense zero targets crush
        # the sparse positives into sigmoid-MSE saturation
        loss_limb = jnp.sum(limb_mask(cfg, delta) * limb_sq)
    elif cfg.limb_loss_mode == "all":
        loss_limb = jnp.sum(limb_sq)
    else:
        raise ValueError(f"unknown limb_loss_mode {cfg.limb_loss_mode!r}")

    inv_b = 1.0 / B
    terms = {
        "loss_resp": loss_resp * inv_b,
        "loss_iou": loss_iou * inv_b,
        "loss_coor": loss_coor * inv_b,
        "loss_size": loss_size * inv_b,
        "loss_limb": loss_limb * inv_b,
    }
    total = (cfg.lambda_resp * terms["loss_resp"]
             + cfg.lambda_iou * terms["loss_iou"]
             + cfg.lambda_coor * terms["loss_coor"]
             + cfg.lambda_size * terms["loss_size"]
             + cfg.lambda_limb * terms["loss_limb"])
    terms["loss_total"] = total
    return total, terms

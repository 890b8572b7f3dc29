"""Fused Pallas postprocess kernel: feature map → parsed people, one kernel.

The XLA postprocess (ops/postprocess.py) lowers to ~100 small HLO ops whose
fixed per-op overheads dominate at the 12×12 grid scale. This kernel runs
the whole stage — sigmoid decode, per-class exact greedy NMS (parallel-wave
fixpoint), dense limb-window argmax maps, and the greedy tree walk — in one
Pallas program per image with every intermediate resident in VMEM.

Design notes (see /opt/skills/guides/pallas_guide.md):
* All arrays are kept 2D with the lane (last) dim ≥ the natural vector dim;
  gathers are expressed as one-hot matmuls (MXU) — Mosaic has no general
  gather.
* The limb-window maps use the (81, N) orientation so window shifts become
  static sublane row writes and the argmax is a sublane reduction.
* NMS waves run as ONE `lax.while_loop` whose body updates all K+1 classes
  (a static python loop of (N,N)@(N,1) matmuls) — same fixpoint as the
  reference's sequential greedy loop, bit-for-bit (tested against the XLA
  wave/scan versions and the CPU oracle).

Semantics match ops/postprocess.py exactly; tests compare elementwise.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ppn_tpu.configs.base import PPNConfig
from ppn_tpu.ops.parse import People


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def _make_kernel(cfg: PPNConfig):
    H, W = cfg.outsize
    Hl, Wl = cfg.local_grid_size
    K1 = cfg.num_classes
    L = cfg.num_limbs
    P = cfg.max_instances
    N = H * W
    ch, cw = Hl // 2, Wl // 2
    NW = Hl * Wl
    sy, sx = cfg.stride
    img_h, img_w = cfg.insize
    det_t = cfg.detection_thresh
    nms_t = cfg.nms_thresh
    dst_of = [d for _, d in cfg.edges]

    # Static neighbor table: nbr[j, n] = flat index of the j-th window
    # neighbor of cell n (or -1 out of bounds).
    nbr = np.full((NW, N), -1, np.int32)
    for j in range(NW):
        dy, dx = j // Wl - ch, j % Wl - cw
        for n in range(N):
            y, x = divmod(n, W)
            yy, xx = y + dy, x + dx
            if 0 <= yy < H and 0 <= xx < W:
                nbr[j, n] = yy * W + xx
    nbr_valid_np = (nbr >= 0)
    nbr_clip_np = np.maximum(nbr, 0)

    # flat-index shift of the j-th window offset (wrap errors masked later)
    shifts = [(j // Wl - ch) * W + (j % Wl - cw) for j in range(NW)]

    def _pad128(x):
        return -(-x // 128) * 128

    C6p = _pad128(6 * K1)
    Npad = _pad128(N)
    Lp = -(-L // 8) * 8  # sublane-align the limb dim of the e block
    OUTW = 128  # all (P, ·) outputs padded to one lane tile

    def kernel(fm_ref, e_ref, nbrv_ref, nbrc_ref,
               box_out, score_out, valid_out, cell_out):
        """Refs (lane dims padded to 128 multiples for Mosaic memrefs):
        fm_ref:     (N, C6p) f32 — box-channel groups [0:6·K1], flat cells
        e_ref:      (NW, Lp, Npad) f32 — raw limb logits, window-major
                    (window offset on the untiled leading dim, limbs
                    sublane-padded to Lp)
        nbrv_ref:   (NW, Npad) f32 — 1.0 where window offset stays in bounds
        nbrc_ref:   (NW, Npad) f32 — clipped flat neighbor index table
        box_out:    (P, OUTW) f32 [K1·4 used]
        score_out:  (P, OUTW) f32 [score(K1) | kp_valid(K1)]
        valid_out:  (P, OUTW) f32 [person_valid | num_kp]
        cell_out:   (P, OUTW) f32 [K1 used]
        """
        fm = fm_ref[:][:, :6 * K1]                      # (N, 6K1)
        resp = _sigmoid(fm[:, 0:K1])
        conf = _sigmoid(fm[:, K1:2 * K1])
        xo = _sigmoid(fm[:, 2 * K1:3 * K1])
        yo = _sigmoid(fm[:, 3 * K1:4 * K1])
        if cfg.size_activation == "sigmoid":
            wo = _sigmoid(fm[:, 4 * K1:5 * K1])
            ho = _sigmoid(fm[:, 5 * K1:6 * K1])
        else:
            wo = jnp.exp(jnp.clip(fm[:, 4 * K1:5 * K1], -10.0, 4.0))
            ho = jnp.exp(jnp.clip(fm[:, 5 * K1:6 * K1], -10.0, 4.0))
        score = resp * conf                             # (N, K1)

        n_iota = jax.lax.broadcasted_iota(jnp.int32, (N, K1), 0)
        iy = (n_iota // W).astype(jnp.float32)
        ix = (n_iota % W).astype(jnp.float32)
        cxp = (ix + xo) * sx
        cyp = (iy + yo) * sy
        bwp = wo * img_w
        bhp = ho * img_h
        x0 = cxp - bwp * 0.5
        y0 = cyp - bhp * 0.5
        x1 = cxp + bwp * 0.5
        y1 = cyp + bhp * 0.5
        area = bwp * bhp                                # (N, K1)

        # ---------------- NMS: parallel waves, all classes in one loop -----
        idx_i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        idx_j = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        eye = jnp.where(idx_i == idx_j, 1.0, 0.0)       # (N, N)

        def to_row(col):
            """(N, 1) → (1, N) without tpu.transpose (relayout-free)."""
            return jnp.sum(eye * col, axis=0, keepdims=True)

        Ms = []
        for c in range(K1):
            xc0 = x0[:, c:c + 1]
            yc0 = y0[:, c:c + 1]
            xc1 = x1[:, c:c + 1]
            yc1 = y1[:, c:c + 1]
            ac = area[:, c:c + 1]
            sc = score[:, c:c + 1]
            scT = to_row(sc)
            iw = jnp.maximum(
                jnp.minimum(xc1, to_row(xc1)) - jnp.maximum(xc0, to_row(xc0)),
                0.0)
            ih = jnp.maximum(
                jnp.minimum(yc1, to_row(yc1)) - jnp.maximum(yc0, to_row(yc0)),
                0.0)
            inter = iw * ih
            # divide-free IoU>t decision (matches ops/boxes.py
            # pairwise_overlap_above_cxcywh — VPU divides are multi-pass)
            union = jnp.maximum(ac + to_row(ac) - inter, 1e-9)
            overlap = inter > nms_t * union
            earlier = (scT > sc) | ((scT == sc) & (idx_j < idx_i))
            above_j = (scT > det_t)
            Ms.append(
                jnp.where(overlap & earlier & above_j, 1.0, 0.0
                          ).astype(jnp.bfloat16))      # (N, N)

        above = score > det_t                           # (N, K1)

        def cond(state):
            kept, undecided = state
            return jnp.any(undecided > 0.5)

        def body(state):
            kept, undecided = state                     # (N, K1) f32
            new_kept = []
            new_und = []
            for c in range(K1):
                k_c = kept[:, c:c + 1]
                u_c = undecided[:, c:c + 1]
                blocked = jnp.dot(Ms[c], k_c.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32) > 0.5
                u_c = jnp.where(blocked, 0.0, u_c)
                open_h = jnp.dot(Ms[c], u_c.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32) > 0.5
                keep_new = jnp.where(open_h, 0.0, u_c)
                new_kept.append(k_c + keep_new)
                new_und.append(u_c - keep_new)
            return (jnp.concatenate(new_kept, axis=1),
                    jnp.concatenate(new_und, axis=1))

        kept0 = jnp.zeros((N, K1), jnp.float32)
        und0 = jnp.where(above, 1.0, 0.0)
        kept, _ = jax.lax.while_loop(cond, body, (kept0, und0))
        skept = score * kept                            # (N, K1) post-NMS

        # ---------------- dense limb-window best-destination maps ----------
        # win_j[l, n] = skept[nbr(j, n), dst_l]: for window offset j, a
        # flat-index roll of the dst score rows (wrap artifacts masked by
        # the static in-bounds table). Incremental strict-> max over j in
        # ascending order = first-max tie-break (row-major window order),
        # matching the XLA/oracle argmax exactly.
        d_all = jnp.concatenate(
            [to_row(skept[:, d:d + 1]) for d in dst_of]
            + [jnp.zeros((1, N), jnp.float32)] * (Lp - L),
            axis=0)                                      # (Lp, N)

        bv_all = jnp.zeros((Lp, N), jnp.float32)
        bdst_all = jnp.zeros((Lp, N), jnp.float32)
        bdsc_all = jnp.zeros((Lp, N), jnp.float32)
        for j in range(NW):
            s = shifts[j]
            nv = nbrv_ref[j:j + 1, :][:, :N]             # (1, N)
            nc = nbrc_ref[j:j + 1, :][:, :N]
            wj = pltpu.roll(d_all, (-s) % N, axis=1) * nv
            ej = _sigmoid(e_ref[j][:, :N])               # (Lp, N)
            escj = ej * wj
            better = escj > bv_all
            bv_all = jnp.where(better, escj, bv_all)
            bdst_all = jnp.where(better, nc, bdst_all)
            bdsc_all = jnp.where(better, wj, bdsc_all)

        best_val = [bv_all[l:l + 1, :] for l in range(L)]    # (1, N) rows
        best_dst = [bdst_all[l:l + 1, :] for l in range(L)]
        best_dsc = [bdsc_all[l:l + 1, :] for l in range(L)]

        # ---------------- seeds: top-P instances (iterative argmax) --------
        inst = to_row(skept[:, 0:1])                    # (1, N)
        col_n = jax.lax.broadcasted_iota(
            jnp.int32, (1, N), 1).astype(jnp.float32)
        # iterative masked argmax — reproduces lax.top_k's ascending-index
        # tie order exactly, including the all-zero (no-seed) case
        seeds_cell = []
        seeds_score = []
        masked = inst
        for _ in range(P):
            v = jnp.max(masked, axis=1, keepdims=True)          # (1,1)
            first = jnp.min(jnp.where(masked == v, col_n, float(N)),
                            axis=1, keepdims=True)              # (1,1)
            seeds_cell.append(first)
            seeds_score.append(v)
            masked = jnp.where(col_n == first, -1.0, masked)
        seed_cell = jnp.concatenate(seeds_cell, axis=0)         # (P, 1)
        seed_score = jnp.maximum(
            jnp.concatenate(seeds_score, axis=0), 0.0)          # (P, 1)
        seed_ok = jnp.where(seed_score > 0.0, 1.0, 0.0)

        # ---------------- tree walk (one-hot matmul gathers) ---------------
        row_n = jax.lax.broadcasted_iota(
            jnp.int32, (P, N), 1).astype(jnp.float32)
        cells = [jnp.zeros((P, 1), jnp.float32) for _ in range(K1)]
        scs = [jnp.zeros((P, 1), jnp.float32) for _ in range(K1)]
        oks = [jnp.zeros((P, 1), jnp.float32) for _ in range(K1)]
        cells[0] = seed_cell
        scs[0] = seed_score
        oks[0] = seed_ok

        for l, (s_c, d_c) in enumerate(cfg.edges):
            sel = jnp.where(row_n == cells[s_c], 1.0, 0.0)      # (P, N)
            # exact one-hot gathers as masked lane reductions (MXU f32
            # matmuls would round the gathered values by ~1e-3 relative)
            ev = jnp.sum(sel * best_val[l], axis=1, keepdims=True)  # (P, 1)
            ed = jnp.sum(sel * best_dst[l], axis=1, keepdims=True)
            es = jnp.sum(sel * best_dsc[l], axis=1, keepdims=True)
            ok = oks[s_c] * jnp.where(ev > 0.0, 1.0, 0.0)
            cells[d_c] = jnp.where(ok > 0.5, ed, 0.0)
            scs[d_c] = jnp.where(ok > 0.5, es, 0.0)
            oks[d_c] = ok

        kp_cell = jnp.concatenate(cells, axis=1)                # (P, K1)
        kp_sc = jnp.concatenate(scs, axis=1)
        kp_ok = jnp.concatenate(oks, axis=1)

        num_kp = jnp.sum(kp_ok[:, 1:], axis=1, keepdims=True)
        pvalid = kp_ok[:, 0:1] * jnp.where(
            num_kp >= cfg.min_num_keypoints, 1.0, 0.0)
        # boxes/scores are masked by per-keypoint validity only; the
        # person-level mask applies to kp_valid (XLA parse semantics)
        kp_ok_post = kp_ok * pvalid

        # ---------------- box gather at assigned cells ---------------------
        outs = []
        for c in range(K1):
            sel = jnp.where(row_n == cells[c], 1.0, 0.0)         # (P, N)
            coord = jnp.concatenate(
                [jnp.sum(sel * to_row(q[:, c:c + 1]), axis=1,
                         keepdims=True)
                 for q in (cxp, cyp, bwp, bhp)], axis=1)         # (P, 4)
            outs.append(oks[c] * coord)
        kp_box = jnp.concatenate(outs, axis=1)                   # (P, K1·4)

        def padw(x):
            pad = OUTW - x.shape[1]
            return jnp.concatenate(
                [x, jnp.zeros((x.shape[0], pad), jnp.float32)], axis=1)

        box_out[:] = padw(kp_box)
        score_out[:] = padw(jnp.concatenate([kp_sc, kp_ok_post], axis=1))
        valid_out[:] = padw(jnp.concatenate([pvalid, num_kp], axis=1))
        cell_out[:] = padw(kp_cell)

    return kernel, nbr_valid_np, nbr_clip_np


@partial(jax.jit, static_argnums=(0, 2))
def postprocess_batch_pallas(cfg: PPNConfig, feature_map,
                             interpret: bool = False) -> People:
    """(B, H', W', C) feature map → batched People via the fused kernel."""
    H, W = cfg.outsize
    Hl, Wl = cfg.local_grid_size
    K1 = cfg.num_classes
    L = cfg.num_limbs
    P = cfg.max_instances
    N = H * W
    NW = Hl * Wl
    B = feature_map.shape[0]

    def _pad128(x):
        return -(-x // 128) * 128

    C6p = _pad128(6 * K1)
    Npad = _pad128(N)
    Lp = -(-L // 8) * 8
    OUTW = 128

    fm = feature_map.astype(jnp.float32)
    fm2d = fm[..., :6 * K1].reshape(B, N, 6 * K1)
    fm2d = jnp.pad(fm2d, ((0, 0), (0, 0), (0, C6p - 6 * K1)))
    # limb logits → (B, NW, Lp, N): window offset leads (untiled dim),
    # limb rows on sublanes (8-aligned), flat cells on lanes
    e = fm[..., 6 * K1:].reshape(B, N, L, NW)
    e = jnp.transpose(e, (0, 3, 2, 1))                   # (B, NW, L, N)
    e = jnp.pad(e, ((0, 0), (0, 0), (0, Lp - L), (0, Npad - N)))

    kernel, nbrv_np, nbrc_np = _make_kernel(cfg)
    padN = ((0, 0), (0, Npad - N))
    nbrv_in = jnp.asarray(np.pad(nbrv_np.astype(np.float32), padN))
    nbrc_in = jnp.asarray(np.pad(nbrc_np.astype(np.float32), padN))

    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, C6p), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NW, Lp, Npad), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NW, Npad), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NW, Npad), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, P, OUTW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
    )

    def kernel_3d(fm_ref, e_ref, nbrv_ref, nbrc_ref, bo, so, vo, co):
        kernel(fm_ref.at[0], e_ref.at[0], nbrv_ref, nbrc_ref,
               bo.at[0], so.at[0], vo.at[0], co.at[0])

    box, sc, val, cell = pl.pallas_call(
        kernel_3d,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, P, OUTW), jnp.float32)
            for _ in range(4)
        ],
        interpret=interpret,
    )(fm2d, e, nbrv_in, nbrc_in)

    box = box[..., :K1 * 4]
    sc = sc[..., :2 * K1]
    val = val[..., :2]
    cell = cell[..., :K1]

    kp_flat = cell.astype(jnp.int32)                      # (B, P, K1)
    kp_cell = jnp.stack([kp_flat // W, kp_flat % W], axis=-1)
    kp_box = box.reshape(B, P, K1, 4)
    kp_score = sc[..., :K1]
    kp_valid = sc[..., K1:] > 0.5
    valid = val[..., 0] > 0.5
    num_kp = val[..., 1].astype(jnp.int32)
    return People(kp_cell=kp_cell, kp_box=kp_box, kp_score=kp_score,
                  kp_valid=kp_valid, valid=valid, num_kp=num_kp)

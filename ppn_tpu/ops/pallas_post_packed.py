"""Batch-packed fused Pallas postprocess: G images per grid step.

The per-image kernel (ops/pallas_post.py) is serial-chain-bound: at the
12×12 grid its NMS waves, window maps, seed argmax and tree walk run on
(≤17, 144)-ish blocks that leave most sublanes empty, so per-op overhead
dominates (~70 µs/image, 43% of serving time at B=128 — VERDICT r2 next #1).
This kernel packs G = ⌊128 / K1⌋ images into every grid step so each of
those serial stages processes G images per instruction:

* **Dual layouts, zero in-kernel relayouts.** Quantities live either
  column-major (cells n on sublanes, (class, image) on lanes — used by the
  NMS pair build, whose j-reduction then lands back in the same layout) or
  row-major ((class, image) on sublanes, cells on lanes — used by the
  window maps, seeds, walk and box gather). Both are decoded independently
  from two XLA-prearranged views of the feature map; the only bridge is the
  post-NMS keep mask, transposed exactly on the MXU (0/1 values are exact
  in bf16, each output sums a single nonzero product).
* **NMS for all classes AND images in one fixpoint.** The suppression
  masks form one (N, N, G·K1) bf16 block; a wave is an elementwise
  multiply with the broadcast keep column plus a sublane-segment sum —
  no per-(image, class) matvecs, and the wave count is the max over the
  packed images instead of per-image.
* **Limb maps stream from HBM.** The limb window tensor is ~10 MB per
  packed block, too big for VMEM next to the NMS masks; it stays in HBM
  (memory_space=ANY) as RAW logits (σ is computed in-kernel after each
  DMA — VPU work hidden under the next offset's copy) and the window
  loop double-buffers one (L, G, Npad) slice per offset via async DMA.
  Its HBM layout is (L, NW, nb, G, Npad) — channels-major, exactly one
  flat 2D transpose away from the feature map (and ZERO ops away from
  a transposed head GEMM, see nn/model.py ``packed_feature``): the old
  (nb, NW, L·G, Npad) layout forced XLA into a worst-case (j, l, b)
  relayout that cost ~1.05 ms of the ~3.4 ms fused postprocess @B=128
  (r4 attribution, tools/view_probe.py).
* **bf16 prep views.** The head computes in bfloat16 and upcasts to
  float32 (nn/model.py), so model-produced feature maps are bf16-exact:
  with ``exact_bf16=True`` all three XLA-prearranged views are built in
  bf16 — the big e-view transpose (the dominant prep cost at B=128)
  moves half the HBM bytes, losslessly. The in-kernel f32 upcast then
  reproduces σ(f32(x)) bitwise vs the XLA oracle (decode._sigmoid also
  upcasts before σ). Callers must only set the flag for feature maps
  whose values are bf16-representable (model outputs — NOT TTA-averaged
  maps).

Semantics are bit-compatible with ops/postprocess.py (same decisions: NMS
keeps, window-argmax winners, seed order, walk, min-keypoint filter);
tests/test_pallas_post.py compares every People field elementwise.
Reference lineage: ref:predict.py† ``get_humans_by_feature`` (SURVEY.md
§3.2) — decode → per-class NMS → greedy limb assembly.
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


def _neighbor_tables(cfg: PPNConfig):
    """Static window-neighbor tables: validity + clipped flat index."""
    H, W = cfg.outsize
    Hl, Wl = cfg.local_grid_size
    N = H * W
    NW = Hl * Wl
    ch, cw = Hl // 2, Wl // 2
    nbr = np.full((NW, N), -1, np.int32)
    for j in range(NW):
        dy, dx = j // Wl - ch, j % Wl - cw
        for n in range(N):
            y, x = divmod(n, W)
            yy, xx = y + dy, x + dx
            if 0 <= yy < H and 0 <= xx < W:
                nbr[j, n] = yy * W + xx
    shifts = [(j // Wl - ch) * W + (j % Wl - cw) for j in range(NW)]
    return (nbr >= 0).astype(np.float32), np.maximum(nbr, 0).astype(
        np.float32), shifts


def group_size(cfg: PPNConfig, q: int = 128) -> int:
    """Images packed per grid step: fill the q-lane quantity block with
    (class, image) pairs. q must be a multiple of 128 (the lane tile);
    wider blocks halve the serial grid-step count at the cost of VMEM."""
    return max(1, q // max(cfg.num_classes, cfg.num_limbs))


def group_stride(cfg: PPNConfig, q: int = 128) -> int:
    """Per-group image stride of the e view: G rounded up to the sublane
    tile (8) — Mosaic requires DMA copy shapes 8-aligned on the
    second-minor axis, and the kernel's per-offset e slice is
    (L, Gp, Npad)."""
    return -(-group_size(cfg, q) // 8) * 8


def _make_packed_kernel(cfg: PPNConfig, G: int,
                        skip: frozenset = frozenset(), q: int = 128,
                        derive_colq: bool = False):
    # `skip` disables stages for performance attribution
    # (tools/packed_split.py): 'nms', 'window', 'walk'.
    # `derive_colq`: build the column view in-kernel as an MXU identity
    # transpose of the row view instead of taking it as an input — exact
    # for bf16 logits (each output sums a single 1.0·x product in f32),
    # NOT for f32 (MXU f32 matmuls round ~1e-3), so only used under
    # exact_bf16. Kills the XLA colq prep (+its per-block DMA).
    H, W = cfg.outsize
    K1 = cfg.num_classes
    L = cfg.num_limbs
    P = cfg.max_instances
    N = H * W
    NW = Hl_Wl = cfg.local_grid_size[0] * cfg.local_grid_size[1]
    sy, sx = cfg.stride
    img_h, img_w = cfg.insize
    det_t = cfg.detection_thresh
    nms_t = cfg.nms_thresh
    dst_of = [d for _, d in cfg.edges]
    Q = q                           # quantity-block width (lanes/rows)
    R = G * K1                      # real lanes/rows; padded to Q
    Gp = -(-G // 8) * 8             # e-view group stride (8-aligned DMA)
    Npad = -(-N // 128) * 128
    CH = 48 if N % 48 == 0 else (8 if N % 8 == 0 else N)  # pair-build chunk
    Hl, Wl = cfg.local_grid_size
    chw, cww = Hl // 2, Wl // 2
    _, _, shifts = _neighbor_tables(cfg)

    def kernel(colq_hbm, rowq_hbm, e_hbm,
               box_out, score_out, valid_out, cell_out,
               m_scr, blk_scr, colq_s, rowq_s, e_buf, sem):
        """Per grid step (G images):
        colq_hbm: (nb, N, 6·128) f32 HBM — box logits, cells on sublanes,
                  lanes c·G+g per 128-lane quantity block [resp|conf|x|y|w|h]
                  (absent under derive_colq: transposed from rowq in-kernel)
        rowq_hbm: (nb, 6·128, Npad) HBM — same logits transposed: rows
                  c·G+g per 128-row quantity block, cells on lanes
        e_hbm:    (L, NW, nb, Gp, Npad) HBM — RAW limb logits in
                  channels-major order (group stride Gp = G rounded to the
                  sublane tile); a (L, Gp, Npad) slice is DMA'd per window
                  offset and σ applied in-kernel
                  (dtypes f32, or bf16 under exact_bf16)
        outputs:  (G, P, 128) f32 each
        scratch:  m_scr (N, N, 128) bf16 suppression masks; colq_s/rowq_s
                  (2, …) cross-block double-buffered input stages (manual
                  DMA — block b+1's copies start as soon as block b's
                  arrive, hiding the per-group input latency; the automatic
                  pipeline's double buffers alone overflow 16 MB VMEM);
                  e_buf (2, L, G, Npad) + sem: window double buffer
                  (the window-neighbor validity/index rows are computed
                  from iota per offset for the same VMEM reason)
        """
        b = pl.program_id(0)
        nb_g = pl.num_programs(0)
        slot = jax.lax.rem(b, 2)
        nxt = 1 - slot

        def cp_row(i, s):
            return pltpu.make_async_copy(rowq_hbm.at[i], rowq_s.at[s],
                                         sem.at[4 + s])

        if not derive_colq:
            def cp_col(i, s):
                return pltpu.make_async_copy(colq_hbm.at[i], colq_s.at[s],
                                             sem.at[2 + s])

        @pl.when(b == 0)
        def _():
            cp_row(0, 0).start()
            if not derive_colq:
                cp_col(0, 0).start()

        lane_r = jax.lax.broadcasted_iota(jnp.int32, (N, Q), 1)
        real_lane = lane_r < R

        # ---------------- column decode (cells on sublanes) ----------------
        if derive_colq:
            # rowq is needed up front: the column view is its MXU identity
            # transpose (exact: bf16 values, each output one 1.0·x product
            # accumulated in f32 — same trick as keptT below).
            cp_row(b, slot).wait()

            @pl.when(b + 1 < nb_g)
            def _():
                cp_row(b + 1, nxt).start()

            iq = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
            jq = jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)
            eyeq = jnp.where(iq == jq, 1.0, 0.0).astype(jnp.bfloat16)

            def colq(i):
                blk = rowq_s[slot, i * Q:(i + 1) * Q, :]     # (Q, Npad) bf16
                t = jax.lax.dot_general(
                    blk, eyeq, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (Npad, Q)
                return t[:N]
        else:
            cp_col(b, slot).wait()

            @pl.when(b + 1 < nb_g)
            def _():
                cp_col(b + 1, nxt).start()

            def colq(i):
                return colq_s[slot, :, i * Q:(i + 1) * Q].astype(jnp.float32)

        resp = _sigmoid(colq(0))
        conf = _sigmoid(colq(1))
        xo = _sigmoid(colq(2))
        yo = _sigmoid(colq(3))
        if cfg.size_activation == "sigmoid":
            wo = _sigmoid(colq(4))
            ho = _sigmoid(colq(5))
        else:
            wo = jnp.exp(jnp.clip(colq(4), -10.0, 4.0))
            ho = jnp.exp(jnp.clip(colq(5), -10.0, 4.0))
        # zero the padding lanes so they never clear detection_thresh
        score = jnp.where(real_lane, resp * conf, 0.0)        # (N, 128)

        n_iota = jax.lax.broadcasted_iota(jnp.int32, (N, Q), 0)
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
        area = bwp * bhp

        # ---------------- suppression masks: (N_i, N_j, 128) ---------------
        # leading = i (untiled), sublanes = j, lanes = (c, g): the wave
        # reduction over j is then a sublane-segment sum whose result lands
        # back in the (N, 128) state layout — no relayout anywhere.
        # (i-chunk reshapes happen on (CH, 128) slices: a full (N, 1, 128)
        # copy would physically pad every row to an (8, 128) tile — 8× the
        # bytes — which alone overflows the 16 MB VMEM budget.)
        x0j, y0j, x1j, y1j = (x0[None], y0[None], x1[None], y1[None])
        areaj, scj = area[None], score[None]
        above_j = scj > det_t
        jj = jax.lax.broadcasted_iota(jnp.int32, (CH, N, Q), 1)

        def ichunk(v, i0):  # (CH, Q) slice -> (CH, 1, Q) broadcast form
            return v[i0:i0 + CH].reshape(CH, 1, Q)

        for i0 in ([] if "nms" in skip else range(0, N, CH)):
            iw = jnp.maximum(
                jnp.minimum(ichunk(x1, i0), x1j)
                - jnp.maximum(ichunk(x0, i0), x0j), 0.0)
            ih = jnp.maximum(
                jnp.minimum(ichunk(y1, i0), y1j)
                - jnp.maximum(ichunk(y0, i0), y0j), 0.0)
            inter = iw * ih
            # divide-free IoU>t decision (matches ops/boxes.py
            # pairwise_overlap_above_cxcywh — VPU divides are multi-pass)
            union = jnp.maximum(ichunk(area, i0) + areaj - inter, 1e-9)
            overlap = inter > nms_t * union
            scl = ichunk(score, i0)
            ii = jax.lax.broadcasted_iota(jnp.int32, (CH, N, Q), 0) + i0
            earlier = (scj > scl) | ((scj == scl) & (jj < ii))
            m_scr[i0:i0 + CH] = jnp.where(overlap & earlier & above_j,
                                          1.0, 0.0).astype(jnp.bfloat16)

        # ---------------- NMS fixpoint, all classes + images ---------------
        def suppressed_by(mask_vec):
            """(N, 128) 0/1 → per-(i, lane) "any masked j suppresses i":
            one elementwise multiply over the whole mask block + a
            sublane-segment sum (the dominant wave cost; runs with the
            raised vmem limit — see compiler_params below)."""
            mb = mask_vec.astype(jnp.bfloat16)[None]       # (1, N, 128)
            blk_scr[:] = jnp.sum(m_scr[:] * mb, axis=1)    # exact: ≤N ones
            return blk_scr[:].astype(jnp.float32) > 0.5

        def cond(state):
            kept, und = state
            return jnp.any(und > 0.5)

        def body(state):
            kept, und = state                              # (N, 128) f32
            und = jnp.where(suppressed_by(kept), 0.0, und)
            newk = jnp.where(suppressed_by(und), 0.0, und)
            return kept + newk, und - newk

        kept0 = jnp.zeros((N, Q), jnp.float32)
        und0 = jnp.where(score > det_t, 1.0, 0.0)
        if "nms" in skip:
            kept = und0
        elif "nmsfix" in skip:
            # masks built, fixpoint skipped (attribution: build vs waves)
            kept = jnp.where(suppressed_by(und0), und0, und0)
        else:
            kept, _ = jax.lax.while_loop(cond, body, (kept0, und0))

        # ---------------- bridge: exact 0/1 transpose on the MXU -----------
        idx_i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        idx_j = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        eye = jnp.where(idx_i == idx_j, 1.0, 0.0).astype(jnp.bfloat16)
        keptT = jax.lax.dot_general(
            kept.astype(jnp.bfloat16), eye,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (128, N) exact

        # ---------------- row decode ((c, g) on sublanes) ------------------
        if not derive_colq:
            cp_row(b, slot).wait()

            @pl.when(b + 1 < nb_g)
            def _():
                cp_row(b + 1, nxt).start()

        def rowq(i):
            return rowq_s[slot, i * Q:(i + 1) * Q, :].astype(jnp.float32)

        row_i = jax.lax.broadcasted_iota(jnp.int32, (Q, Npad), 0)
        resp_r = _sigmoid(rowq(0))
        conf_r = _sigmoid(rowq(1))
        xo_r = _sigmoid(rowq(2))
        yo_r = _sigmoid(rowq(3))
        if cfg.size_activation == "sigmoid":
            wo_r = _sigmoid(rowq(4))
            ho_r = _sigmoid(rowq(5))
        else:
            wo_r = jnp.exp(jnp.clip(rowq(4), -10.0, 4.0))
            ho_r = jnp.exp(jnp.clip(rowq(5), -10.0, 4.0))
        score_r = jnp.where(row_i < R, resp_r * conf_r, 0.0)  # (128, Npad)
        nl = jax.lax.broadcasted_iota(jnp.int32, (Q, Npad), 1)
        iy_r = (nl // W).astype(jnp.float32)
        ix_r = (nl % W).astype(jnp.float32)
        cxp_r = (ix_r + xo_r) * sx
        cyp_r = (iy_r + yo_r) * sy
        bwp_r = wo_r * img_w
        bhp_r = ho_r * img_h

        skeptT = score_r[:, :N] * keptT                    # (128, N)

        # ---------------- dense limb-window best-destination maps ----------
        # d_all[l, g] = post-NMS score row of edge l's DST class; ascending
        # strict-max over window offsets j = first-max tie-break, matching
        # the XLA argmax exactly (ops/parse.py). 3D (L, G, N) to line up
        # with the channels-major e slices — no q-pad rows to drag along.
        d_all = jnp.concatenate(
            [skeptT[d * G:(d + 1) * G].reshape(1, G, N) for d in dst_of],
            axis=0)                                        # (L, G, N)

        def dma(j):
            return pltpu.make_async_copy(
                e_hbm.at[:, j, b], e_buf.at[j % 2], sem.at[j % 2])

        # per-offset neighbor validity/index rows from iota (the static
        # (NW, Npad) tables as pipelined inputs cost ~0.3 MB of VMEM)
        n_row = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N), 2)
        yy_row = n_row // W
        xx_row = n_row % W

        bv = jnp.zeros((L, G, N), jnp.float32)
        bdst = jnp.zeros((L, G, N), jnp.float32)
        bdsc = jnp.zeros((L, G, N), jnp.float32)
        if "window" not in skip:
            dma(0).start()
        for j in ([] if "window" in skip else range(NW)):
            if j + 1 < NW:
                dma(j + 1).start()
            dma(j).wait()
            ej = _sigmoid(e_buf[j % 2][:, :G, :N].astype(jnp.float32))
            s = shifts[j]
            dy, dx = j // Wl - chw, j % Wl - cww
            okj = ((yy_row + dy >= 0) & (yy_row + dy <= H - 1)
                   & (xx_row + dx >= 0) & (xx_row + dx <= W - 1))
            nv = jnp.where(okj, 1.0, 0.0)                  # (1, 1, N)
            nc = jnp.where(okj, (n_row + s).astype(jnp.float32), 0.0)
            wj = pltpu.roll(d_all, (-s) % N, axis=2) * nv
            escj = ej * wj
            better = escj > bv
            bv = jnp.where(better, escj, bv)
            bdst = jnp.where(better, nc, bdst)
            bdsc = jnp.where(better, wj, bdsc)

        # ---------------- seeds: top-P instances per image -----------------
        # iterative masked argmax — reproduces lax.top_k's ascending-index
        # tie order exactly, including the all-zero (no-seed) case.
        # State is LANE-PACKED: (G, P, 128) with one lane per class — a
        # per-class list of (G, P, 1) arrays each physically pads to a full
        # (P, 128) lane tile (≈114 KB apiece, 5+ MB live), so per-class
        # slots are written with masked lane updates instead.
        sub_p = jax.lax.broadcasted_iota(jnp.int32, (G, P, 128), 1)
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (G, P, 128), 2)
        cells_a = jnp.zeros((G, P, 128), jnp.float32)
        scs_a = jnp.zeros((G, P, 128), jnp.float32)
        oks_a = jnp.zeros((G, P, 128), jnp.float32)

        inst = skeptT[0:G].reshape(G, 1, N)                # class 0 rows
        col_n = jax.lax.broadcasted_iota(
            jnp.int32, (G, 1, N), 2).astype(jnp.float32)
        masked = inst
        for p in ([] if "seeds" in skip else range(P)):
            v = jnp.max(masked, axis=2, keepdims=True)     # (G, 1, 1)
            first = jnp.min(jnp.where(masked == v, col_n, float(N)),
                            axis=2, keepdims=True)
            masked = jnp.where(col_n == first, -1.0, masked)
            slot = (sub_p == p) & (lane_c == 0)
            vc = jnp.maximum(v, 0.0)
            okv = jnp.where(v > 0.0, 1.0, 0.0)
            cells_a = jnp.where(slot, first, cells_a)
            scs_a = jnp.where(slot, vc, scs_a)
            oks_a = jnp.where(slot, okv, oks_a)

        # ---------------- tree walk (masked lane-reduce gathers) -----------
        row_n = jax.lax.broadcasted_iota(
            jnp.int32, (G, P, N), 2).astype(jnp.float32)

        for l, (s_c, d_c) in enumerate(
                [] if "walk" in skip else list(cfg.edges)):
            src_cell = cells_a[:, :, s_c:s_c + 1]          # (G, P, 1)
            src_ok = oks_a[:, :, s_c:s_c + 1]
            sel = jnp.where(row_n == src_cell, 1.0, 0.0)   # (G, P, N)
            bv_l = bv[l].reshape(G, 1, N)
            bd_l = bdst[l].reshape(G, 1, N)
            bs_l = bdsc[l].reshape(G, 1, N)
            ev = jnp.sum(sel * bv_l, axis=2, keepdims=True)  # (G, P, 1)
            ed = jnp.sum(sel * bd_l, axis=2, keepdims=True)
            es = jnp.sum(sel * bs_l, axis=2, keepdims=True)
            ok = src_ok * jnp.where(ev > 0.0, 1.0, 0.0)
            dst = lane_c == d_c
            cells_a = jnp.where(dst, jnp.where(ok > 0.5, ed, 0.0), cells_a)
            scs_a = jnp.where(dst, jnp.where(ok > 0.5, es, 0.0), scs_a)
            oks_a = jnp.where(dst, ok, oks_a)

        num_kp = jnp.sum(
            jnp.where((lane_c >= 1) & (lane_c < K1), oks_a, 0.0),
            axis=2, keepdims=True)                         # (G, P, 1)
        pvalid = oks_a[:, :, 0:1] * jnp.where(
            num_kp >= cfg.min_num_keypoints, 1.0, 0.0)
        # boxes/scores are masked by per-keypoint validity only; the
        # person-level mask applies to kp_valid (XLA parse semantics)
        kp_ok_post = oks_a * pvalid

        # ---------------- box gather at assigned cells ---------------------
        box_a = jnp.zeros((G, P, 128), jnp.float32)
        for c in ([] if "walk" in skip else range(K1)):
            sel = jnp.where(row_n == cells_a[:, :, c:c + 1], 1.0, 0.0)
            okc = oks_a[:, :, c:c + 1]
            sl = slice(c * G, (c + 1) * G)
            for qi, q in enumerate((cxp_r, cyp_r, bwp_r, bhp_r)):
                v = okc * jnp.sum(sel * q[sl, :N].reshape(G, 1, N),
                                  axis=2, keepdims=True)   # (G, P, 1)
                box_a = jnp.where(lane_c == 4 * c + qi, v, box_a)

        box_out[:] = box_a
        # score_out lanes: [kp_score(K1) | kp_valid(K1)] — the valid block
        # is the ok lanes rolled up by K1
        okpost_sh = pltpu.roll(kp_ok_post, K1, axis=2)
        score_out[:] = jnp.where(lane_c < K1, scs_a,
                                 jnp.where(lane_c < 2 * K1, okpost_sh, 0.0))
        valid_out[:] = jnp.where(lane_c == 0, pvalid,
                                 jnp.where(lane_c == 1, num_kp, 0.0))
        cell_out[:] = jnp.where(lane_c < K1, cells_a, 0.0)

    return kernel


@partial(jax.jit, static_argnums=(0, 2, 3, 4),
         static_argnames=("interpret", "skip", "exact_bf16", "q"))
def postprocess_batch_packed(cfg: PPNConfig, feature_map,
                             interpret: bool = False,
                             skip: frozenset = frozenset(),
                             exact_bf16: bool = False,
                             q: int = 128) -> People:
    """(B, H', W', C) feature map → batched People, G images per grid step.

    exact_bf16: build the prep views (incl. the dominant e-view transpose)
    in bfloat16 — lossless iff the feature map values are bf16-exact, which
    holds for anything the model produced (the head computes in bf16 and
    upcasts). Never set it for TTA-averaged or otherwise post-processed
    feature maps.

    q: quantity-block width in lanes (multiple of 128). Wider blocks pack
    more images per grid step (G = ⌊q / max(K1, L)⌋), halving the serial
    group count at the cost of VMEM; decisions are identical for any q.
    """
    views = packed_views(cfg, feature_map, exact_bf16=exact_bf16, q=q)
    return packed_call(cfg, feature_map.shape[0], views, interpret=interpret,
                       skip=skip, exact_bf16=exact_bf16, q=q)


def packed_views(cfg: PPNConfig, feature_map, exact_bf16: bool = False,
                 q: int = 128):
    """Build the XLA-prearranged kernel input views (colq, rowq, e).

    Split out of :func:`postprocess_batch_packed` so the attribution
    tooling (tools/packed_split.py) can time view materialization and
    the kernel separately — a fused-reduce probe can't, because XLA
    fuses a transpose into a consuming reduction and never materializes
    it, while a pallas_call consumer forces the HBM round trip."""
    H, W = cfg.outsize
    K1 = cfg.num_classes
    L = cfg.num_limbs
    N = H * W
    NW = cfg.local_grid_size[0] * cfg.local_grid_size[1]
    G = group_size(cfg, q)
    B = feature_map.shape[0]
    Bp = -(-B // G) * G
    nb = Bp // G
    Npad = -(-N // 128) * 128

    in_dt = jnp.bfloat16 if exact_bf16 else jnp.float32
    # Under exact_bf16 the column view never leaves the chip: the kernel
    # derives it from the row view with an exact MXU bf16 transpose
    # (identity matmul), saving the colq XLA prep + per-block DMA.
    derive_colq = exact_bf16
    fm = feature_map.astype(in_dt)
    if Bp != B:
        fm = jnp.pad(fm, ((0, Bp - B), (0, 0), (0, 0), (0, 0)))

    logits = fm[..., :6 * K1].reshape(nb, G, N, 6, K1)
    if derive_colq:
        colq = None
    else:
        # column view: (nb, N, 6, K1, G) → lanes c·G+g, padded to q/quantity
        colq = jnp.transpose(logits, (0, 2, 3, 4, 1)).reshape(
            nb, N, 6, K1 * G)
        colq = jnp.pad(colq, ((0, 0), (0, 0), (0, 0), (0, q - K1 * G)))
        colq = colq.reshape(nb, N, 6 * q)
    # row view: (nb, 6, K1, G, N) → rows c·G+g, q-row quantity blocks
    rowq = jnp.transpose(logits, (0, 3, 4, 1, 2)).reshape(nb, 6, K1 * G, N)
    rowq = jnp.pad(rowq, ((0, 0), (0, 0), (0, q - K1 * G),
                          (0, Npad - N)))
    rowq = rowq.reshape(nb, 6 * q, Npad)
    # Limb window tensor, RAW logits, channels-major (L, NW, nb, G, Npad) —
    # stays in HBM, DMA'd per offset as (L, G, Npad) slices; σ runs
    # in-kernel on the f32 upcast, bitwise the act.e the XLA parse path
    # uses (decode._sigmoid also upcasts before σ).
    # This layout is ONE flat 2D transpose from the feature map (cells in,
    # channels out) — r4 attribution (tools/view_probe.py): the old
    # (nb, NW, L·G, Npad) row-packed layout forced a worst-case (j, l, b)
    # relayout costing ~1.05 ms device @B=128 vs ~0.25 for the flat
    # transpose. A transposed head GEMM emits it outright (zero prep ops;
    # nn/model.py packed_feature + views_from_packed_head).
    Gp = group_stride(cfg, q)
    e = fm[..., 6 * K1:].reshape(Bp * N, L * NW)
    e = jnp.transpose(e, (1, 0)).reshape(L * NW, nb, G, N)
    e = jnp.pad(e, ((0, 0), (0, 0), (0, Gp - G), (0, Npad - N)))
    e = e.reshape(L, NW, nb, Gp, Npad)
    return colq, rowq, e


def views_from_packed_head(cfg: PPNConfig, box_t, e_t, q: int = 128):
    """Kernel input views from transposed head GEMM outputs (the serving
    fast path — nn/model.py ``packed_feature``).

    box_t: (6·(K+1), nb·Gp, Npad) bf16 — box logits, channels-major
    e_t:   (L·NW, nb·Gp, Npad) bf16 — limb logits, channels-major
    (Gp = group_stride(cfg, q): the batch is padded per group to the
    sublane tile so the kernel's per-offset e DMA is 8-aligned.)

    The e view is a pure reshape (zero ops); the rowq view is a small
    leading-dims permute of the ~4 MB box block (the per-group pad images
    are sliced back out) plus a one-row q pad. Compare packed_views,
    which pays a flat 2D transpose (~0.25 ms @B=128) to reach the same
    layouts from a (B, H', W', C) feature map.
    """
    K1 = cfg.num_classes
    L = cfg.num_limbs
    N = cfg.outsize[0] * cfg.outsize[1]
    NW = cfg.local_grid_size[0] * cfg.local_grid_size[1]
    G = group_size(cfg, q)
    Gp = group_stride(cfg, q)
    Npad = -(-N // 128) * 128
    nb = box_t.shape[1] // Gp
    rowq = box_t.reshape(6, K1, nb, Gp, Npad)[:, :, :, :G]
    rowq = jnp.transpose(rowq, (2, 0, 1, 3, 4)).reshape(nb, 6, K1 * G, Npad)
    rowq = jnp.pad(rowq, ((0, 0), (0, 0), (0, q - K1 * G), (0, 0)))
    rowq = rowq.reshape(nb, 6 * q, Npad)
    e = e_t.reshape(L, NW, nb, Gp, Npad)
    return None, rowq, e


def packed_call(cfg: PPNConfig, B: int, views, interpret: bool = False,
                skip: frozenset = frozenset(), exact_bf16: bool = False,
                q: int = 128) -> People:
    """Run the packed kernel on prebuilt views (see packed_views)."""
    H, W = cfg.outsize
    K1 = cfg.num_classes
    L = cfg.num_limbs
    P = cfg.max_instances
    N = H * W
    NW = cfg.local_grid_size[0] * cfg.local_grid_size[1]
    G = group_size(cfg, q)
    Bp = -(-B // G) * G
    nb = Bp // G
    Npad = -(-N // 128) * 128
    in_dt = jnp.bfloat16 if exact_bf16 else jnp.float32
    derive_colq = exact_bf16
    colq, rowq, e = views

    kernel = _make_packed_kernel(cfg, G, skip, q, derive_colq)
    grid = (nb,)
    n_in = 2 if derive_colq else 3
    in_specs = [
            pl.BlockSpec(memory_space=pl.ANY)  # pltpu.ANY is deprecated
            for _ in range(n_in)
        ]
    out_specs = [
        pl.BlockSpec((1, G, P, 128), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ]

    if derive_colq:
        def kernel_4d(rowq_hbm, e_hbm,
                      bo, so, vo, co, m_scr, blk_scr, rowq_s,
                      e_buf, sem):
            kernel(None, rowq_hbm, e_hbm,
                   bo.at[0], so.at[0], vo.at[0], co.at[0],
                   m_scr, blk_scr, None, rowq_s, e_buf, sem)

        operands = (rowq, e)
        stage_scratch = [pltpu.VMEM((2, 6 * q, Npad), in_dt)]
    else:
        def kernel_4d(colq_hbm, rowq_hbm, e_hbm,
                      bo, so, vo, co, m_scr, blk_scr, colq_s, rowq_s,
                      e_buf, sem):
            kernel(colq_hbm, rowq_hbm, e_hbm,
                   bo.at[0], so.at[0], vo.at[0], co.at[0],
                   m_scr, blk_scr, colq_s, rowq_s, e_buf, sem)

        operands = (colq, rowq, e)
        stage_scratch = [pltpu.VMEM((2, N, 6 * q), in_dt),
                         pltpu.VMEM((2, 6 * q, Npad), in_dt)]

    box, sc, val, cell = pl.pallas_call(
        kernel_4d,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nb, G, P, 128), jnp.float32)
            for _ in range(4)
        ],
        scratch_shapes=[
            pltpu.VMEM((N, N, q), jnp.bfloat16),
            pltpu.VMEM((N, q), jnp.bfloat16),
            *stage_scratch,
            pltpu.VMEM((2, L, -(-G // 8) * 8, Npad), in_dt),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        # the mask block + its build transients need more than the 16 MB
        # default scoped-vmem allowance (scales with the quantity width);
        # v5e VMEM is large enough
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(128, 64 * max(1, q // 128)) * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    box = box.reshape(Bp, P, 128)[:B, :, :K1 * 4]
    sc = sc.reshape(Bp, P, 128)[:B, :, :2 * K1]
    val = val.reshape(Bp, P, 128)[:B, :, :2]
    cell = cell.reshape(Bp, P, 128)[:B, :, :K1]

    kp_flat = cell.astype(jnp.int32)                      # (B, P, K1)
    kp_cell = jnp.stack([kp_flat // W, kp_flat % W], axis=-1)
    kp_box = box.reshape(B, P, K1, 4)
    kp_score = sc[..., :K1]
    kp_valid = sc[..., K1:] > 0.5
    valid = val[..., 0] > 0.5
    num_kp = val[..., 1].astype(jnp.int32)
    return People(kp_cell=kp_cell, kp_box=kp_box, kp_score=kp_score,
                  kp_valid=kp_valid, valid=valid, num_kp=num_kp)

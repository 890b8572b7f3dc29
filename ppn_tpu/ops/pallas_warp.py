"""VMEM-resident Pallas affine warp — the augmentation hot path.

``ops/image.affine_warp_separable`` factors the warp into two 1-D linear
resamples and runs each as a dense einsum against an on-the-fly hat-kernel
weight tensor. The math is right for the MXU, but the weight tensors are
(H, Wo, W)-dense — ~113 MB bf16 per 384² image — and einsum operands must
materialize, so the augmenter is pure HBM traffic: ~17 ms of a ~36 ms train
step at B=32 (VERDICT r2 weak #1 / next #2).

This kernel computes the same two passes with the SAME weight values but
never materializes them, exploiting that each hat row has ≤2 nonzero taps:

    in[y, r·x' + t_y]  with  t_y = s_y + f_y  (integer + fraction)
      = (rows circularly shifted by s_y)[y, (h0(x')+i) mod W]   i ∈ {0,1,2}
        weighted by hat(xi − k_i)·[0 ≤ k_i < W],  k_i = s_y + h0 + i

* the per-row integer shifts run as a 9-step log-shift (static lane rolls
  + per-row bit masks — fully vectorized, no per-row loops);
* the three shared gathers are one-hot matmuls on the MXU (0/1 × bf16
  pixels, single nonzero per row: exact);
* the ≤2 live taps are combined with bf16 hat weights in f32 — the same
  products and single effective rounding the dense einsum's MXU
  accumulation performs, so results match ``affine_warp_separable``
  bit-for-bit up to 1-ulp weight-argument boundary cases.

Pass 2 is the transpose (per-column sublane log-shift, one-hot left
matmuls). Everything for one image lives in VMEM (~2 MB); HBM traffic is
one image read + one write instead of ~230 MB of weights.

Reference lineage: ref:dataset.py† PIL rotate/crop/resize (SURVEY.md §3.5)
— the reference warps per-sample on CPU; here the whole batch warps in one
kernel inside the jitted train step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hat_bf16(u):
    return jnp.maximum(0.0, 1.0 - jnp.abs(u)).astype(jnp.bfloat16)


def _log_shift_rows(x, s_mod, W: int):
    """rows[y] ← rows[y] circularly shifted left by s_mod[y] (lane rolls)."""
    nbits = max(1, (W - 1).bit_length())
    for bit in range(nbits):
        sh = (1 << bit) % W
        if sh == 0:
            continue
        cand = pltpu.roll(x, W - sh, axis=1)  # left-shift by sh
        m = ((s_mod >> bit) & 1) == 1          # (H, 1)
        x = jnp.where(m, cand, x)
    return x


def _log_shift_cols(x, s_mod, H: int):
    """cols[x] ← cols[x] circularly shifted up by s_mod[x] (sublane rolls)."""
    nbits = max(1, (H - 1).bit_length())
    for bit in range(nbits):
        sh = (1 << bit) % H
        if sh == 0:
            continue
        cand = pltpu.roll(x, H - sh, axis=0)
        m = ((s_mod >> bit) & 1) == 1          # (1, W)
        x = jnp.where(m, cand, x)
    return x


def _make_warp_kernel(H: int, W: int, C: int, io_dtype=jnp.float32):
    def kernel(img4_ref, m_ref, out4_ref):
        """img4_ref: (1, C, H, W) block; m_ref: (1, 1, 8) f32 SMEM
        [a b c d e f . .]; out4_ref: (1, C, H, W) block. Matches
        affine_warp_separable's math.

        io_dtype=bfloat16 halves the kernel's HBM traffic with identical
        internal math: pixels are rounded to bf16 at the first matmul
        operand anyway, so a bf16 input block changes nothing in pass 1,
        and the bf16 output is exactly round(f32 result)."""
        img_ref = img4_ref.at[0]
        out_ref = out4_ref.at[0]
        a = m_ref[0, 0, 0]
        b = m_ref[0, 0, 1]
        c = m_ref[0, 0, 2]
        d = m_ref[0, 0, 3]
        e = m_ref[0, 0, 4]
        f = m_ref[0, 0, 5]
        # same degenerate-e guard as affine_warp_separable
        e = jnp.where(jnp.abs(e) < 1e-3,
                      jnp.sign(e) * 1e-3 + (e == 0) * 1e-3, e)

        # int iota → astype: Mosaic has no f32 iota
        y_col = jax.lax.broadcasted_iota(jnp.int32, (H, 1), 0
                                         ).astype(jnp.float32)
        x_row = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1
                                         ).astype(jnp.float32)

        # ---- pass 1: horizontal. in[y, r·x' + t_y] -----------------------
        r = a - b * d / e
        t_y = (b / e) * y_col + (c - b * f / e)            # (H, 1)
        xi = r * x_row + t_y                               # (H, W) — the
        # exact expression the dense version evaluates hat against
        s_y = jnp.floor(t_y)
        s_mod = jnp.mod(s_y.astype(jnp.int32), W)          # (H, 1) ≥ 0
        h0 = jnp.floor(r * x_row)                          # (1, W)
        u_iota = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)

        w1 = []
        S1 = []
        for i in range(3):
            k_i = s_y + h0 + i                             # (H, W) integer
            valid = (k_i >= 0) & (k_i <= W - 1)
            w1.append(jnp.where(valid, _hat_bf16(xi - k_i),
                                0).astype(jnp.float32))
            tgt = jnp.mod(h0.astype(jnp.int32) + i, W)     # (1, W)
            S1.append(jnp.where(u_iota == tgt, 1.0,
                                0.0).astype(jnp.bfloat16))

        # ---- pass 2 setup: out[y, x] = tmp[e·y + d·x + f, x] -------------
        u_x = d * x_row + f                                # (1, W)
        yi = e * y_col + u_x                               # (H, W)
        s_x = jnp.floor(u_x)
        s2_mod = jnp.mod(s_x.astype(jnp.int32), H)         # (1, W)
        v0 = jnp.floor(e * y_col)                          # (H, 1)
        v_iota = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)

        w2 = []
        S2 = []
        for i in range(3):
            k_i = s_x + v0 + i                             # (H, W)
            valid = (k_i >= 0) & (k_i <= H - 1)
            w2.append(jnp.where(valid, _hat_bf16(yi - k_i),
                                0).astype(jnp.float32))
            tgt = jnp.mod(v0.astype(jnp.int32) + i, H)     # (H, 1)
            S2.append(jnp.where(v_iota == tgt, 1.0,
                                0.0).astype(jnp.bfloat16))

        for ch in range(C):
            # rolls stay f32 (Mosaic's dynamic_rotate crashes on bf16);
            # bf16 cast happens at the matmul operand, same values
            R = _log_shift_rows(img_ref[ch].astype(jnp.float32), s_mod,
                                W).astype(jnp.bfloat16)
            tmp = jnp.zeros((H, W), jnp.float32)
            for i in range(3):
                A = jnp.dot(R, S1[i], preferred_element_type=jnp.float32)
                tmp = tmp + w1[i] * A
            # the dense version rounds tmp to bf16 between passes; rolling
            # the rounded-but-f32-held values keeps parity AND f32 rotate
            tmp16 = tmp.astype(jnp.bfloat16).astype(jnp.float32)
            Rv = _log_shift_cols(tmp16, s2_mod, H).astype(jnp.bfloat16)
            out = jnp.zeros((H, W), jnp.float32)
            for i in range(3):
                Bm = jnp.dot(S2[i], Rv, preferred_element_type=jnp.float32)
                out = out + w2[i] * Bm
            out_ref[ch] = out.astype(io_dtype)

    return kernel


@partial(jax.jit, static_argnums=(2,))
def affine_warp_batch_pallas(images, matrices, interpret: bool = False):
    """Batched same-size affine warp.

    images:   (B, H, W, C) float — warped at their own resolution
    matrices: (B, 2, 3) OUTPUT→INPUT affines (ops/image.make_affine bwd)
    Returns (B, H, W, C) in the input's dtype (float32 or bfloat16),
    zero-padded outside the source frame; elementwise ≈
    vmap(affine_warp_separable) (same weights/precision). A bfloat16
    input halves the kernel's HBM traffic and the surrounding NHWC↔NCHW
    relayouts; its output equals round_bf16(float32 output) exactly
    (pixels hit the matmul operands as bf16 either way).
    """
    B, H, W, C = images.shape
    io_dtype = (jnp.bfloat16 if images.dtype == jnp.bfloat16
                else jnp.float32)
    imgs = jnp.transpose(images.astype(io_dtype), (0, 3, 1, 2))
    mats = jnp.concatenate(
        [matrices.reshape(B, 6).astype(jnp.float32),
         jnp.zeros((B, 2), jnp.float32)], axis=1).reshape(B, 1, 8)

    out = pl.pallas_call(
        _make_warp_kernel(H, W, C, io_dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, H, W), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, C, H, W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), io_dtype),
        interpret=interpret,
    )(imgs, mats)
    return jnp.transpose(out, (0, 2, 3, 1))

"""On-device image ops: bilinear affine warp + resize.

The reference does rotation/crop/zoom/resize per-sample with PIL on CPU
(ref:dataset.py†, SURVEY.md §3.5). TPU-native: one fused inverse-warp
bilinear gather per image, batched with vmap, jit-compiled — so the whole
augment/resize stage runs on device (BASELINE north-star).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_warp(image: jnp.ndarray, matrix: jnp.ndarray,
                out_size: tuple[int, int],
                fill: float = 0.0) -> jnp.ndarray:
    """Inverse-warp one image with bilinear sampling.

    image:  (H, W, C) float
    matrix: (2, 3) mapping OUTPUT pixel coords (x, y, 1) → INPUT (x, y)
    out_size: (H_out, W_out)
    """
    H, W = image.shape[:2]
    Ho, Wo = out_size
    yo = jax.lax.broadcasted_iota(jnp.float32, (Ho, Wo), 0)
    xo = jax.lax.broadcasted_iota(jnp.float32, (Ho, Wo), 1)

    xi = matrix[0, 0] * xo + matrix[0, 1] * yo + matrix[0, 2]
    yi = matrix[1, 0] * xo + matrix[1, 1] * yo + matrix[1, 2]

    x0 = jnp.floor(xi)
    y0 = jnp.floor(yi)
    fx = xi - x0
    fy = yi - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yy, xx):
        inb = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        v = image[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
        return jnp.where(inb[..., None], v, fill)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def affine_warp_separable(image: jnp.ndarray, matrix: jnp.ndarray,
                          out_size: tuple[int, int]) -> jnp.ndarray:
    """Two-pass (Catmull–Smith) affine warp as batched matmuls — the
    MXU-friendly formulation of ``affine_warp``.

    A general output→input affine  (xi, yi) = M·(x, y, 1)  factors into a
    horizontal pass  tmp[y, x'] = in[y, h(x', y)]  with h linear per row,
    followed by a vertical pass  out[y, x] = tmp[v(x, y), x]  with v linear
    per column. Each 1-D linear resample is an einsum against a banded
    hat-kernel weight tensor, so the whole warp runs on the MXU instead of
    75M scalar gathers (~20× faster on TPU; per-pixel gathers are scalar
    there). Weights are bf16 (≤4e-3 interp error — irrelevant for
    augmentation); degenerate near ±90° rotations (e→0), fine for the
    ±40° augmentation range.

    image: (H, W, C) float; matrix: (2, 3) OUTPUT→INPUT; out zero-padded.
    """
    H, W = image.shape[:2]
    Ho, Wo = out_size
    a, b, c = matrix[0, 0], matrix[0, 1], matrix[0, 2]
    d, e, f = matrix[1, 0], matrix[1, 1], matrix[1, 2]
    e = jnp.where(jnp.abs(e) < 1e-3, jnp.sign(e) * 1e-3 + (e == 0) * 1e-3, e)

    def hat(u):
        return jnp.maximum(0.0, 1.0 - jnp.abs(u)).astype(jnp.bfloat16)

    # ---- pass 1: horizontal. tmp[y, x'] = in[y, r·x' + t(y)] -------------
    r = a - b * d / e
    y_in = jax.lax.broadcasted_iota(jnp.float32, (H, 1), 0)
    x_out = jax.lax.broadcasted_iota(jnp.float32, (1, Wo), 1)
    t_y = (b / e) * y_in + (c - b * f / e)               # (H, 1)
    xi = r * x_out + t_y                                 # (H, Wo)
    k = jax.lax.broadcasted_iota(jnp.float32, (1, 1, W), 2)
    # bf16 weights AND pixels: halves the (H·Wo·W) weight-tensor HBM
    # traffic, costing ≤4e-3 pixel error — irrelevant for augmentation
    T1 = hat(xi[..., None] - k)                          # (H, Wo, W) bf16
    tmp = jnp.einsum("ywk,ykc->ywc", T1, image.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)  # (H, Wo, C)

    # ---- pass 2: vertical. out[y, x] = tmp[d·x + e·y + f, x] -------------
    y_out = jax.lax.broadcasted_iota(jnp.float32, (Ho, 1), 0)
    x_o2 = jax.lax.broadcasted_iota(jnp.float32, (1, Wo), 1)
    yi = e * y_out + (d * x_o2 + f)                      # (Ho, Wo)
    m = jax.lax.broadcasted_iota(jnp.float32, (1, 1, H), 2)
    T2 = hat(yi[..., None] - m)                          # (Ho, Wo, H) bf16
    out = jnp.einsum("yxm,mxc->yxc", T2, tmp.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return out.astype(image.dtype)


def make_affine(center_in, center_out, angle_rad, scale, translate,
                flip: jnp.ndarray | bool = False):
    """(2,3) OUTPUT→INPUT matrix for rotate/scale/translate/flip about
    centers, plus the matching forward (INPUT→OUTPUT) matrix for keypoints.

    center_in:  (2,) (x, y) in the input image
    center_out: (2,) (x, y) in the output image
    translate:  (2,) extra output-space offset in pixels
    scale: output pixels per input pixel (so >1 zooms in); inverse applied
    in the backward map.
    """
    cos = jnp.cos(angle_rad)
    sin = jnp.sin(angle_rad)
    fsign = jnp.where(jnp.asarray(flip), -1.0, 1.0)

    # forward: p_out = R·S·F·(p_in − c_in) + c_out + t
    a = scale * cos * fsign
    b = -scale * sin
    c = scale * sin * fsign
    d = scale * cos
    fwd = jnp.stack([
        jnp.stack([a, b,
                   -a * center_in[0] - b * center_in[1]
                   + center_out[0] + translate[0]]),
        jnp.stack([c, d,
                   -c * center_in[0] - d * center_in[1]
                   + center_out[1] + translate[1]]),
    ])
    # backward (what affine_warp needs): invert the 2×2 + offset
    det = a * d - b * c
    ia, ib, ic, id_ = d / det, -b / det, -c / det, a / det
    tx = fwd[0, 2]
    ty = fwd[1, 2]
    bwd = jnp.stack([
        jnp.stack([ia, ib, -ia * tx - ib * ty]),
        jnp.stack([ic, id_, -ic * tx - id_ * ty]),
    ])
    return bwd, fwd


def apply_affine_points(fwd: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply forward (2,3) matrix to (..., 2) xy points."""
    x = fwd[0, 0] * pts[..., 0] + fwd[0, 1] * pts[..., 1] + fwd[0, 2]
    y = fwd[1, 0] * pts[..., 0] + fwd[1, 1] * pts[..., 1] + fwd[1, 2]
    return jnp.stack([x, y], axis=-1)


def resize_bilinear(image: jnp.ndarray, out_size: tuple[int, int]
                    ) -> jnp.ndarray:
    """(..., H, W, C) → (..., H_out, W_out, C) bilinear resize (on device).
    Used by the streaming-video path for 720p → insize (BASELINE config #5)."""
    *lead, H, W, C = image.shape
    return jax.image.resize(image, (*lead, *out_size, C), method="bilinear")

"""PoseProposalNet: backbone + dense grid head (ref:model.py†, SURVEY.md §2.1).

Head parity: 1 conv(3×3)+BN+LeakyReLU block on the 512-ch backbone feature,
then a linear 1×1 conv to ``6(K+1) + H_l·W_l·L`` channels at grid resolution
[BASELINE][PAPER]. Output is float32 NHWC regardless of compute dtype, since
the loss/decode math runs in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from ppn_tpu.configs.base import PPNConfig
from ppn_tpu.nn.resnet import ConvBN, resnet18, resnet34, resnet50

_BACKBONES = {"resnet18": resnet18, "resnet34": resnet34,
              "resnet50": resnet50}


class PPNHead(nnx.Module):
    def __init__(self, cfg: PPNConfig, cin: int, *, dtype=jnp.bfloat16,
                 rngs: nnx.Rngs):
        self.block = ConvBN(cin, 512, 3, 1, dtype=dtype, rngs=rngs)
        self.out = nnx.Conv(
            512, cfg.num_channels, kernel_size=(1, 1), use_bias=True,
            dtype=dtype, param_dtype=jnp.float32,
            # start resp/conf σ-scores low so early training isn't swamped
            # by false positives (YOLO-style init)
            bias_init=nnx.initializers.constant(-1.0),
            rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nnx.leaky_relu(self.block(x), negative_slope=0.1)
        return self.out(x)


class PoseProposalNet(nnx.Module):
    """images (B, H, W, 3) float32 in [0,1] → feature map (B, H', W', C) f32."""

    # ImageNet normalization — the reference normalizes in the data layer
    # (ref:dataset.py†); here it is fused into the first device computation.
    MEAN = (0.485, 0.456, 0.406)
    STD = (0.229, 0.224, 0.225)

    def __init__(self, cfg: PPNConfig, *, dtype=jnp.bfloat16, rngs: nnx.Rngs):
        self.cfg = cfg
        self.dtype = dtype
        if cfg.backbone not in _BACKBONES:
            raise ValueError(f"unknown backbone {cfg.backbone!r}")
        self.backbone = _BACKBONES[cfg.backbone](dtype=dtype, rngs=rngs)
        self.head = PPNHead(cfg, self.backbone.out_features, dtype=dtype,
                            rngs=rngs)

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        if images.dtype == jnp.uint8:
            # uint8 transport: 4× less host→device traffic; normalize here
            images = images.astype(jnp.float32) / 255.0
        mean = jnp.asarray(self.MEAN, images.dtype)
        std = jnp.asarray(self.STD, images.dtype)
        x = (images - mean) / std
        f = self.backbone(x.astype(self.dtype))
        return self.head(f).astype(jnp.float32)

    def packed_feature(self, images: jnp.ndarray, *, q: int = 256):
        """Serving-path forward: head outputs emitted directly in the
        packed postprocess kernel's channels-major layouts.

        The final 1×1 conv is computed as the transposed GEMM ``Wᵀ·Xᵀ``
        with grid cells pre-padded to the lane tile, so the outputs ARE
        the kernel views: the ~1 ms of XLA relayouts
        `ops/pallas_post_packed.packed_views` pays at B=128 never
        happens, and neither does the f32 upcast round-trip.

        Numerics contract: same bf16 contraction and bias add as
        ``__call__``; bitwise on CPU, but the TPU conv lowering
        accumulates in a different pass order, so on hardware logits
        carry a 1-bf16-ulp-at-accumulator-scale residue (~88% exactly
        equal, max abs diff 6.25e-2 on logits spanning ±30 — near-
        cancellation outputs see it as several output-scale ulps; every
        dot formulation reproduces the identical residue, see
        artifacts/tpu_pallas_parity.json packed_head_serving). Parse
        DECISIONS are the tested contract and are bitwise vs the
        standard path on hardware (tools/tpu_parity_artifact.py); a
        score tie inside the residue could in principle flip — zero
        observed.

        Returns ``(box_t (6·(K+1), nb·Gp, Npad), e_t (L·NW, nb·Gp, Npad))``
        in bfloat16, batch zero-padded per packed-kernel group to the
        group stride Gp (sublane-aligned DMA slices) for the given
        quantity width ``q``.
        """
        from ppn_tpu.ops.pallas_post_packed import group_size, group_stride

        cfg = self.cfg
        K1 = cfg.num_classes
        H, W = cfg.outsize
        N = H * W
        G = group_size(cfg, q)
        Gp = group_stride(cfg, q)
        Npad = -(-N // 128) * 128

        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        mean = jnp.asarray(self.MEAN, images.dtype)
        std = jnp.asarray(self.STD, images.dtype)
        x = (images - mean) / std
        f = self.backbone(x.astype(self.dtype))
        h = nnx.leaky_relu(self.head.block(f), negative_slope=0.1)

        B = h.shape[0]
        Bp = -(-B // G) * G
        nb = Bp // G
        h = h.reshape(B, N, -1)
        # pad cells → Npad and groups → Gp BEFORE the GEMM: the pads ride
        # the small activation tensor, not the 2× larger output (a
        # standalone output pad measured ~0.6 ms @B=128 —
        # tools/view_probe.py e_flat_pad vs e_flat2d). Tiny batch pad
        # first, then ONE two-dim pad pass for the bulk.
        h = jnp.pad(h, ((0, Bp - B), (0, 0), (0, 0)))
        h = h.reshape(nb, G, N, -1)
        h = jnp.pad(h, ((0, 0), (0, Gp - G), (0, Npad - N), (0, 0)))
        h = h.reshape(nb * Gp, Npad, -1)
        kern = self.head.out.kernel[...].reshape(h.shape[-1], -1)
        bias = self.head.out.bias[...]
        kern = kern.astype(self.dtype)
        bias = bias.astype(self.dtype)
        # (C_part, Bp, Npad) = Wᵀ·Xᵀ — one MXU GEMM per channel group,
        # output written channels-major (no transpose pass anywhere)
        def t_gemm(w, b):
            out = jax.lax.dot_general(
                w, h, dimension_numbers=(((0,), (2,)), ((), ())))
            return out + b[:, None, None]

        box_t = t_gemm(kern[:, :6 * K1], bias[:6 * K1])
        e_t = t_gemm(kern[:, 6 * K1:], bias[6 * K1:])
        return box_t, e_t


def num_params(model: nnx.Module) -> int:
    import jax

    state = nnx.state(model, nnx.Param)
    return sum(p.size for p in jax.tree.leaves(state))

"""PoseProposalNet: backbone + dense grid head (ref:model.py†, SURVEY.md §2.1).

Head parity: 1 conv(3×3)+BN+LeakyReLU block on the 512-ch backbone feature,
then a linear 1×1 conv to ``6(K+1) + H_l·W_l·L`` channels at grid resolution
[BASELINE][PAPER]. Output is float32 NHWC regardless of compute dtype, since
the loss/decode math runs in float32.
"""

from __future__ import annotations

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


def num_params(model: nnx.Module) -> int:
    import jax

    state = nnx.state(model, nnx.Param)
    return sum(p.size for p in jax.tree.leaves(state))

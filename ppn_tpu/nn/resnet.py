"""ResNet backbone in Flax NNX — TPU-native NHWC, bf16 compute / fp32 params.

Parity target: the reference truncates torchvision ``resnet18`` (avgpool/fc
removed) into a stride-32 feature extractor, 384×384 → (512, 12, 12)
(ref:model.py†/ref:network_resnet.py†, SURVEY.md §2.1 Backbone row). This is
a from-scratch NNX implementation of the same topology, laid out NHWC so XLA
tiles convs straight onto the MXU, with BatchNorm statistics kept in float32.

Under jit + NamedSharding data parallelism, BatchNorm reduces over the global
(sharded) batch automatically — no axis_name plumbing needed (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import nnx


class ConvBN(nnx.Module):
    """Conv → BatchNorm (no activation), the fused unit of every ResNet block."""

    def __init__(self, cin: int, cout: int, kernel: int, stride: int = 1,
                 *, dtype=jnp.bfloat16, rngs: nnx.Rngs):
        self.conv = nnx.Conv(
            cin, cout, kernel_size=(kernel, kernel),
            strides=(stride, stride), padding="SAME", use_bias=False,
            dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.bn = nnx.BatchNorm(
            cout, momentum=0.9, epsilon=1e-5, use_running_average=False,
            dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.bn(self.conv(x))


class BasicBlock(nnx.Module):
    """ResNet-18/34 basic block: 3×3 → 3×3 with identity/projection skip."""

    def __init__(self, cin: int, cout: int, stride: int = 1,
                 *, dtype=jnp.bfloat16, rngs: nnx.Rngs):
        self.conv1 = ConvBN(cin, cout, 3, stride, dtype=dtype, rngs=rngs)
        self.conv2 = ConvBN(cout, cout, 3, 1, dtype=dtype, rngs=rngs)
        self.proj = (ConvBN(cin, cout, 1, stride, dtype=dtype, rngs=rngs)
                     if (stride != 1 or cin != cout) else None)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        skip = x if self.proj is None else self.proj(x)
        y = nnx.relu(self.conv1(x))
        y = self.conv2(y)
        return nnx.relu(y + skip)


class Bottleneck(nnx.Module):
    """ResNet-50-style bottleneck: 1×1 reduce → 3×3 → 1×1 expand (×4).

    Matches the torchvision topology (stride on the 3×3, torchvision≥0.4
    "ResNet v1.5") so ImageNet state_dicts convert 1:1 via
    ``utils/torch_import.py``.
    """

    expansion = 4

    def __init__(self, cin: int, cout: int, stride: int = 1,
                 *, dtype=jnp.bfloat16, rngs: nnx.Rngs):
        cexp = cout * self.expansion
        self.conv1 = ConvBN(cin, cout, 1, 1, dtype=dtype, rngs=rngs)
        self.conv2 = ConvBN(cout, cout, 3, stride, dtype=dtype, rngs=rngs)
        self.conv3 = ConvBN(cout, cexp, 1, 1, dtype=dtype, rngs=rngs)
        self.proj = (ConvBN(cin, cexp, 1, stride, dtype=dtype, rngs=rngs)
                     if (stride != 1 or cin != cexp) else None)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        skip = x if self.proj is None else self.proj(x)
        y = nnx.relu(self.conv1(x))
        y = nnx.relu(self.conv2(y))
        y = self.conv3(y)
        return nnx.relu(y + skip)


class ResNet(nnx.Module):
    """Stride-32 ResNet feature extractor (stages only, no pool/fc head)."""

    def __init__(self, stage_sizes: Sequence[int],
                 widths: Sequence[int] = (64, 128, 256, 512),
                 block=BasicBlock,
                 *, dtype=jnp.bfloat16, rngs: nnx.Rngs):
        self.dtype = dtype
        self.stem = ConvBN(3, widths[0], 7, 2, dtype=dtype, rngs=rngs)
        expansion = getattr(block, "expansion", 1)
        blocks = []
        cin = widths[0]
        for stage, (n, cout) in enumerate(zip(stage_sizes, widths)):
            for i in range(n):
                stride = 2 if (i == 0 and stage > 0) else 1
                blocks.append(
                    block(cin, cout, stride, dtype=dtype, rngs=rngs))
                cin = cout * expansion
        self.blocks = nnx.List(blocks)
        self.out_features = cin

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) → (B, H/32, W/32, 512)."""
        x = x.astype(self.dtype)
        x = nnx.relu(self.stem(x))
        x = nnx.max_pool(x, window_shape=(3, 3), strides=(2, 2),
                         padding="SAME")
        for block in self.blocks:
            x = block(x)
        return x


def resnet18(*, dtype=jnp.bfloat16, rngs: nnx.Rngs) -> ResNet:
    """The reference's backbone topology (torchvision resnet18 truncation)."""
    return ResNet((2, 2, 2, 2), dtype=dtype, rngs=rngs)


def resnet34(*, dtype=jnp.bfloat16, rngs: nnx.Rngs) -> ResNet:
    return ResNet((3, 4, 6, 3), dtype=dtype, rngs=rngs)


def resnet50(*, dtype=jnp.bfloat16, rngs: nnx.Rngs) -> ResNet:
    """Bottleneck variant (out_features 2048) — the reference's Chainer
    lineage ships resnet18/34/50 backbones [LINEAGE, SURVEY.md §2.1]."""
    return ResNet((3, 4, 6, 3), block=Bottleneck, dtype=dtype, rngs=rngs)

"""Import torchvision ResNet weights as data (SURVEY.md §5 checkpoint row).

The reference initializes its backbone from ImageNet-pretrained torchvision
``resnet18`` (ref:model.py†). This environment has no torchvision and no
network, so pretrained init is delivered as a converter: point
``load_torch_resnet`` at any torchvision-format ``state_dict`` (a ``.pth``
the user supplies) and it maps the weights into the NNX backbone:

    conv OIHW → HWIO;  bn.{weight,bias,running_mean,running_var}
    → BatchNorm.{scale,bias,mean,var};  layer{s}.{i}.* → blocks[flat].*

Weights are artifacts, not code — this is data conversion, not a port.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from ppn_tpu.nn.resnet import ConvBN, ResNet


def _set_convbn(cb: ConvBN, sd: Mapping[str, np.ndarray], conv_key: str,
                bn_key: str) -> None:
    w = np.asarray(sd[f"{conv_key}.weight"])         # (O, I, kh, kw)
    cb.conv.kernel[...] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
    cb.bn.scale[...] = np.asarray(sd[f"{bn_key}.weight"], np.float32)
    cb.bn.bias[...] = np.asarray(sd[f"{bn_key}.bias"], np.float32)
    cb.bn.mean[...] = np.asarray(sd[f"{bn_key}.running_mean"], np.float32)
    cb.bn.var[...] = np.asarray(sd[f"{bn_key}.running_var"], np.float32)


def load_torch_resnet(backbone: ResNet, state_dict: Mapping[str, np.ndarray],
                      strict: bool = True) -> int:
    """Copy a torchvision ResNet-18/34/50 state_dict into the NNX backbone
    in place (bottleneck blocks are detected by a ``conv3`` key). Returns
    the number of tensors consumed."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()
          if not k.endswith("num_batches_tracked")
          and not k.startswith("fc.")}
    used = 0

    _set_convbn(backbone.stem, sd, "conv1", "bn1")
    used += 5

    # torchvision stage sizes from the flat block list
    flat = 0
    for stage in range(4):
        i = 0
        while f"layer{stage + 1}.{i}.conv1.weight" in sd:
            block = backbone.blocks[flat]
            pre = f"layer{stage + 1}.{i}"
            _set_convbn(block.conv1, sd, f"{pre}.conv1", f"{pre}.bn1")
            _set_convbn(block.conv2, sd, f"{pre}.conv2", f"{pre}.bn2")
            used += 10
            if f"{pre}.conv3.weight" in sd:
                if not hasattr(block, "conv3"):
                    raise ValueError(
                        f"{pre} is a bottleneck but the NNX block is basic "
                        "— topology mismatch")
                _set_convbn(block.conv3, sd, f"{pre}.conv3", f"{pre}.bn3")
                used += 5
            if f"{pre}.downsample.0.weight" in sd:
                if block.proj is None:
                    raise ValueError(
                        f"{pre} has a downsample but the NNX block has no "
                        "projection — topology mismatch")
                _set_convbn(block.proj, sd, f"{pre}.downsample.0",
                            f"{pre}.downsample.1")
                used += 5
            flat += 1
            i += 1

    if flat != len(backbone.blocks):
        msg = (f"state_dict provides {flat} blocks, backbone has "
               f"{len(backbone.blocks)}")
        if strict:
            raise ValueError(msg)
        print("warning:", msg)
    if strict and used != len(sd):
        raise ValueError(
            f"consumed {used} tensors but state_dict has {len(sd)}")
    return used


def load_torch_resnet_file(backbone: ResNet, path: str) -> int:
    """Load a ``.pth`` torchvision checkpoint (torch cpu is available in the
    image for exactly this kind of artifact interop)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    sd = {k: v.numpy() for k, v in obj.items()}
    return load_torch_resnet(backbone, sd)

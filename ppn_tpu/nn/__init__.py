from ppn_tpu.nn.model import PoseProposalNet, PPNHead, num_params
from ppn_tpu.nn.resnet import (BasicBlock, Bottleneck, ConvBN, ResNet,
                               resnet18, resnet34, resnet50)

__all__ = [
    "BasicBlock",
    "Bottleneck",
    "ConvBN",
    "PPNHead",
    "PoseProposalNet",
    "ResNet",
    "num_params",
    "resnet18",
    "resnet34",
    "resnet50",
]

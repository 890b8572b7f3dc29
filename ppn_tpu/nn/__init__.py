from ppn_tpu.nn.model import PoseProposalNet, PPNHead, num_params
from ppn_tpu.nn.resnet import BasicBlock, ConvBN, ResNet, resnet18, resnet34

__all__ = [
    "BasicBlock",
    "ConvBN",
    "PPNHead",
    "PoseProposalNet",
    "ResNet",
    "num_params",
    "resnet18",
    "resnet34",
]

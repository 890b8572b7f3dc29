"""ppn-tpu: a TPU-native Pose Proposal Network framework (JAX/XLA/Pallas).

Built from scratch with the capabilities of
noirmist/Pytorch_Pose_Proposal_Network (see SURVEY.md for the structural
analysis and its §0 provenance caveat).
"""

__version__ = "0.1.0"

"""Flax/NNX model library (NHWC, TPU-native layouts).

Public factory mirrors the reference registry (models/__init__.py:6-23):
`get_model(model_cfg, n_classes)` builds the joint segmentation+monodepth
model description from a config dict.
"""

from .joint import JointSegmentationDepth, build_model, get_model
from .resnet import ResNetEncoder
from .depth_decoder import DepthDecoder
from .pose_decoder import PoseDecoder
from .seg_decoder import JointSegDepthDecoder, PAD

__all__ = [
    "JointSegmentationDepth",
    "build_model",
    "get_model",
    "ResNetEncoder",
    "DepthDecoder",
    "PoseDecoder",
    "JointSegDepthDecoder",
    "PAD",
]

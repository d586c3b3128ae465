"""Detection models and building blocks (counterpart of
``torchvision/models/detection``)."""

from ._utils import BalancedPositiveNegativeSampler, BoxCoder, Matcher  # noqa: F401
from .anchor_utils import AnchorGenerator  # noqa: F401
from .backbone_utils import (  # noqa: F401
    BackboneWithFPN,
    FeaturePyramidNetwork,
    LastLevelMaxPool,
    LastLevelP6P7,
)
from .retinanet import RetinaNet, RetinaNetHead, retinanet_resnet50_fpn  # noqa: F401
from .transform import GeneralizedRCNNTransform  # noqa: F401

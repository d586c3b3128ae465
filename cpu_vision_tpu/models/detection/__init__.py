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
from .fcos import FCOS, fcos_resnet50_fpn  # noqa: F401
from .faster_rcnn import FasterRCNN, fasterrcnn_resnet50_fpn  # noqa: F401
from .keypoint_rcnn import KeypointRCNN, keypointrcnn_resnet50_fpn  # noqa: F401
from .ssdlite import SSDLite, ssdlite320_mobilenet_v3_large  # noqa: F401
from .ssd import SSD, DefaultBoxGenerator, ssd300_vgg16  # noqa: F401
from .mask_rcnn import MaskRCNN, MaskRCNNHeads, maskrcnn_resnet50_fpn  # noqa: F401
from .retinanet import RetinaNet, RetinaNetHead, retinanet_resnet50_fpn  # noqa: F401
from .roi_heads import (  # noqa: F401
    FastRCNNPredictor,
    RoIHeads,
    TwoMLPHead,
    paste_masks_in_image,
)
from .rpn import RegionProposalNetwork, RPNHead  # noqa: F401
from .generalized_rcnn import detect  # noqa: F401
from .transform import GeneralizedRCNNTransform  # noqa: F401


def _export_detection_builders():
    """Attach the v2/mobilenet variant builders registered from the model
    modules so ``models.detection.<name>`` mirrors the reference layout."""
    g = globals()
    from .._api import _MODEL_REGISTRY

    for name, builder in _MODEL_REGISTRY.items():
        if any(k in name for k in ("rcnn", "retinanet", "fcos", "ssd")):
            g.setdefault(name, builder)


_export_detection_builders()

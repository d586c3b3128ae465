"""Model zoo (flax.linen, NHWC) with a name registry.

Counterpart of ``torchvision/models``: classification families, segmentation
heads, feature extraction, and the ``register_model``/``get_model``/
``list_models``/``Weights`` registry machinery (``models/_api.py``).
"""

from ._api import (  # noqa: F401
    Weights,
    WeightsEnum,
    get_model,
    get_model_builder,
    get_model_weights,
    get_weight,
    list_models,
    register_model,
)
from . import alexnet as _alexnet  # noqa: F401
from . import detection as _detection  # noqa: F401
from . import optical_flow as _optical_flow  # noqa: F401
from . import stereo as _stereo  # noqa: F401
from . import googlenet as _googlenet  # noqa: F401
from . import maxvit as _maxvit  # noqa: F401
from . import mvit as _mvit  # noqa: F401
from . import quantization  # noqa: F401
from . import torch_weights  # noqa: F401
from .pth import load_pth_state_dict  # noqa: F401
from .torch_weights import resnet_from_torch  # noqa: F401
from . import regnet as _regnet  # noqa: F401
from . import small_nets as _small_nets  # noqa: F401
from . import swin as _swin  # noqa: F401
from . import video as _video  # noqa: F401
from . import video_swin as _video_swin  # noqa: F401
from . import convnext as _convnext  # noqa: F401
from . import densenet as _densenet  # noqa: F401
from . import efficientnet as _efficientnet  # noqa: F401
from . import mobilenet as _mobilenet  # noqa: F401
from . import resnet as _resnet  # noqa: F401
from . import segmentation as _segmentation  # noqa: F401
from . import squeezenet as _squeezenet  # noqa: F401
from . import vgg as _vgg  # noqa: F401
from . import vision_transformer as _vit  # noqa: F401
from .alexnet import AlexNet, alexnet  # noqa: F401
from .convnext import ConvNeXt, convnext_base, convnext_large, convnext_small, convnext_tiny  # noqa: F401
from .densenet import DenseNet, densenet121, densenet161, densenet169, densenet201  # noqa: F401
from .efficientnet import (  # noqa: F401
    EfficientNet,
    efficientnet_b0,
    efficientnet_b1,
    efficientnet_b2,
    efficientnet_b3,
    efficientnet_b4,
    efficientnet_b5,
    efficientnet_b6,
    efficientnet_b7,
    efficientnet_v2_l,
    efficientnet_v2_m,
    efficientnet_v2_s,
)
from .feature_extraction import create_feature_extractor, extract_features  # noqa: F401
from .mobilenet import MobileNetV2, MobileNetV3, mobilenet_v2, mobilenet_v3_large, mobilenet_v3_small  # noqa: F401
from .resnet import (  # noqa: F401
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnext50_32x4d,
    resnext101_32x8d,
    resnext101_64x4d,
    wide_resnet50_2,
    wide_resnet101_2,
)
from .segmentation import (  # noqa: F401
    DeepLabV3,
    FCN,
    LRASPP,
    deeplabv3_resnet50,
    deeplabv3_resnet101,
    fcn_resnet50,
    fcn_resnet101,
    lraspp_mobilenet_v3_large,
)
from .squeezenet import SqueezeNet, squeezenet1_0, squeezenet1_1  # noqa: F401
from .vgg import VGG, vgg11, vgg11_bn, vgg13, vgg13_bn, vgg16, vgg16_bn, vgg19, vgg19_bn  # noqa: F401
from .vision_transformer import (  # noqa: F401
    VisionTransformer,
    vit_b_16,
    vit_b_32,
    vit_h_14,
    vit_l_16,
    vit_l_32,
)
from . import weights_meta as _weights_meta  # noqa: F401  (attaches variant enums)
from . import _weights_registry  # noqa: F401  (generated enums for every family)


def _export_public_surface():
    """Make every registered builder and every ``*_Weights`` enum an
    attribute of this module (reference layout: ``torchvision.models.
    maskrcnn_resnet50_fpn``, ``torchvision.models.ResNet50_Weights`` are
    importable names, with task models also under their submodule)."""
    import sys

    g = globals()
    from ._api import _MODEL_REGISTRY, WeightsEnum

    for name, builder in _MODEL_REGISTRY.items():
        g.setdefault(name, builder)
    for modname, mod in list(sys.modules.items()):
        if not modname.startswith(__name__):
            continue
        for attr, val in list(vars(mod).items()):
            if (isinstance(val, type) and issubclass(val, WeightsEnum)
                    and val is not WeightsEnum and attr.endswith("_Weights")):
                g.setdefault(attr, val)


_export_public_surface()

"""Transforms: typed functional API + class transforms (v2-style).

Counterpart of the reference's ``torchvision.transforms`` /
``torchvision.transforms.v2``: the class API pytree-walks arbitrary
(image, boxes, masks) structures, dispatching per-type kernels registered in
``cpu_vision_tpu.transforms.functional``.
"""

from . import functional  # noqa: F401
from ._augment import CutMix, MixUp, RandomErasing  # noqa: F401
from ._auto_augment import AugMix, AutoAugment, RandAugment, TrivialAugmentWide  # noqa: F401
from ._color import (  # noqa: F401
    ColorJitter,
    GaussianBlur,
    GaussianNoise,
    Grayscale,
    RandomAdjustSharpness,
    RandomAutocontrast,
    RandomChannelPermutation,
    RandomEqualize,
    RandomGrayscale,
    RandomInvert,
    RandomPhotometricDistort,
    RandomPosterize,
    RandomSolarize,
    RGB,
)
from ._detection_aug import JPEG, RandomIoUCrop  # noqa: F401
from ._container import Compose, RandomApply, RandomChoice, RandomOrder, RandomTransforms  # noqa: F401
from ._geometry import (  # noqa: F401
    CenterCrop,
    ElasticTransform,
    FiveCrop,
    Pad,
    RandomAffine,
    RandomCrop,
    RandomHorizontalFlip,
    RandomPerspective,
    RandomResize,
    RandomResizedCrop,
    RandomRotation,
    RandomShortestSize,
    RandomVerticalFlip,
    RandomZoomOut,
    Resize,
    ScaleJitter,
    TenCrop,
)
from ._misc import (  # noqa: F401
    ClampBoundingBoxes,
    ConvertBoundingBoxFormat,
    ConvertImageDtype,
    Identity,
    Lambda,
    LinearTransformation,
    Normalize,
    PILToTensor,
    SanitizeBoundingBoxes,
    ToDtype,
    ToImage,
    ToPILImage,
    ToPureArray,
    ToPureTensor,
    ToTensor,
    UniformTemporalSubsample,
)
from ._registry import register_kernel  # noqa: F401
from ._transform import Transform  # noqa: F401


class InterpolationMode:
    """Interpolation names (reference ``transforms/functional.py:
    InterpolationMode`` enum); resize/warp accept these strings directly."""

    NEAREST = "nearest"
    NEAREST_EXACT = "nearest_exact"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"
    BOX = "box"
    HAMMING = "hamming"
    LANCZOS = "lanczos"

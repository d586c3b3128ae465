"""Per-weight variant metadata for families with multiple recipes — V1/V2
and the SWAG end-to-end / linear-probe variants (reference
``models/vision_transformer.py:344-616`` and ``models/regnet.py:
RegNet_Y_{16,32,128}GF_Weights``). Each variant carries its own eval preset
(crop/resize/interpolation) exactly as the reference's ``Weights.transforms``
partial does; checkpoints are named after the reference ``.pth`` files and
load from the local weights cache after conversion via
``models.torch_weights``."""

from __future__ import annotations

from ._api import Weights, WeightsEnum
from . import regnet as _regnet
from . import vision_transformer as _vit


def _eval(crop, resize=None, interpolation="bilinear"):
    def factory():
        from ..train.presets import ImageClassificationEval

        return ImageClassificationEval(crop, resize if resize is not None else 256,
                                       interpolation=interpolation)

    return factory


_SWAG_META = {"recipe": "https://github.com/facebookresearch/SWAG",
              "license": "https://github.com/facebookresearch/SWAG/blob/main/LICENSE"}


def _w(ckpt, crop, resize, interp, num_params, acc1, acc5, **extra_meta):
    return Weights(
        url=ckpt,
        transforms=_eval(crop, resize, interp),
        meta={"num_params": num_params,
              "_metrics": {"ImageNet-1K": {"acc@1": acc1, "acc@5": acc5}},
              **extra_meta},
    )


class ViT_B_16_Weights(WeightsEnum):
    """(reference ``vision_transformer.py:350-427``)."""

    IMAGENET1K_V1 = _w("vit_b_16-c867db91.ckpt", 224, 256, "bilinear",
                       86_567_656, 81.072, 95.318)
    IMAGENET1K_SWAG_E2E_V1 = _w("vit_b_16_swag-9ac1b537.ckpt", 384, 384,
                                "bicubic", 86_859_496, 85.304, 97.650, **_SWAG_META)
    IMAGENET1K_SWAG_LINEAR_V1 = _w("vit_b_16_lc_swag-4e70ced5.ckpt", 224, 224,
                                   "bicubic", 86_567_656, 81.886, 96.180, **_SWAG_META)
    DEFAULT = IMAGENET1K_V1


class ViT_B_32_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("vit_b_32-d86f8d99.ckpt", 224, 256, "bilinear",
                       88_224_232, 75.912, 92.466)
    DEFAULT = IMAGENET1K_V1


class ViT_L_16_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("vit_l_16-852ce7e3.ckpt", 224, 242, "bilinear",
                       304_326_632, 79.662, 94.638)
    IMAGENET1K_SWAG_E2E_V1 = _w("vit_l_16_swag-4f3808c9.ckpt", 512, 512,
                                "bicubic", 305_174_504, 88.064, 98.512, **_SWAG_META)
    IMAGENET1K_SWAG_LINEAR_V1 = _w("vit_l_16_lc_swag-4d563306.ckpt", 224, 224,
                                   "bicubic", 304_326_632, 85.146, 97.422, **_SWAG_META)
    DEFAULT = IMAGENET1K_V1


class ViT_L_32_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("vit_l_32-c7638314.ckpt", 224, 256, "bilinear",
                       306_535_400, 76.972, 93.07)
    DEFAULT = IMAGENET1K_V1


class ViT_H_14_Weights(WeightsEnum):
    IMAGENET1K_SWAG_E2E_V1 = _w("vit_h_14_swag-80465313.ckpt", 518, 518,
                                "bicubic", 633_470_440, 88.552, 98.694, **_SWAG_META)
    IMAGENET1K_SWAG_LINEAR_V1 = _w("vit_h_14_lc_swag-c1eb923e.ckpt", 224, 224,
                                   "bicubic", 632_045_800, 85.708, 97.730, **_SWAG_META)
    DEFAULT = IMAGENET1K_SWAG_E2E_V1


class RegNet_Y_16GF_Weights(WeightsEnum):
    """(reference ``regnet.py:RegNet_Y_16GF_Weights``)."""

    IMAGENET1K_V1 = _w("regnet_y_16gf-9e6ed7dd.ckpt", 224, 256, "bilinear",
                       83_590_140, 80.424, 95.240)
    IMAGENET1K_V2 = _w("regnet_y_16gf-3e4a00f9.ckpt", 224, 232, "bilinear",
                       83_590_140, 82.886, 96.328)
    IMAGENET1K_SWAG_E2E_V1 = _w("regnet_y_16gf_swag-43afe44d.ckpt", 384, 384,
                                "bicubic", 83_590_140, 86.012, 98.054, **_SWAG_META)
    IMAGENET1K_SWAG_LINEAR_V1 = _w("regnet_y_16gf_lc_swag-f3ec0043.ckpt", 224,
                                   224, "bicubic", 83_590_140, 83.976, 97.244,
                                   **_SWAG_META)
    DEFAULT = IMAGENET1K_V2


class RegNet_Y_32GF_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w("regnet_y_32gf-4dee3f7a.ckpt", 224, 256, "bilinear",
                       145_046_770, 80.878, 95.340)
    IMAGENET1K_V2 = _w("regnet_y_32gf-8db6d4b5.ckpt", 224, 232, "bilinear",
                       145_046_770, 83.368, 96.498)
    IMAGENET1K_SWAG_E2E_V1 = _w("regnet_y_32gf_swag-04fdfa75.ckpt", 384, 384,
                                "bicubic", 145_046_770, 86.838, 98.362, **_SWAG_META)
    IMAGENET1K_SWAG_LINEAR_V1 = _w("regnet_y_32gf_lc_swag-e1583746.ckpt", 224,
                                   224, "bicubic", 145_046_770, 84.622, 97.480,
                                   **_SWAG_META)
    DEFAULT = IMAGENET1K_V2


class RegNet_Y_128GF_Weights(WeightsEnum):
    IMAGENET1K_SWAG_E2E_V1 = _w("regnet_y_128gf_swag-c8ce3e52.ckpt", 384, 384,
                                "bicubic", 644_812_894, 88.228, 98.682, **_SWAG_META)
    IMAGENET1K_SWAG_LINEAR_V1 = _w("regnet_y_128gf_lc_swag-cbe8ce12.ckpt", 224,
                                   224, "bicubic", 644_812_894, 86.068, 97.844,
                                   **_SWAG_META)
    DEFAULT = IMAGENET1K_SWAG_E2E_V1


_vit.vit_b_16.weights_enum = ViT_B_16_Weights
_vit.vit_b_32.weights_enum = ViT_B_32_Weights
_vit.vit_l_16.weights_enum = ViT_L_16_Weights
_vit.vit_l_32.weights_enum = ViT_L_32_Weights
_vit.vit_h_14.weights_enum = ViT_H_14_Weights
_regnet.regnet_y_16gf.weights_enum = RegNet_Y_16GF_Weights
_regnet.regnet_y_32gf.weights_enum = RegNet_Y_32GF_Weights
_regnet.regnet_y_128gf.weights_enum = RegNet_Y_128GF_Weights

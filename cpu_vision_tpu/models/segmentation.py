"""Semantic segmentation: FCN, DeepLabV3, LR-ASPP.

Reference: ``torchvision/models/segmentation/{fcn,deeplabv3,lraspp}.py`` —
heads over a dilated ResNet / MobileNetV3 backbone via intermediate feature
taps; logits upsampled bilinearly to the input size.

ResNet backbones are built with ``replace_stride_with_dilation=(False, True,
True)`` like the reference, so heads see output-stride-8 features.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model
from .resnet import ResNet, BasicBlock, Bottleneck

__all__ = [
    "FCN",
    "DeepLabV3",
    "LRASPP",
    "fcn_resnet50",
    "fcn_resnet101",
    "deeplabv3_resnet50",
    "deeplabv3_resnet101",
    "deeplabv3_mobilenet_v3_large",
    "lraspp_mobilenet_v3_large",
]


def _upsample(x, size):
    from ..ops import resize

    return resize(x, size, "bilinear", antialias=False)


class FCNHead(nn.Module):
    """(reference ``segmentation/fcn.py:FCNHead``)."""

    channels: int
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.1, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference ``deeplabv3.py:ASPP``)."""

    out_channels: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cba(y, kernel, dilation=1):
            pad = ((kernel - 1) // 2) * dilation
            y = nn.Conv(self.out_channels, (kernel, kernel),
                        padding=[(pad, pad), (pad, pad)],
                        kernel_dilation=(dilation, dilation),
                        use_bias=False, dtype=self.dtype)(y)
            y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
            return nn.relu(y)

        branches = [cba(x, 1)]
        for r in self.rates:
            branches.append(cba(x, 3, r))
        # image pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(g)
        g = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(g)
        g = nn.relu(g)
        g = jnp.broadcast_to(g, x.shape[:3] + (self.out_channels,))
        branches.append(g)
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        return nn.Dropout(0.5, deterministic=not train)(y)


class FCN(nn.Module):
    """(reference ``segmentation/fcn.py``): backbone -> FCNHead (+aux)."""

    backbone: nn.Module
    num_classes: int
    aux: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = (x.shape[1], x.shape[2])
        feats = self.backbone(x, train=train, features_only=True)
        # hidden width = in_channels // 4 (reference FCNHead, fcn.py:35)
        out = FCNHead(feats["layer4"].shape[-1] // 4, self.num_classes,
                      dtype=self.dtype)(feats["layer4"], train)
        result = {"out": _upsample(out, size)}
        if self.aux:
            aux = FCNHead(feats["layer3"].shape[-1] // 4, self.num_classes,
                          dtype=self.dtype)(feats["layer3"], train)
            result["aux"] = _upsample(aux, size)
        return result


class DeepLabV3(nn.Module):
    """(reference ``segmentation/deeplabv3.py``): backbone -> ASPP -> head."""

    backbone: nn.Module
    num_classes: int
    aux: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        size = (x.shape[1], x.shape[2])
        feats = self.backbone(x, train=train, features_only=True)
        y = ASPP(dtype=self.dtype)(feats["layer4"], train)
        y = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(y)
        result = {"out": _upsample(y, size)}
        if self.aux:
            aux = FCNHead(feats["layer3"].shape[-1] // 4, self.num_classes,
                          dtype=self.dtype)(feats["layer3"], train)
            result["aux"] = _upsample(aux, size)
        return result


class MobileNetV3Backbone(nn.Module):
    """Dilated MobileNetV3-Large feature extractor for segmentation heads
    (reference ``_deeplabv3_mobilenetv3``, ``segmentation/deeplabv3.py:
    204-224``): 'layer4' = the final 960-ch conv at output stride 16
    (C5, dilated), 'layer3' = the reference's aux tap (stage_indices[-4])."""

    dilated: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = True):
        from .mobilenet import _V3_LARGE, ConvNormActivation, V3Block, hardswish

        y = ConvNormActivation(16, 3, 2, activation=hardswish, eps=1e-3, dtype=self.dtype)(x, train)
        aux = None
        # dilation 2 replaces stride in the last stage when dilated
        # (reference _mobilenet_v3_conf dilation arg, mobilenetv3.py:227-248)
        for i, (k, exp, out_c, se, hs, s) in enumerate(_V3_LARGE):
            dil = 2 if (self.dilated and i >= 12) else 1
            y = V3Block(out_c, k, exp, se, hs, s, dilation=dil, dtype=self.dtype)(y, train)
            if i == 3:  # features index 4 = reference aux_pos (stage_indices[-4])
                aux = y
        out = ConvNormActivation(6 * y.shape[-1], 1, activation=hardswish,
                                 eps=1e-3, dtype=self.dtype)(y, train)
        return {"layer3": aux, "layer4": out}


class LRASPP(nn.Module):
    """Lite R-ASPP over MobileNetV3 features (reference
    ``segmentation/lraspp.py:LRASPP``)."""

    num_classes: int
    inter_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .mobilenet import _V3_LARGE, V3Block, ConvNormActivation, hardswish

        size = (x.shape[1], x.shape[2])
        y = ConvNormActivation(16, 3, 2, activation=hardswish, eps=1e-3, dtype=self.dtype)(x, train)
        low = high = y
        for i, (k, exp, out_c, se, hs, s) in enumerate(_V3_LARGE):
            y = V3Block(out_c, k, exp, se, hs, s, dtype=self.dtype)(y, train)
            if i == 3:  # C2-level low features (stride 8)
                low = y
        high = ConvNormActivation(6 * y.shape[-1], 1, activation=hardswish, eps=1e-3, dtype=self.dtype)(y, train)

        h = nn.Conv(self.inter_channels, (1, 1), use_bias=False, dtype=self.dtype)(high)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        h = nn.relu(h)
        s = jnp.mean(high, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.inter_channels, (1, 1), use_bias=False, dtype=self.dtype)(s)
        s = nn.sigmoid(s)
        h = h * s
        h = _upsample(h, (low.shape[1], low.shape[2]))
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(h) + nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype)(low)
        return {"out": _upsample(out, size)}


@register_model("fcn_resnet50")
def fcn_resnet50(*, num_classes: int = 21, aux_loss: bool = False, dtype=jnp.float32):
    return FCN(ResNet(Bottleneck, (3, 4, 6, 3), replace_stride_with_dilation=(False, True, True), dtype=dtype), num_classes, aux_loss, dtype)


@register_model("fcn_resnet101")
def fcn_resnet101(*, num_classes: int = 21, aux_loss: bool = False, dtype=jnp.float32):
    return FCN(ResNet(Bottleneck, (3, 4, 23, 3), replace_stride_with_dilation=(False, True, True), dtype=dtype), num_classes, aux_loss, dtype)


@register_model("deeplabv3_resnet50")
def deeplabv3_resnet50(*, num_classes: int = 21, aux_loss: bool = False, dtype=jnp.float32):
    return DeepLabV3(ResNet(Bottleneck, (3, 4, 6, 3), replace_stride_with_dilation=(False, True, True), dtype=dtype), num_classes, aux_loss, dtype)


@register_model("deeplabv3_resnet101")
def deeplabv3_resnet101(*, num_classes: int = 21, aux_loss: bool = False, dtype=jnp.float32):
    return DeepLabV3(ResNet(Bottleneck, (3, 4, 23, 3), replace_stride_with_dilation=(False, True, True), dtype=dtype), num_classes, aux_loss, dtype)


@register_model("deeplabv3_mobilenet_v3_large")
def deeplabv3_mobilenet_v3_large(*, num_classes: int = 21, aux_loss: bool = False,
                                 dtype=jnp.float32):
    """(reference ``deeplabv3_mobilenet_v3_large``, ``deeplabv3.py:358-390``)."""
    return DeepLabV3(MobileNetV3Backbone(dilated=True, dtype=dtype),
                     num_classes, aux_loss, dtype)


@register_model("lraspp_mobilenet_v3_large")
def lraspp_mobilenet_v3_large(*, num_classes: int = 21, dtype=jnp.float32):
    return LRASPP(num_classes, dtype=dtype)

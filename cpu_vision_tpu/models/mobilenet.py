"""MobileNetV2 + MobileNetV3 (reference ``torchvision/models/mobilenetv2.py``
and ``mobilenetv3.py``): inverted residuals, hard-swish/SE bnecks, the
``_make_divisible`` channel rounding rule."""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model
from .layers import ConvNormActivation

__all__ = ["MobileNetV2", "MobileNetV3", "mobilenet_v2", "mobilenet_v3_large", "mobilenet_v3_small"]


def _make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """Reference ``_make_divisible`` (``models/_utils.py:54``)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return int(new_v)


def hardswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


def hardsigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


class InvertedResidual(nn.Module):
    """MobileNetV2 block (reference ``mobilenetv2.py:InvertedResidual``)."""

    features: int
    strides: int
    expand_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        use_res = self.strides == 1 and inp == self.features
        out = x
        if self.expand_ratio != 1:
            out = ConvNormActivation(hidden, 1, activation=nn.relu6, dtype=self.dtype)(out, train)
        out = ConvNormActivation(hidden, 3, self.strides, groups=hidden,
                                 activation=nn.relu6, dtype=self.dtype)(out, train)
        out = ConvNormActivation(self.features, 1, activation=None, dtype=self.dtype)(out, train)
        return x + out if use_res else out


class MobileNetV2(nn.Module):
    """Reference ``mobilenetv2.py:MobileNetV2`` with the standard
    ``inverted_residual_setting`` table."""

    num_classes: int = 1000
    width_mult: float = 1.0
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # t (expand), c (channels), n (repeats), s (stride)
        setting = [
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
        ]
        input_channel = _make_divisible(32 * self.width_mult)
        last_channel = _make_divisible(1280 * max(1.0, self.width_mult))
        x = ConvNormActivation(input_channel, 3, 2, activation=nn.relu6, dtype=self.dtype)(x, train)
        for t, c, n, s in setting:
            out_c = _make_divisible(c * self.width_mult)
            for i in range(n):
                x = InvertedResidual(out_c, s if i == 0 else 1, t, dtype=self.dtype)(x, train)
        x = ConvNormActivation(last_channel, 1, activation=nn.relu6, dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


class V3Block(nn.Module):
    """MobileNetV3 bneck (reference ``mobilenetv3.py:InvertedResidual``).
    ``dilation > 1`` forces stride 1 (reference ``InvertedResidual.__init__``:
    ``self.stride = 1 if cnf.dilation > 1 else cnf.stride``)."""

    features: int
    kernel: int
    expanded: int
    use_se: bool
    use_hs: bool
    strides: int
    dilation: int = 1
    eps: float = 1e-3  # classification BN eps; detection backbones pass 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, return_expanded: bool = False):
        act = hardswish if self.use_hs else nn.relu
        inp = x.shape[-1]
        strides = 1 if self.dilation > 1 else self.strides
        use_res = strides == 1 and inp == self.features
        out = x
        if self.expanded != inp:
            out = ConvNormActivation(self.expanded, 1, activation=act, eps=self.eps, dtype=self.dtype)(out, train)
        expanded = out  # C4 tap for detection (reference splits the block here)
        out = ConvNormActivation(self.expanded, self.kernel, strides,
                                 groups=self.expanded, dilation=self.dilation,
                                 activation=act, eps=self.eps, dtype=self.dtype)(out, train)
        if self.use_se:
            from .layers import SqueezeExcitation

            out = SqueezeExcitation(_make_divisible(self.expanded // 4),
                                    scale_activation=hardsigmoid, dtype=self.dtype)(out)
        out = ConvNormActivation(self.features, 1, activation=None, eps=self.eps, dtype=self.dtype)(out, train)
        out = x + out if use_res else out
        return (out, expanded) if return_expanded else out


# (kernel, expanded, out, use_se, use_hs, stride) — reference _mobilenet_v3_conf
_V3_LARGE = [
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1),
    (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2),
    (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1),
    (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2),
    (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]
_V3_SMALL = [
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
]


class MobileNetV3(nn.Module):
    config: Sequence[Tuple]
    last_channel: int
    num_classes: int = 1000
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvNormActivation(16, 3, 2, activation=hardswish, eps=1e-3, dtype=self.dtype)(x, train)
        for k, exp, out_c, se, hs, s in self.config:
            x = V3Block(out_c, k, exp, se, hs, s, dtype=self.dtype)(x, train)
        last_conv = 6 * x.shape[-1]
        x = ConvNormActivation(last_conv, 1, activation=hardswish, eps=1e-3, dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.last_channel, dtype=self.dtype)(x)
        x = hardswish(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


@register_model("mobilenet_v2")
def mobilenet_v2(*, num_classes: int = 1000, width_mult: float = 1.0, dtype=jnp.float32):
    return MobileNetV2(num_classes=num_classes, width_mult=width_mult, dtype=dtype)


@register_model("mobilenet_v3_large")
def mobilenet_v3_large(*, num_classes: int = 1000, dtype=jnp.float32):
    return MobileNetV3(_V3_LARGE, 1280, num_classes=num_classes, dtype=dtype)


@register_model("mobilenet_v3_small")
def mobilenet_v3_small(*, num_classes: int = 1000, dtype=jnp.float32):
    return MobileNetV3(_V3_SMALL, 1024, num_classes=num_classes, dtype=dtype)

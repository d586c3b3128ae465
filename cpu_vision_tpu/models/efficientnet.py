"""EfficientNet B0-B7 + V2 S/M/L (reference
``torchvision/models/efficientnet.py``): MBConv with SE + stochastic depth,
FusedMBConv for V2, compound width/depth scaling."""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model
from .layers import ConvNormActivation, SqueezeExcitation, StochasticDepth

__all__ = [
    "EfficientNet",
    "efficientnet_b0", "efficientnet_b1", "efficientnet_b2", "efficientnet_b3",
    "efficientnet_b4", "efficientnet_b5", "efficientnet_b6", "efficientnet_b7",
    "efficientnet_v2_s", "efficientnet_v2_m", "efficientnet_v2_l",
]


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return int(new_v)


def _round_channels(c, width_mult):
    return _make_divisible(c * width_mult)


def _round_repeats(r, depth_mult):
    return int(math.ceil(r * depth_mult))


class MBConv(nn.Module):
    """(reference ``efficientnet.py:MBConv``)."""

    features: int
    kernel: int
    strides: int
    expand_ratio: float
    sd_prob: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        use_res = self.strides == 1 and inp == self.features
        hidden = _make_divisible(inp * self.expand_ratio)
        out = x
        if hidden != inp:
            out = ConvNormActivation(hidden, 1, activation=nn.silu, eps=1e-3, dtype=self.dtype)(out, train)
        out = ConvNormActivation(hidden, self.kernel, self.strides, groups=hidden,
                                 activation=nn.silu, eps=1e-3, dtype=self.dtype)(out, train)
        out = SqueezeExcitation(max(1, inp // 4), activation=nn.silu, dtype=self.dtype)(out)
        out = ConvNormActivation(self.features, 1, activation=None, eps=1e-3, dtype=self.dtype)(out, train)
        if use_res:
            out = StochasticDepth(self.sd_prob, "row")(out, train)
            out = out + x
        return out


class FusedMBConv(nn.Module):
    """(reference ``efficientnet.py:FusedMBConv``, V2)."""

    features: int
    kernel: int
    strides: int
    expand_ratio: float
    sd_prob: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        use_res = self.strides == 1 and inp == self.features
        hidden = _make_divisible(inp * self.expand_ratio)
        if hidden != inp:
            out = ConvNormActivation(hidden, self.kernel, self.strides,
                                     activation=nn.silu, eps=1e-3, dtype=self.dtype)(x, train)
            out = ConvNormActivation(self.features, 1, activation=None, eps=1e-3, dtype=self.dtype)(out, train)
        else:
            out = ConvNormActivation(self.features, self.kernel, self.strides,
                                     activation=nn.silu, eps=1e-3, dtype=self.dtype)(x, train)
        if use_res:
            out = StochasticDepth(self.sd_prob, "row")(out, train)
            out = out + x
        return out


# (block, expand, kernel, stride, channels, layers) base config for B0
_V1_CFG = [
    ("mb", 1, 3, 1, 16, 1),
    ("mb", 6, 3, 2, 24, 2),
    ("mb", 6, 5, 2, 40, 2),
    ("mb", 6, 3, 2, 80, 3),
    ("mb", 6, 5, 1, 112, 3),
    ("mb", 6, 5, 2, 192, 4),
    ("mb", 6, 3, 1, 320, 1),
]
_V2_S = [
    ("fused", 1, 3, 1, 24, 2),
    ("fused", 4, 3, 2, 48, 4),
    ("fused", 4, 3, 2, 64, 4),
    ("mb", 4, 3, 2, 128, 6),
    ("mb", 6, 3, 1, 160, 9),
    ("mb", 6, 3, 2, 256, 15),
]
_V2_M = [
    ("fused", 1, 3, 1, 24, 3),
    ("fused", 4, 3, 2, 48, 5),
    ("fused", 4, 3, 2, 80, 5),
    ("mb", 4, 3, 2, 160, 7),
    ("mb", 6, 3, 1, 176, 14),
    ("mb", 6, 3, 2, 304, 18),
    ("mb", 6, 3, 1, 512, 5),
]
_V2_L = [
    ("fused", 1, 3, 1, 32, 4),
    ("fused", 4, 3, 2, 64, 7),
    ("fused", 4, 3, 2, 96, 7),
    ("mb", 4, 3, 2, 192, 10),
    ("mb", 6, 3, 1, 224, 19),
    ("mb", 6, 3, 2, 384, 25),
    ("mb", 6, 3, 1, 640, 7),
]


class EfficientNet(nn.Module):
    cfg: Sequence[Tuple]
    width_mult: float = 1.0
    depth_mult: float = 1.0
    dropout: float = 0.2
    sd_prob: float = 0.2
    last_channel: Optional[int] = None
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        is_v1 = self.cfg[0][0] == "mb"
        stem_c = _round_channels(32, self.width_mult) if is_v1 else self.cfg[0][4]
        x = ConvNormActivation(stem_c, 3, 2, activation=nn.silu, eps=1e-3, dtype=self.dtype)(x, train)
        total_blocks = sum(_round_repeats(n, self.depth_mult) for *_, n in self.cfg)
        block_id = 0
        for btype, expand, kernel, stride, channels, repeats in self.cfg:
            out_c = _round_channels(channels, self.width_mult)
            reps = _round_repeats(repeats, self.depth_mult)
            for i in range(reps):
                sd = self.sd_prob * block_id / total_blocks
                cls = MBConv if btype == "mb" else FusedMBConv
                x = cls(out_c, kernel, stride if i == 0 else 1, expand, sd, dtype=self.dtype)(x, train)
                block_id += 1
        last = self.last_channel or 4 * x.shape[-1]
        x = ConvNormActivation(last, 1, activation=nn.silu, eps=1e-3, dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def _v1(name, width, depth, dropout):
    def builder(*, num_classes: int = 1000, dtype=jnp.float32):
        return EfficientNet(_V1_CFG, width, depth, dropout,
                            last_channel=_round_channels(1280, width),
                            num_classes=num_classes, dtype=dtype)

    builder.__name__ = name
    return register_model(name)(builder)


def _v2(name, cfg, dropout):
    def builder(*, num_classes: int = 1000, dtype=jnp.float32):
        return EfficientNet(cfg, 1.0, 1.0, dropout, last_channel=1280,
                            num_classes=num_classes, dtype=dtype)

    builder.__name__ = name
    return register_model(name)(builder)


efficientnet_b0 = _v1("efficientnet_b0", 1.0, 1.0, 0.2)
efficientnet_b1 = _v1("efficientnet_b1", 1.0, 1.1, 0.2)
efficientnet_b2 = _v1("efficientnet_b2", 1.1, 1.2, 0.3)
efficientnet_b3 = _v1("efficientnet_b3", 1.2, 1.4, 0.3)
efficientnet_b4 = _v1("efficientnet_b4", 1.4, 1.8, 0.4)
efficientnet_b5 = _v1("efficientnet_b5", 1.6, 2.2, 0.4)
efficientnet_b6 = _v1("efficientnet_b6", 1.8, 2.6, 0.5)
efficientnet_b7 = _v1("efficientnet_b7", 2.0, 3.1, 0.5)
efficientnet_v2_s = _v2("efficientnet_v2_s", _V2_S, 0.2)
efficientnet_v2_m = _v2("efficientnet_v2_m", _V2_M, 0.3)
efficientnet_v2_l = _v2("efficientnet_v2_l", _V2_L, 0.4)

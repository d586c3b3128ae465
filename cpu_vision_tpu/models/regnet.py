"""RegNet X/Y families (reference ``torchvision/models/regnet.py``):
quantised-linear width schedule (``BlockParams.from_init_params``),
bottleneck X-blocks with group conv, Y adds SE."""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model
from .layers import ConvNormActivation, SqueezeExcitation

__all__ = [
    "RegNet",
    "regnet_x_400mf", "regnet_x_800mf", "regnet_x_1_6gf", "regnet_x_3_2gf",
    "regnet_x_8gf", "regnet_x_16gf", "regnet_x_32gf",
    "regnet_y_400mf", "regnet_y_800mf", "regnet_y_1_6gf", "regnet_y_3_2gf",
    "regnet_y_8gf", "regnet_y_16gf", "regnet_y_32gf", "regnet_y_128gf",
]


def _block_params(depth, w_0, w_a, w_m, group_width):
    """Width/depth schedule (reference ``BlockParams.from_init_params``,
    ``regnet.py:120-180``)."""
    widths_cont = np.arange(depth) * w_a + w_0
    ks = np.round(np.log(widths_cont / w_0) / math.log(w_m))
    widths = w_0 * np.power(w_m, ks)
    widths = (np.round(widths / 8) * 8).astype(int)
    stage_widths, stage_depths = np.unique(widths, return_counts=True)
    order = np.argsort(stage_widths)
    stage_widths = stage_widths[order].tolist()
    stage_depths = stage_depths[order].tolist()
    # adjust widths for group compatibility (reference
    # ``_adjust_widths_groups_compatibilty`` + ``_make_divisible``:
    # round to the nearest multiple, bumping up if that loses >10%)
    def make_divisible(v, divisor):
        new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
        if new_v < 0.9 * v:
            new_v += divisor
        return new_v

    gws = [min(group_width, w) for w in stage_widths]
    stage_widths = [make_divisible(w, g) for w, g in zip(stage_widths, gws)]
    return list(zip(stage_widths, stage_depths, gws))


class XBlock(nn.Module):
    features: int
    strides: int
    group_width: int
    se_ratio: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        groups = max(self.features // self.group_width, 1)
        out = ConvNormActivation(self.features, 1, dtype=self.dtype)(x, train)
        out = ConvNormActivation(self.features, 3, self.strides, groups=groups, dtype=self.dtype)(out, train)
        if self.se_ratio > 0:
            out = SqueezeExcitation(max(1, int(x.shape[-1] * self.se_ratio)), dtype=self.dtype)(out)
        out = ConvNormActivation(self.features, 1, activation=None, dtype=self.dtype)(out, train)
        if self.strides != 1 or x.shape[-1] != self.features:
            res = ConvNormActivation(self.features, 1, self.strides, activation=None, dtype=self.dtype)(x, train)
        return nn.relu(out + res)


class RegNet(nn.Module):
    stages: Sequence[Tuple[int, int, int]]  # (width, depth, group_width)
    se_ratio: float = 0.0
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvNormActivation(32, 3, 2, dtype=self.dtype)(x, train)
        for width, depth, gw in self.stages:
            for i in range(depth):
                x = XBlock(width, 2 if i == 0 else 1, gw, self.se_ratio, self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


# (depth, w_0, w_a, w_m, group_width, se_ratio) from the reference builders
# (``regnet.py:1174-1570``)
_CFG = {
    "regnet_x_400mf": (22, 24, 24.48, 2.54, 16, 0.0),
    "regnet_x_800mf": (16, 56, 35.73, 2.28, 16, 0.0),
    "regnet_x_1_6gf": (18, 80, 34.01, 2.25, 24, 0.0),
    "regnet_x_3_2gf": (25, 88, 26.31, 2.25, 48, 0.0),
    "regnet_x_8gf": (23, 80, 49.56, 2.88, 120, 0.0),
    "regnet_x_16gf": (22, 216, 55.59, 2.1, 128, 0.0),
    "regnet_x_32gf": (23, 320, 69.86, 2.0, 168, 0.0),
    "regnet_y_400mf": (16, 48, 27.89, 2.09, 8, 0.25),
    "regnet_y_800mf": (14, 56, 38.84, 2.4, 16, 0.25),
    "regnet_y_1_6gf": (27, 48, 20.71, 2.65, 24, 0.25),
    "regnet_y_3_2gf": (21, 80, 42.63, 2.66, 24, 0.25),
    "regnet_y_8gf": (17, 192, 76.82, 2.19, 56, 0.25),
    "regnet_y_16gf": (18, 200, 106.23, 2.48, 112, 0.25),
    "regnet_y_32gf": (20, 232, 115.89, 2.53, 232, 0.25),
    "regnet_y_128gf": (27, 456, 160.83, 2.52, 264, 0.25),
}


def _make(name):
    depth, w0, wa, wm, gw, se = _CFG[name]

    def builder(*, num_classes: int = 1000, dtype=jnp.float32):
        return RegNet(_block_params(depth, w0, wa, wm, gw), se, num_classes, dtype)

    builder.__name__ = name
    return register_model(name)(builder)


regnet_x_400mf = _make("regnet_x_400mf")
regnet_x_800mf = _make("regnet_x_800mf")
regnet_x_1_6gf = _make("regnet_x_1_6gf")
regnet_x_3_2gf = _make("regnet_x_3_2gf")
regnet_x_8gf = _make("regnet_x_8gf")
regnet_x_16gf = _make("regnet_x_16gf")
regnet_x_32gf = _make("regnet_x_32gf")
regnet_y_400mf = _make("regnet_y_400mf")
regnet_y_800mf = _make("regnet_y_800mf")
regnet_y_1_6gf = _make("regnet_y_1_6gf")
regnet_y_3_2gf = _make("regnet_y_3_2gf")
regnet_y_8gf = _make("regnet_y_8gf")
regnet_y_16gf = _make("regnet_y_16gf")
regnet_y_32gf = _make("regnet_y_32gf")
regnet_y_128gf = _make("regnet_y_128gf")

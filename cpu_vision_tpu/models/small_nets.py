"""MNASNet + ShuffleNetV2 (reference ``torchvision/models/mnasnet.py`` and
``shufflenetv2.py``)."""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model
from .layers import ConvNormActivation

__all__ = [
    "MNASNet", "mnasnet0_5", "mnasnet0_75", "mnasnet1_0", "mnasnet1_3",
    "ShuffleNetV2", "shufflenet_v2_x0_5", "shufflenet_v2_x1_0",
    "shufflenet_v2_x1_5", "shufflenet_v2_x2_0",
]


def _round_to_multiple_of(val: float, divisor: int = 8) -> int:
    """MNASNet channel rounding (reference ``mnasnet.py:_round_to_multiple_of``)."""
    new_val = max(divisor, int(val + divisor / 2) // divisor * divisor)
    return new_val if new_val >= 0.9 * val else new_val + divisor


class _InvertedResidual(nn.Module):
    features: int
    kernel: int
    strides: int
    expansion: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        mid = inp * self.expansion
        res = self.strides == 1 and inp == self.features
        out = ConvNormActivation(mid, 1, dtype=self.dtype)(x, train)
        out = ConvNormActivation(mid, self.kernel, self.strides, groups=mid, dtype=self.dtype)(out, train)
        out = ConvNormActivation(self.features, 1, activation=None, dtype=self.dtype)(out, train)
        return x + out if res else out


class MNASNet(nn.Module):
    """MNASNet-B1 (reference ``mnasnet.py:MNASNet``)."""

    alpha: float = 1.0
    num_classes: int = 1000
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = lambda c: _round_to_multiple_of(c * self.alpha)  # noqa: E731
        # the stem scales with alpha too (reference ``_get_depths``: the
        # 32/16 stem widths are part of the scaled depth list)
        x = ConvNormActivation(d(32), 3, 2, dtype=self.dtype)(x, train)
        x = ConvNormActivation(d(32), 3, groups=d(32), dtype=self.dtype)(x, train)
        x = ConvNormActivation(d(16), 1, activation=None, dtype=self.dtype)(x, train)
        # (expansion, channels, repeats, stride, kernel)
        for t, c, n, s, k in [(3, 24, 3, 2, 3), (3, 40, 3, 2, 5), (6, 80, 3, 2, 5),
                              (6, 96, 2, 1, 3), (6, 192, 4, 2, 5), (6, 320, 1, 1, 3)]:
            out_c = d(c)
            for i in range(n):
                x = _InvertedResidual(out_c, k, s if i == 0 else 1, t, self.dtype)(x, train)
        x = ConvNormActivation(1280, 1, dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def _channel_shuffle(x, groups: int):
    """(reference ``shufflenetv2.py:channel_shuffle``)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)


class _ShuffleUnit(nn.Module):
    features: int
    strides: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        branch = self.features // 2
        if self.strides == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            out2 = ConvNormActivation(branch, 1, dtype=self.dtype)(x2, train)
            out2 = ConvNormActivation(branch, 3, 1, groups=branch, activation=None, dtype=self.dtype)(out2, train)
            out2 = ConvNormActivation(branch, 1, dtype=self.dtype)(out2, train)
            out = jnp.concatenate([x1, out2], axis=-1)
        else:
            left = ConvNormActivation(x.shape[-1], 3, 2, groups=x.shape[-1], activation=None, dtype=self.dtype)(x, train)
            left = ConvNormActivation(branch, 1, dtype=self.dtype)(left, train)
            right = ConvNormActivation(branch, 1, dtype=self.dtype)(x, train)
            right = ConvNormActivation(branch, 3, 2, groups=branch, activation=None, dtype=self.dtype)(right, train)
            right = ConvNormActivation(branch, 1, dtype=self.dtype)(right, train)
            out = jnp.concatenate([left, right], axis=-1)
        return _channel_shuffle(out, 2)


class ShuffleNetV2(nn.Module):
    """(reference ``shufflenetv2.py:ShuffleNetV2``)."""

    stage_out_channels: Sequence[int] = (24, 116, 232, 464, 1024)
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.stage_out_channels
        x = ConvNormActivation(c[0], 3, 2, dtype=self.dtype)(x, train)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), (2, 2))
        for stage, repeats in enumerate((4, 8, 4)):
            out_c = c[stage + 1]
            x = _ShuffleUnit(out_c, 2, self.dtype)(x, train)
            for _ in range(repeats - 1):
                x = _ShuffleUnit(out_c, 1, self.dtype)(x, train)
        x = ConvNormActivation(c[4], 1, dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def _mnas(name, alpha):
    def builder(*, num_classes: int = 1000, dtype=jnp.float32):
        return MNASNet(alpha, num_classes=num_classes, dtype=dtype)

    builder.__name__ = name
    return register_model(name)(builder)


def _shuffle(name, channels):
    def builder(*, num_classes: int = 1000, dtype=jnp.float32):
        return ShuffleNetV2(channels, num_classes=num_classes, dtype=dtype)

    builder.__name__ = name
    return register_model(name)(builder)


mnasnet0_5 = _mnas("mnasnet0_5", 0.5)
mnasnet0_75 = _mnas("mnasnet0_75", 0.75)
mnasnet1_0 = _mnas("mnasnet1_0", 1.0)
mnasnet1_3 = _mnas("mnasnet1_3", 1.3)
shufflenet_v2_x0_5 = _shuffle("shufflenet_v2_x0_5", (24, 48, 96, 192, 1024))
shufflenet_v2_x1_0 = _shuffle("shufflenet_v2_x1_0", (24, 116, 232, 464, 1024))
shufflenet_v2_x1_5 = _shuffle("shufflenet_v2_x1_5", (24, 176, 352, 704, 1024))
shufflenet_v2_x2_0 = _shuffle("shufflenet_v2_x2_0", (24, 244, 488, 976, 2048))

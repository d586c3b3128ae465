"""Video classification models (reference ``torchvision/models/video/resnet.py``
and ``s3d.py``): 3D ResNets (r3d_18, mc3_18, r2plus1d_18) and S3D.

Layout: NTHWC (time before space); 3D convs land on the MXU like 2D ones.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model

__all__ = ["VideoResNet", "r3d_18", "mc3_18", "r2plus1d_18", "S3D", "s3d"]


def _bn(train, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype)


def _conv3d(features, kernel, strides=1, dtype=jnp.float32, name=None):
    k = (kernel,) * 3 if isinstance(kernel, int) else kernel
    s = (strides,) * 3 if isinstance(strides, int) else strides
    pad = [((ki - 1) // 2, (ki - 1) // 2) for ki in k]
    return nn.Conv(features, k, s, padding=pad, use_bias=False, dtype=dtype, name=name)


class Conv2Plus1D(nn.Module):
    """Factored (1,3,3)+(3,1,1) conv (reference ``video/resnet.py:Conv2Plus1D``)."""

    features: int
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        mid = (3 * 3 * 3 * in_c * self.features) // (3 * 3 * in_c + 3 * self.features)
        st, sh, sw = self.strides
        x = nn.Conv(mid, (1, 3, 3), (1, sh, sw), padding=[(0, 0), (1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype)(x)
        x = _bn(train, self.dtype)(x)
        x = nn.relu(x)
        return nn.Conv(self.features, (3, 1, 1), (st, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
                       use_bias=False, dtype=self.dtype)(x)


class VideoBasicBlock(nn.Module):
    features: int
    conv_type: str  # "3d", "2plus1d", or "2d" (for MC3 later stages)
    strides: Tuple[int, int, int] = (1, 1, 1)
    downsample: bool = False
    dtype: Any = jnp.float32

    def _conv(self, x, features, strides, train):
        if self.conv_type == "2plus1d":
            return Conv2Plus1D(features, strides, self.dtype)(x, train)
        if self.conv_type == "2d":
            return nn.Conv(features, (1, 3, 3), (1, strides[1], strides[2]),
                           padding=[(0, 0), (1, 1), (1, 1)], use_bias=False, dtype=self.dtype)(x)
        return _conv3d(features, 3, strides, self.dtype)(x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # 2D (no-temporal) blocks downsample spatially only — reference
        # Conv3DNoTemporal uses stride (1, s, s) (video/resnet.py:Conv3DNoTemporal)
        strides = (1, self.strides[1], self.strides[2]) if self.conv_type == "2d" else self.strides
        identity = x
        out = self._conv(x, self.features, strides, train)
        out = _bn(train, self.dtype)(out)
        out = nn.relu(out)
        out = self._conv(out, self.features, (1, 1, 1), train)
        out = _bn(train, self.dtype)(out)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1, 1), strides, use_bias=False,
                               dtype=self.dtype)(x)
            identity = _bn(train, self.dtype)(identity)
        return nn.relu(out + identity)


class VideoResNet(nn.Module):
    """18-layer 3D ResNet family (reference ``video/resnet.py:VideoResNet``)."""

    conv_types: Sequence[str] = ("3d", "3d", "3d", "3d")
    stem: str = "3d"  # "3d" or "2plus1d"
    num_classes: int = 400
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem (reference BasicStem / R2Plus1dStem)
        if self.stem == "2plus1d":
            x = nn.Conv(45, (1, 7, 7), (1, 2, 2), padding=[(0, 0), (3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype)(x)
            x = _bn(train, self.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(64, (3, 1, 1), (1, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
                        use_bias=False, dtype=self.dtype)(x)
        else:
            x = nn.Conv(64, (3, 7, 7), (1, 2, 2), padding=[(1, 1), (3, 3), (3, 3)],
                        use_bias=False, dtype=self.dtype)(x)
        x = _bn(train, self.dtype)(x)
        x = nn.relu(x)
        widths = (64, 128, 256, 512)
        for i, (width, ctype) in enumerate(zip(widths, self.conv_types)):
            for j in range(2):
                strides = (2, 2, 2) if (i > 0 and j == 0) else (1, 1, 1)
                if ctype == "2d" and strides != (1, 1, 1):
                    strides = (1, 2, 2) if False else strides  # MC3 keeps 3D downsampling in conv path
                downsample = j == 0 and (i > 0 or x.shape[-1] != width)
                x = VideoBasicBlock(width, ctype, strides, downsample, self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2, 3))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


class S3D(nn.Module):
    """Separable 3D CNN (reference ``video/s3d.py``), reduced faithful form:
    separable (1,k,k)+(k,1,1) conv blocks in an Inception-like layout."""

    num_classes: int = 400
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def sep(x, c, strides=(1, 1, 1)):
            x = nn.Conv(c, (1, 3, 3), (1, strides[1], strides[2]),
                        padding=[(0, 0), (1, 1), (1, 1)], use_bias=False, dtype=self.dtype)(x)
            x = _bn(train, self.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(c, (3, 1, 1), (strides[0], 1, 1),
                        padding=[(1, 1), (0, 0), (0, 0)], use_bias=False, dtype=self.dtype)(x)
            x = _bn(train, self.dtype)(x)
            return nn.relu(x)

        x = sep(x, 64, (1, 2, 2))
        x = nn.max_pool(x, (1, 3, 3), (1, 2, 2), padding=[(0, 0), (1, 1), (1, 1)])
        x = nn.relu(_bn(train, self.dtype)(nn.Conv(64, (1, 1, 1), use_bias=False, dtype=self.dtype)(x)))
        x = sep(x, 192)
        x = nn.max_pool(x, (1, 3, 3), (1, 2, 2), padding=[(0, 0), (1, 1), (1, 1)])
        x = sep(x, 256, (2, 2, 2))
        x = sep(x, 480)
        x = nn.max_pool(x, (2, 2, 2), (2, 2, 2))
        x = sep(x, 512)
        x = sep(x, 832, (2, 2, 2))
        x = sep(x, 1024)
        x = jnp.mean(x, axis=(1, 2, 3))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


@register_model("r3d_18")
def r3d_18(*, num_classes: int = 400, dtype=jnp.float32):
    return VideoResNet(("3d",) * 4, "3d", num_classes, dtype)


@register_model("mc3_18")
def mc3_18(*, num_classes: int = 400, dtype=jnp.float32):
    """Mixed-conv: 3D first stage, 2D after (reference ``mc3_18``)."""
    return VideoResNet(("3d", "2d", "2d", "2d"), "3d", num_classes, dtype)


@register_model("r2plus1d_18")
def r2plus1d_18(*, num_classes: int = 400, dtype=jnp.float32):
    return VideoResNet(("2plus1d",) * 4, "2plus1d", num_classes, dtype)


@register_model("s3d")
def s3d(*, num_classes: int = 400, dtype=jnp.float32):
    return S3D(num_classes, dtype)

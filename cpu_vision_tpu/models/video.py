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


def _bn(train, dtype, eps=1e-5):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=eps, dtype=dtype)


def _conv3d(features, kernel, strides=1, dtype=jnp.float32, name=None):
    k = (kernel,) * 3 if isinstance(kernel, int) else kernel
    s = (strides,) * 3 if isinstance(strides, int) else strides
    pad = [((ki - 1) // 2, (ki - 1) // 2) for ki in k]
    return nn.Conv(features, k, s, padding=pad, use_bias=False, dtype=dtype, name=name)


class Conv2Plus1D(nn.Module):
    """Factored (1,3,3)+(3,1,1) conv (reference ``video/resnet.py:Conv2Plus1D``).

    ``midplanes`` is computed ONCE per block from the BLOCK's (in, out)
    channels and shared by both convs (reference ``BasicBlock.__init__``,
    ``video/resnet.py:98``) — not recomputed per conv."""

    features: int
    midplanes: Optional[int] = None
    strides: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        mid = self.midplanes
        if mid is None:
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

    def _conv(self, x, features, strides, train, midplanes=None):
        if self.conv_type == "2plus1d":
            return Conv2Plus1D(features, midplanes, strides, self.dtype)(x, train)
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
        # block-level midplanes shared by both convs (reference resnet.py:98)
        inp, p = x.shape[-1], self.features
        mid = (inp * p * 3 * 3 * 3) // (inp * 3 * 3 + 3 * p)
        out = self._conv(x, self.features, strides, train, mid)
        out = _bn(train, self.dtype)(out)
        out = nn.relu(out)
        out = self._conv(out, self.features, (1, 1, 1), train, mid)
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
    """Separable 3D CNN (reference ``video/s3d.py:S3D``): the exact
    GoogLeNet-style layout — temporal-separable convs in the stem and in
    the two 3x3 branches of every SepInceptionBlock3D."""

    num_classes: int = 400
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cna(x, c, k=(1, 1, 1), s=(1, 1, 1), p=None):
            if p is None:
                p = [((ki - 1) // 2,) * 2 for ki in k]
            x = nn.Conv(c, k, s, padding=p, use_bias=False, dtype=self.dtype)(x)
            # reference s3d.py:114: BatchNorm3d(eps=0.001)
            x = _bn(train, self.dtype, eps=1e-3)(x)
            return nn.relu(x)

        def sep(x, c, k=3, s=1):
            # reference TemporalSeparableConv (s3d.py:22-50)
            x = cna(x, c, (1, k, k), (1, s, s))
            return cna(x, c, (k, 1, 1), (s, 1, 1))

        def inception(x, b0, b1m, b1, b2m, b2, b3):
            # reference SepInceptionBlock3D (s3d.py:53-90)
            x0 = cna(x, b0)
            x1 = sep(cna(x, b1m), b1)
            x2 = sep(cna(x, b2m), b2)
            x3 = nn.max_pool(x, (3, 3, 3), (1, 1, 1),
                             padding=[(1, 1)] * 3)
            x3 = cna(x3, b3)
            return jnp.concatenate([x0, x1, x2, x3], axis=-1)

        mp = lambda x, k, s, p: nn.max_pool(x, k, s, padding=p)  # noqa: E731
        x = sep(x, 64, 7, 2)
        x = mp(x, (1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)])
        x = cna(x, 64)
        x = sep(x, 192)
        x = mp(x, (1, 3, 3), (1, 2, 2), [(0, 0), (1, 1), (1, 1)])
        x = inception(x, 64, 96, 128, 16, 32, 32)
        x = inception(x, 128, 128, 192, 32, 96, 64)
        x = mp(x, (3, 3, 3), (2, 2, 2), [(1, 1)] * 3)
        x = inception(x, 192, 96, 208, 16, 48, 64)
        x = inception(x, 160, 112, 224, 24, 64, 64)
        x = inception(x, 128, 128, 256, 24, 64, 64)
        x = inception(x, 112, 144, 288, 32, 64, 64)
        x = inception(x, 256, 160, 320, 32, 128, 128)
        x = mp(x, (2, 2, 2), (2, 2, 2), [(0, 0)] * 3)
        x = inception(x, 256, 160, 320, 32, 128, 128)
        x = inception(x, 384, 192, 384, 48, 128, 128)
        # reference S3D.forward: AvgPool3d((2,7,7), stride=1) -> dropout ->
        # 1x1x1 conv classifier -> mean over (T,H,W).  The stride-1 window
        # weights interior frames more than a plain global mean — keep the
        # sliding pool (kernel clamped for tiny test inputs).
        kt, kh, kw = min(2, x.shape[1]), min(7, x.shape[2]), min(7, x.shape[3])
        x = nn.avg_pool(x, (kt, kh, kw), (1, 1, 1))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        n, t, h, w, c = x.shape
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(x.reshape(n, t * h, w, c))
        return jnp.mean(x, axis=(1, 2))


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

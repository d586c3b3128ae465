"""Module-form ops (reference ``torchvision/ops/__init__.py`` class
exports): thin class wrappers over the functional tier plus re-exports of
the shared building blocks, so users of the reference's
``ops.RoIAlign``-style API find the same names here.

The reference splits these across ``ops/{roi_align,roi_pool,ps_roi_align,
ps_roi_pool,deform_conv,drop_block,misc}.py``; here each wrapper simply
binds configuration and forwards to the corresponding function in
``ops/{roi,deform,regularizers}.py``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.detection.backbone_utils import FeaturePyramidNetwork  # noqa: F401
from ..models.layers import (  # noqa: F401
    Conv2dNormActivation,
    ConvNormActivation,
    FrozenBatchNorm,
    MLP,
    Permute,
    SqueezeExcitation,
    StochasticDepth,
)
from .deform import deform_conv2d
from .regularizers import drop_block2d, drop_block3d
from .roi import ps_roi_align, ps_roi_pool, roi_align, roi_pool

__all__ = [
    "RoIAlign",
    "RoIPool",
    "PSRoIAlign",
    "PSRoIPool",
    "DeformConv2d",
    "DropBlock2d",
    "DropBlock3d",
    "Conv2dNormActivation",
    "Conv3dNormActivation",
    "ConvNormActivation",
    "FeaturePyramidNetwork",
    "FrozenBatchNorm",
    "FrozenBatchNorm2d",
    "MLP",
    "Permute",
    "SqueezeExcitation",
    "StochasticDepth",
]

FrozenBatchNorm2d = FrozenBatchNorm  # reference name (``ops/misc.py:13``)


class RoIAlign:
    """(reference ``RoIAlign``, ``ops/roi_align.py:236``)."""

    def __init__(self, output_size: Union[int, Sequence[int]],
                 spatial_scale: float, sampling_ratio: int,
                 aligned: bool = False):
        self.output_size = output_size
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio
        self.aligned = aligned

    def __call__(self, features: jax.Array, rois: jax.Array) -> jax.Array:
        return roi_align(features, rois, self.output_size, self.spatial_scale,
                         self.sampling_ratio, self.aligned)


class RoIPool:
    """(reference ``RoIPool``, ``ops/roi_pool.py:72``)."""

    def __init__(self, output_size: Union[int, Sequence[int]],
                 spatial_scale: float):
        self.output_size = output_size
        self.spatial_scale = spatial_scale

    def __call__(self, features: jax.Array, rois: jax.Array) -> jax.Array:
        return roi_pool(features, rois, self.output_size, self.spatial_scale)


class PSRoIAlign:
    """(reference ``PSRoIAlign``, ``ops/ps_roi_align.py:89``)."""

    def __init__(self, output_size: Union[int, Sequence[int]],
                 spatial_scale: float, sampling_ratio: int):
        self.output_size = output_size
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio

    def __call__(self, features: jax.Array, rois: jax.Array) -> jax.Array:
        return ps_roi_align(features, rois, self.output_size,
                            self.spatial_scale, self.sampling_ratio)


class PSRoIPool:
    """(reference ``PSRoIPool``, ``ops/ps_roi_pool.py:70``)."""

    def __init__(self, output_size: Union[int, Sequence[int]],
                 spatial_scale: float):
        self.output_size = output_size
        self.spatial_scale = spatial_scale

    def __call__(self, features: jax.Array, rois: jax.Array) -> jax.Array:
        return ps_roi_pool(features, rois, self.output_size, self.spatial_scale)


class DropBlock2d:
    """(reference ``DropBlock2d``, ``ops/drop_block.py:105``): config-bound
    wrapper; pass ``training=True`` and a ``key`` to actually drop."""

    def __init__(self, p: float, block_size: int, inplace: bool = False,
                 eps: float = 1e-06):
        self.p = p
        self.block_size = block_size
        self.inplace = inplace
        self.eps = eps

    def __call__(self, x: jax.Array, training: bool = True,
                 key: Optional[jax.Array] = None) -> jax.Array:
        return drop_block2d(x, self.p, self.block_size, self.inplace,
                            self.eps, training, key)


class DropBlock3d(DropBlock2d):
    """(reference ``DropBlock3d``, ``ops/drop_block.py:129``)."""

    def __call__(self, x: jax.Array, training: bool = True,
                 key: Optional[jax.Array] = None) -> jax.Array:
        return drop_block3d(x, self.p, self.block_size, self.inplace,
                            self.eps, training, key)


class DeformConv2d(nn.Module):
    """Deformable conv v2 with learned weight/bias (reference
    ``DeformConv2d``, ``ops/deform_conv.py:121``): the offset (and optional
    mask) tensors are passed to ``__call__`` exactly as in the reference."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, offset: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        pair = lambda v: (v, v) if isinstance(v, int) else tuple(v)  # noqa: E731
        kh, kw = pair(self.kernel_size)
        weight = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), self.dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           self.dtype) if self.use_bias else None)
        return deform_conv2d(x, offset, weight, bias, pair(self.stride),
                             pair(self.padding), pair(self.dilation), mask)


class Conv3dNormActivation(nn.Module):
    """3-D Conv -> Norm -> Activation (reference ``Conv3dNormActivation``,
    ``ops/misc.py:196``); NDHWC layout."""

    features: int
    kernel_size: Union[int, Tuple[int, int, int]] = 3
    strides: Union[int, Tuple[int, int, int]] = 1
    groups: int = 1
    norm: Optional[str] = "batch"
    activation: Optional[Any] = nn.relu
    bias: Optional[bool] = None
    padding: Optional[Union[int, Tuple[int, int, int]]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        triple = lambda v: (v, v, v) if isinstance(v, int) else tuple(v)  # noqa: E731
        k = triple(self.kernel_size)
        if self.padding is None:
            pad = [((ki - 1) // 2,) * 2 for ki in k]
        else:
            p = triple(self.padding)
            pad = [(pi, pi) for pi in p]
        use_bias = self.bias if self.bias is not None else self.norm is None
        x = nn.Conv(self.features, k, strides=triple(self.strides), padding=pad,
                    feature_group_count=self.groups, use_bias=use_bias,
                    dtype=self.dtype)(x)
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        elif self.norm == "layer":
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        elif self.norm is not None:
            raise ValueError(f"unsupported norm {self.norm!r} (batch/layer/None)")
        if self.activation is not None:
            x = self.activation(x)
        return x

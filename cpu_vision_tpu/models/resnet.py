"""ResNet family (NHWC, flax.linen).

Architecture parity with the reference ``torchvision/models/resnet.py``:
``BasicBlock`` (:59), ``Bottleneck`` (:108; stride on the 3x3 — the
"ResNet V1.5" variant), ``ResNet`` (:166-285), ``_resnet`` builder pattern
(:288), builders :318-760 (resnet18/34/50/101/152, resnext50_32x4d,
resnext101_32x8d, resnext101_64x4d, wide_resnet50_2, wide_resnet101_2).

TPU: NHWC convs hit the MXU directly; set ``dtype=jnp.bfloat16`` for bf16
activations with f32 params/statistics.
"""

from __future__ import annotations

from typing import Any, Sequence, Type

import jax.numpy as jnp
from flax import linen as nn

from ._api import Weights, WeightsEnum, register_model

__all__ = [
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet152",
    "resnext50_32x4d",
    "resnext101_32x8d",
    "resnext101_64x4d",
    "wide_resnet50_2",
    "wide_resnet101_2",
]


def _norm(train: bool, dtype, zero_init: bool = False):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        scale_init=nn.initializers.zeros if zero_init else nn.initializers.ones,
    )


class BasicBlock(nn.Module):
    """Two 3x3 convs (reference ``BasicBlock``, ``resnet.py:59-105``)."""

    features: int
    strides: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    zero_init_residual: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                      padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype)(x)
        out = _norm(train, self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, dtype=self.dtype)(out)
        # zero-init the last BN scale so blocks start as identity
        # (reference zero_init_residual, resnet.py:208-216)
        out = _norm(train, self.dtype, zero_init=self.zero_init_residual)(out)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1), (self.strides, self.strides),
                               use_bias=False, dtype=self.dtype)(x)
            identity = _norm(train, self.dtype)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 x4 (reference ``Bottleneck``,
    ``resnet.py:108-163``)."""

    features: int
    strides: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dilation: int = 1
    zero_init_residual: bool = True
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.features * (self.base_width / 64.0)) * self.groups
        identity = x
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype)(x)
        out = _norm(train, self.dtype)(out)
        out = nn.relu(out)
        d = self.dilation
        out = nn.Conv(width, (3, 3), (self.strides, self.strides),
                      padding=[(d, d), (d, d)], kernel_dilation=(d, d),
                      feature_group_count=self.groups,
                      use_bias=False, dtype=self.dtype)(out)
        out = _norm(train, self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype)(out)
        out = _norm(train, self.dtype, zero_init=self.zero_init_residual)(out)
        if self.downsample:
            identity = nn.Conv(self.features * self.expansion, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=self.dtype)(x)
            identity = _norm(train, self.dtype)(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Reference ``ResNet`` (``resnet.py:166-285``): 7x7/2 stem + maxpool,
    4 stages of [64, 128, 256, 512] width, global avgpool, fc."""

    block: Type[nn.Module]
    layers: Sequence[int]
    num_classes: int = 1000
    groups: int = 1
    width_per_group: int = 64
    zero_init_residual: bool = True
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = False):
        feats = {}
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype)(x)
        x = _norm(train, self.dtype)(x)
        x = nn.relu(x)
        # torch maxpool k3 s2 p1
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), (2, 2))
        dilation = 1
        for i, (width, n_blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stage_stride = 2 if i > 0 else 1
            # reference _make_layer: dilate instead of striding when requested;
            # the stage's FIRST block keeps the previous dilation
            # (resnet.py:_make_layer previous_dilation)
            prev_dilation = dilation
            if i > 0 and self.replace_stride_with_dilation[i - 1]:
                dilation *= stage_stride
                stage_stride = 1
            for j in range(n_blocks):
                strides = stage_stride if j == 0 else 1
                expansion = getattr(self.block, "expansion", 1)
                downsample = j == 0 and (strides != 1 or x.shape[-1] != width * expansion)
                block_kwargs = dict(
                    strides=strides,
                    downsample=downsample,
                    groups=self.groups,
                    base_width=self.width_per_group,
                    zero_init_residual=self.zero_init_residual,
                    dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )
                if self.block is Bottleneck:
                    block_kwargs["dilation"] = prev_dilation if j == 0 else dilation
                x = self.block(width, **block_kwargs)(x, train=train)
            feats[f"layer{i + 1}"] = x
        if features_only:
            return feats
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        return x


def _resnet(block, layers, **kwargs) -> ResNet:
    return ResNet(block=block, layers=layers, **kwargs)


def _make_builder(name, block, layers, extra=None):
    extra = extra or {}

    def builder(*, num_classes: int = 1000, dtype=jnp.float32, **kwargs) -> ResNet:
        cfg = dict(extra)
        cfg.update(kwargs)
        return _resnet(block, layers, num_classes=num_classes, dtype=dtype, **cfg)

    builder.__name__ = name
    builder.__doc__ = f"{name} (reference torchvision/models/resnet.py builders :318-760)"
    return register_model(name)(builder)


resnet18 = _make_builder("resnet18", BasicBlock, (2, 2, 2, 2))
resnet34 = _make_builder("resnet34", BasicBlock, (3, 4, 6, 3))
resnet50 = _make_builder("resnet50", Bottleneck, (3, 4, 6, 3))
resnet101 = _make_builder("resnet101", Bottleneck, (3, 4, 23, 3))
resnet152 = _make_builder("resnet152", Bottleneck, (3, 8, 36, 3))
resnext50_32x4d = _make_builder(
    "resnext50_32x4d", Bottleneck, (3, 4, 6, 3), {"groups": 32, "width_per_group": 4}
)
resnext101_32x8d = _make_builder(
    "resnext101_32x8d", Bottleneck, (3, 4, 23, 3), {"groups": 32, "width_per_group": 8}
)
resnext101_64x4d = _make_builder(
    "resnext101_64x4d", Bottleneck, (3, 4, 23, 3), {"groups": 64, "width_per_group": 4}
)
wide_resnet50_2 = _make_builder(
    "wide_resnet50_2", Bottleneck, (3, 4, 6, 3), {"width_per_group": 128}
)
wide_resnet101_2 = _make_builder(
    "wide_resnet101_2", Bottleneck, (3, 4, 23, 3), {"width_per_group": 128}
)


class ResNet18_Weights(WeightsEnum):
    """Weights metadata for resnet18 (reference enum values,
    ``resnet.py:312-330``).  Checkpoints load from the local weights cache
    (no egress); torchvision ``.pth`` files convert via
    ``models.torch_weights.resnet_from_torch``."""

    IMAGENET1K_V1 = Weights(
        url="resnet18-f37072fd.ckpt",
        transforms=lambda: __import__(
            "cpu_vision_tpu.train.presets", fromlist=["ImageClassificationEval"]
        ).ImageClassificationEval(224, 256),
        meta={
            "num_params": 11_689_512,
            "recipe": "https://github.com/pytorch/vision/tree/main/references/classification#resnet",
            "_metrics": {"ImageNet-1K": {"acc@1": 69.758, "acc@5": 89.078}},
        },
    )
    DEFAULT = IMAGENET1K_V1


class ResNet50_Weights(WeightsEnum):
    """(reference ``resnet.py:345-390``)."""

    IMAGENET1K_V1 = Weights(
        url="resnet50-0676ba61.ckpt",
        transforms=lambda: __import__(
            "cpu_vision_tpu.train.presets", fromlist=["ImageClassificationEval"]
        ).ImageClassificationEval(224, 256),
        meta={
            "num_params": 25_557_032,
            "_metrics": {"ImageNet-1K": {"acc@1": 76.130, "acc@5": 92.862}},
        },
    )
    IMAGENET1K_V2 = Weights(
        url="resnet50-11ad3fa6.ckpt",
        transforms=lambda: __import__(
            "cpu_vision_tpu.train.presets", fromlist=["ImageClassificationEval"]
        ).ImageClassificationEval(224, 232),
        meta={
            "num_params": 25_557_032,
            "_metrics": {"ImageNet-1K": {"acc@1": 80.858, "acc@5": 95.434}},
        },
    )
    DEFAULT = IMAGENET1K_V2


resnet18.weights_enum = ResNet18_Weights
resnet50.weights_enum = ResNet50_Weights

"""FPN + backbone-with-FPN (reference ``torchvision/ops/
feature_pyramid_network.py:36-238`` and ``models/detection/backbone_utils.py:13``)."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["FeaturePyramidNetwork", "LastLevelMaxPool", "LastLevelP6P7", "BackboneWithFPN"]


class FeaturePyramidNetwork(nn.Module):
    """Top-down pyramid with lateral 1x1s and output 3x3s (reference
    ``FeaturePyramidNetwork``, ``ops/feature_pyramid_network.py:36``).

    ``norm="batch"`` puts BatchNorm after every conv and drops the conv
    biases (the reference's ``norm_layer=nn.BatchNorm2d`` v2-recipe FPN)."""

    out_channels: int = 256
    norm: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray],
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        use_bias = self.norm is None

        def maybe_norm(x, name):
            if self.norm == "batch":
                x = nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype, name=name)(x)
            return x

        names = sorted(features.keys())  # layer1..layer4 ascending depth
        laterals = [
            maybe_norm(
                nn.Conv(self.out_channels, (1, 1), use_bias=use_bias,
                        dtype=self.dtype, name=f"inner_{n}")(features[n]),
                f"inner_bn_{n}")
            for n in names
        ]
        # top-down: nearest-resize to the target level's size and add
        # (reference F.interpolate(last_inner, size=feat_shape, mode="nearest"))
        results = [None] * len(laterals)
        last = laterals[-1]
        results[-1] = last
        for i in range(len(laterals) - 2, -1, -1):
            target = laterals[i]
            th, tw = target.shape[1], target.shape[2]
            sh, sw = last.shape[1], last.shape[2]
            if (sh, sw) != (th, tw):
                iy = (jnp.arange(th) * sh) // th
                ix = (jnp.arange(tw) * sw) // tw
                up = last[:, iy][:, :, ix]
            else:
                up = last
            last = target + up
            results[i] = last
        outs = {
            n: maybe_norm(
                nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=use_bias, dtype=self.dtype, name=f"layer_{n}")(r),
                f"layer_bn_{n}")
            for n, r in zip(names, results)
        }
        return outs


class LastLevelMaxPool(nn.Module):
    """Extra P-level by stride-2 max pool (reference ``LastLevelMaxPool``,
    ``ops/feature_pyramid_network.py:207``)."""

    def __call__(self, x):
        return nn.max_pool(x, (1, 1), (2, 2))


class LastLevelP6P7(nn.Module):
    """P6/P7 for RetinaNet (reference ``LastLevelP6P7``,
    ``ops/feature_pyramid_network.py:224``)."""

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c5):
        p6 = nn.Conv(self.out_channels, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                     dtype=self.dtype, name="p6")(c5)
        p7 = nn.Conv(self.out_channels, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                     dtype=self.dtype, name="p7")(nn.relu(p6))
        return p6, p7


class BackboneWithFPN(nn.Module):
    """ResNet feature taps + FPN (reference ``BackboneWithFPN``,
    ``detection/backbone_utils.py:13``)."""

    backbone: nn.Module
    out_channels: int = 256
    extra_p6p7: bool = False
    p6p7_source: str = "p5"  # "p5" (retinanet v1 / fcos) | "c5" (retinanet v2)
    extra_pool: bool = False
    fpn_norm: str | None = None  # "batch" = v2-recipe FPN
    returned_layers: Sequence[str] = ("layer2", "layer3", "layer4")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        feats = self.backbone(x, train=train, features_only=True)
        used = {k: feats[k] for k in self.returned_layers}
        fpn = FeaturePyramidNetwork(self.out_channels, norm=self.fpn_norm,
                                    dtype=self.dtype)(used, train)
        outs = [fpn[k] for k in sorted(self.returned_layers)]
        if self.extra_p6p7:
            # reference LastLevelP6P7.use_P5: P5 when in==out channels,
            # else C5 (``ops/feature_pyramid_network.py:224-238``)
            src = outs[-1] if self.p6p7_source == "p5" else feats["layer4"]
            p6, p7 = LastLevelP6P7(self.out_channels, dtype=self.dtype)(src)
            outs += [p6, p7]
        elif self.extra_pool:
            outs.append(LastLevelMaxPool()(outs[-1]))
        return outs

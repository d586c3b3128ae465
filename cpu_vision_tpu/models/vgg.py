"""VGG family (reference ``torchvision/models/vgg.py``): cfgs A/B/D/E
(:95-101), builders vgg11/13/16/19 (+_bn variants)."""

from __future__ import annotations

from typing import Any, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model

__all__ = ["VGG", "vgg11", "vgg11_bn", "vgg13", "vgg13_bn", "vgg16", "vgg16_bn", "vgg19", "vgg19_bn"]

_CFGS = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


class VGG(nn.Module):
    cfg: Sequence[Union[int, str]]
    batch_norm: bool = False
    num_classes: int = 1000
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(x)
                if self.batch_norm:
                    x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                     epsilon=1e-5, dtype=self.dtype)(x)
                x = nn.relu(x)
        # adaptive avg pool to 7x7
        if x.shape[1] != 7 or x.shape[2] != 7:
            from ..ops import resize

            x = resize(x, (7, 7), "bilinear", False)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def _make(name, cfg, bn):
    def builder(*, num_classes: int = 1000, dropout: float = 0.5, dtype=jnp.float32) -> VGG:
        return VGG(cfg=_CFGS[cfg], batch_norm=bn, num_classes=num_classes,
                   dropout=dropout, dtype=dtype)

    builder.__name__ = name
    return register_model(name)(builder)


vgg11 = _make("vgg11", "A", False)
vgg11_bn = _make("vgg11_bn", "A", True)
vgg13 = _make("vgg13", "B", False)
vgg13_bn = _make("vgg13_bn", "B", True)
vgg16 = _make("vgg16", "D", False)
vgg16_bn = _make("vgg16_bn", "D", True)
vgg19 = _make("vgg19", "E", False)
vgg19_bn = _make("vgg19_bn", "E", True)

"""SqueezeNet 1.0/1.1 (reference ``torchvision/models/squeezenet.py``)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model

__all__ = ["SqueezeNet", "squeezenet1_0", "squeezenet1_1"]


class Fire(nn.Module):
    squeeze: int
    expand1x1: int
    expand3x3: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), dtype=self.dtype)(x))
        e1 = nn.relu(nn.Conv(self.expand1x1, (1, 1), dtype=self.dtype)(s))
        e3 = nn.relu(nn.Conv(self.expand3x3, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNet(nn.Module):
    version: str = "1_0"
    num_classes: int = 1000
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def pool(x):
            # torch MaxPool2d(3, 2, ceil_mode=True): pad bottom/right with
            # -inf so the last (partial) window is kept
            h, w = x.shape[1], x.shape[2]
            eh = (-(-(h - 3) // 2)) * 2 + 3 - h
            ew = (-(-(w - 3) // 2)) * 2 + 3 - w
            if eh or ew:
                x = jnp.pad(x, ((0, 0), (0, eh), (0, ew), (0, 0)),
                            constant_values=-jnp.inf)
            return nn.max_pool(x, (3, 3), (2, 2))

        if self.version == "1_0":
            x = nn.relu(nn.Conv(96, (7, 7), (2, 2), padding="VALID", dtype=self.dtype)(x))
            x = pool(x)
            for cfg in [(16, 64, 64), (16, 64, 64), (32, 128, 128)]:
                x = Fire(*cfg, dtype=self.dtype)(x)
            x = pool(x)
            for cfg in [(32, 128, 128), (48, 192, 192), (48, 192, 192), (64, 256, 256)]:
                x = Fire(*cfg, dtype=self.dtype)(x)
            x = pool(x)
            x = Fire(64, 256, 256, dtype=self.dtype)(x)
        else:
            x = nn.relu(nn.Conv(64, (3, 3), (2, 2), padding="VALID", dtype=self.dtype)(x))
            x = pool(x)
            x = Fire(16, 64, 64, dtype=self.dtype)(x)
            x = Fire(16, 64, 64, dtype=self.dtype)(x)
            x = pool(x)
            x = Fire(32, 128, 128, dtype=self.dtype)(x)
            x = Fire(32, 128, 128, dtype=self.dtype)(x)
            x = pool(x)
            for cfg in [(48, 192, 192), (48, 192, 192), (64, 256, 256), (64, 256, 256)]:
                x = Fire(*cfg, dtype=self.dtype)(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(x))
        return jnp.mean(x, axis=(1, 2))


@register_model("squeezenet1_0")
def squeezenet1_0(*, num_classes: int = 1000, dropout: float = 0.5, dtype=jnp.float32):
    return SqueezeNet("1_0", num_classes, dropout, dtype)


@register_model("squeezenet1_1")
def squeezenet1_1(*, num_classes: int = 1000, dropout: float = 0.5, dtype=jnp.float32):
    return SqueezeNet("1_1", num_classes, dropout, dtype)

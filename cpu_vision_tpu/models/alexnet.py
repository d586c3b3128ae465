"""AlexNet (reference ``torchvision/models/alexnet.py:17-46``) — the
conv→ReLU→maxpool→FC shape the north star calls "LeNet-style"."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model

__all__ = ["AlexNet", "alexnet"]


class AlexNet(nn.Module):
    num_classes: int = 1000
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, s, p: nn.Conv(  # noqa: E731
            f, (k, k), (s, s), padding=[(p, p), (p, p)], dtype=self.dtype
        )
        pool = lambda x: nn.max_pool(x, (3, 3), (2, 2))  # noqa: E731
        x = nn.relu(conv(64, 11, 4, 2)(x))
        x = pool(x)
        x = nn.relu(conv(192, 5, 1, 2)(x))
        x = pool(x)
        x = nn.relu(conv(384, 3, 1, 1)(x))
        x = nn.relu(conv(256, 3, 1, 1)(x))
        x = nn.relu(conv(256, 3, 1, 1)(x))
        x = pool(x)
        # adaptive avg pool to 6x6
        if x.shape[1] != 6 or x.shape[2] != 6:
            from ..ops import resize

            x = jnp.mean(x.reshape(x.shape[0], 6, x.shape[1] // 6 if x.shape[1] >= 6 else 1, 6, -1, x.shape[3]), axis=(2, 4)) if x.shape[1] % 6 == 0 else resize(x, (6, 6), "bilinear", False)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype)(x))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


@register_model("alexnet")
def alexnet(*, num_classes: int = 1000, dropout: float = 0.5, dtype=jnp.float32) -> AlexNet:
    return AlexNet(num_classes=num_classes, dropout=dropout, dtype=dtype)

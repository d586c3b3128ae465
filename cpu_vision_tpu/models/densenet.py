"""DenseNet family (reference ``torchvision/models/densenet.py``):
dense blocks of BN-ReLU-1x1 -> BN-ReLU-3x3 layers with concatenation,
transition layers halving channels + 2x avgpool."""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model

__all__ = ["DenseNet", "densenet121", "densenet161", "densenet169", "densenet201"]


def _bn(train, dtype):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype)


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = _bn(train, self.dtype)(x)
        out = nn.relu(out)
        out = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False, dtype=self.dtype)(out)
        out = _bn(train, self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.growth_rate, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                      dtype=self.dtype)(out)
        return jnp.concatenate([x, out], axis=-1)


class DenseNet(nn.Module):
    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.num_init_features, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype)(x)
        x = _bn(train, self.dtype)(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), (2, 2))
        for i, n_layers in enumerate(self.block_config):
            for _ in range(n_layers):
                x = DenseLayer(self.growth_rate, self.bn_size, self.dtype)(x, train=train)
            if i != len(self.block_config) - 1:
                x = _bn(train, self.dtype)(x)
                x = nn.relu(x)
                x = nn.Conv(x.shape[-1] // 2, (1, 1), use_bias=False, dtype=self.dtype)(x)
                x = nn.avg_pool(x, (2, 2), (2, 2))
        x = _bn(train, self.dtype)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def _make(name, growth, cfg, init_feat):
    def builder(*, num_classes: int = 1000, dtype=jnp.float32) -> DenseNet:
        return DenseNet(growth, cfg, init_feat, num_classes=num_classes, dtype=dtype)

    builder.__name__ = name
    return register_model(name)(builder)


densenet121 = _make("densenet121", 32, (6, 12, 24, 16), 64)
densenet161 = _make("densenet161", 48, (6, 12, 36, 24), 96)
densenet169 = _make("densenet169", 32, (6, 12, 32, 32), 64)
densenet201 = _make("densenet201", 32, (6, 12, 48, 32), 64)

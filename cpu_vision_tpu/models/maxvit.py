"""MaxViT (reference ``torchvision/models/maxvit.py``): MBConv + block
(windowed) attention + grid (dilated) attention per stage.

TPU notes: both attention variants are pure reshape/transpose partitions
(no gathers) followed by batched MXU attention.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model
from .layers import SqueezeExcitation, StochasticDepth

__all__ = ["MaxVit", "maxvit_t"]


def _block_partition(x, p: int):
    """(N,H,W,C) -> (N·H/p·W/p, p·p, C) non-overlapping windows."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // p, p, w // p, p, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, p * p, c)


def _block_reverse(windows, p: int, n: int, h: int, w: int):
    x = windows.reshape(n, h // p, w // p, p, p, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h, w, -1)


def _grid_partition(x, g: int):
    """(N,H,W,C) -> (N·g·g ... ) dilated grid windows: cell (h/g, w/g)."""
    n, h, w, c = x.shape
    x = x.reshape(n, g, h // g, g, w // g, c).transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(-1, g * g, c)


def _grid_reverse(windows, g: int, n: int, h: int, w: int):
    x = windows.reshape(n, h // g, w // g, g, g, -1).transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(n, h, w, -1)


def _rel_index(p: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(p), np.arange(p), indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (p - 1)
    return (rel[..., 0] * (2 * p - 1) + rel[..., 1]).astype(np.int32)


class RelativeAttention(nn.Module):
    dim: int
    num_heads: int
    partition: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        head = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype)(x).reshape(b, n, 3, self.num_heads, head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # reference scales k by feat_dim**-0.5 — NOT head_dim (maxvit.py:166)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k * self.dim**-0.5)
        table = self.param(
            "rel_bias", nn.initializers.normal(0.02),
            ((2 * self.partition - 1) ** 2, self.num_heads),
        )
        idx = jnp.asarray(_rel_index(self.partition)).reshape(-1)
        bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        attn = jax.nn.softmax(attn + bias[None], axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype)(out)


class MBConvBlock(nn.Module):
    features: int
    strides: int = 1
    expansion: int = 4
    sd_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = x
        if self.strides == 2:
            res = nn.avg_pool(res, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
            res = nn.Conv(self.features, (1, 1), dtype=self.dtype)(res)
        mid = self.features * self.expansion
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-3, dtype=self.dtype)(x)
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-3, dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(mid, (3, 3), (self.strides, self.strides), padding=[(1, 1), (1, 1)],
                    feature_group_count=mid, use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-3, dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = SqueezeExcitation(self.features // 4, activation=nn.silu, dtype=self.dtype)(y)
        y = nn.Conv(self.features, (1, 1), dtype=self.dtype)(y)
        y = StochasticDepth(self.sd_prob, "row")(y, train)
        return res + y


class MaxVitBlock(nn.Module):
    features: int
    num_heads: int
    partition: int
    strides: int = 1
    sd_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = MBConvBlock(self.features, self.strides, sd_prob=self.sd_prob, dtype=self.dtype)(x, train)
        n, h, w, c = x.shape
        p = min(self.partition, h, w)
        # block attention
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = _block_reverse(
            RelativeAttention(c, self.num_heads, p, self.dtype)(_block_partition(y, p)), p, n, h, w
        )
        x = x + StochasticDepth(self.sd_prob, "row")(y, train)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = nn.Dense(4 * c, dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype)(y)
        x = x + StochasticDepth(self.sd_prob, "row")(y, train)
        # grid attention
        g = min(self.partition, h, w)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = _grid_reverse(
            RelativeAttention(c, self.num_heads, g, self.dtype)(_grid_partition(y, g)), g, n, h, w
        )
        x = x + StochasticDepth(self.sd_prob, "row")(y, train)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        y = nn.Dense(4 * c, dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype)(y)
        return x + StochasticDepth(self.sd_prob, "row")(y, train)


class MaxVit(nn.Module):
    """(reference ``maxvit.py:MaxVit``)."""

    stem_channels: int = 64
    block_channels: Sequence[int] = (64, 128, 256, 512)
    block_layers: Sequence[int] = (2, 2, 5, 2)
    num_heads: int = 32  # head dim 32: heads = dim // 32
    partition: int = 7
    sd_prob: float = 0.2
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.stem_channels, (3, 3), (2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3, dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(self.stem_channels, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype)(x)
        total = sum(self.block_layers)
        bid = 0
        for c, depth in zip(self.block_channels, self.block_layers):
            for i in range(depth):
                sd = self.sd_prob * bid / max(total - 1, 1)
                x = MaxVitBlock(c, max(c // 32, 1), self.partition,
                                strides=2 if i == 0 else 1, sd_prob=sd,
                                dtype=self.dtype)(x, train)
                bid += 1
        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = jnp.tanh(nn.Dense(self.block_channels[-1], dtype=self.dtype)(x))
        # reference classifier head has no bias (maxvit.py classifier[5])
        return nn.Dense(self.num_classes, use_bias=False, dtype=self.dtype)(x)


@register_model("maxvit_t")
def maxvit_t(*, num_classes: int = 1000, dtype=jnp.float32):
    return MaxVit(num_classes=num_classes, dtype=dtype)

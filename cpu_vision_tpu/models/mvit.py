"""MViT — Multiscale Vision Transformer for video (reference
``torchvision/models/video/mvit.py``): space-time patchify, pooled
multi-head attention (stride-conv pooling of Q/K/V), channel expansion
across stages.

Streamlined vs the reference: V2-style residual pooling without the
decomposed relative position embeddings (noted departure).
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model
from .layers import StochasticDepth

__all__ = ["MViT", "mvit_v1_b"]


def _pool_tokens(x, thw, stride, features, dtype, name, module):
    """Pool a token sequence (B, L, C) with a depthwise stride conv over the
    (T, H, W) layout; returns (tokens, new_thw)."""
    t, h, w = thw
    b, l, c = x.shape
    st, sh, sw = stride
    if (st, sh, sw) == (1, 1, 1):
        return x, thw
    y = x.reshape(b, t, h, w, c)
    y = module.conv(features, (3, 3, 3), (st, sh, sw), name=name)(y)
    nt, nh, nw = y.shape[1], y.shape[2], y.shape[3]
    return y.reshape(b, nt * nh * nw, features), (nt, nh, nw)


class PooledAttention(nn.Module):
    """Multiscale attention with conv-pooled Q/K/V (reference
    ``mvit.py:MultiscaleAttention``)."""

    dim_out: int
    num_heads: int
    q_stride: Tuple[int, int, int] = (1, 1, 1)
    kv_stride: Tuple[int, int, int] = (1, 1, 1)
    dtype: Any = jnp.float32

    def conv(self, features, kernel, strides, name):
        pads = [((k - 1) // 2, (k - 1) // 2) for k in kernel]
        return nn.Conv(features, kernel, strides, padding=pads,
                       feature_group_count=features, use_bias=False,
                       dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, thw):
        b, l, c = x.shape
        head = self.dim_out // self.num_heads
        q = nn.Dense(self.dim_out, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.dim_out, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.dim_out, dtype=self.dtype, name="v")(x)
        q, q_thw = _pool_tokens(q, thw, self.q_stride, self.dim_out, self.dtype, "pool_q", self)
        k, _ = _pool_tokens(k, thw, self.kv_stride, self.dim_out, self.dtype, "pool_k", self)
        v, _ = _pool_tokens(v, thw, self.kv_stride, self.dim_out, self.dtype, "pool_v", self)
        lq, lk = q.shape[1], k.shape[1]
        qh = q.reshape(b, lq, self.num_heads, head)
        kh = k.reshape(b, lk, self.num_heads, head)
        vh = v.reshape(b, lk, self.num_heads, head)
        attn = jax.nn.softmax(jnp.einsum("bnhd,bmhd->bhnm", qh * head**-0.5, kh), axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vh).reshape(b, lq, self.dim_out)
        out = out + q  # residual pooling (MViTv2)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out), q_thw


class MViTBlock(nn.Module):
    dim_out: int
    num_heads: int
    q_stride: Tuple[int, int, int] = (1, 1, 1)
    kv_stride: Tuple[int, int, int] = (1, 1, 1)
    mlp_ratio: float = 4.0
    sd_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, thw):
        b, l, c = x.shape
        y = nn.LayerNorm(dtype=self.dtype)(x)
        attn_out, new_thw = PooledAttention(
            self.dim_out, self.num_heads, self.q_stride, self.kv_stride, self.dtype
        )(y, thw)
        # project + pool the residual path to match
        res = x
        if c != self.dim_out:
            res = nn.Dense(self.dim_out, dtype=self.dtype, name="res_proj")(res)
        if self.q_stride != (1, 1, 1):
            t, h, w = thw
            st, sh, sw = self.q_stride
            r = res.reshape(b, t, h, w, self.dim_out)
            r = nn.max_pool(r, (1, 3, 3), (st, sh, sw), padding=[(0, 0), (1, 1), (1, 1)])
            res = r.reshape(b, -1, self.dim_out)
        x = res + StochasticDepth(self.sd_prob, "row")(attn_out, train=False)
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(int(self.dim_out * self.mlp_ratio), dtype=self.dtype)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim_out, dtype=self.dtype)(y)
        return x + y, new_thw


class MViT(nn.Module):
    """MViT-V1-B layout (reference ``mvit.py:mvit_v1_b``): 16 blocks, channel
    doubling + spatial pooling at blocks 1, 3, 14."""

    embed_dim: int = 96
    num_blocks: int = 16
    num_classes: int = 400
    sd_prob: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # space-time patchify: conv (3,7,7) stride (2,4,4)
        x = nn.Conv(self.embed_dim, (3, 7, 7), (2, 4, 4),
                    padding=[(1, 1), (3, 3), (3, 3)], dtype=self.dtype)(x)
        n, t, h, w, c = x.shape
        tokens = x.reshape(n, t * h * w, c)
        thw = (t, h, w)
        # stage transitions (block idx -> dim multiplier), per the reference
        expand_at = {1: 2, 3: 2, 14: 2}
        dim = self.embed_dim
        heads = 1
        for i in range(self.num_blocks):
            q_stride = (1, 1, 1)
            if i in expand_at:
                dim *= expand_at[i]
                heads *= 2
                q_stride = (1, 2, 2)
            kv_stride = (1, 8, 8) if i == 0 else ((1, 4, 4) if i <= 2 else ((1, 2, 2) if i <= 13 else (1, 1, 1)))
            kv_stride = tuple(min(s, d) for s, d in zip(kv_stride, thw))
            q_stride = tuple(min(s, d) for s, d in zip(q_stride, thw))
            sd = self.sd_prob * i / max(self.num_blocks - 1, 1)
            tokens, thw = MViTBlock(dim, heads, q_stride, kv_stride, sd_prob=sd,
                                    dtype=self.dtype, name=f"block{i}")(tokens, thw)
        tokens = nn.LayerNorm(dtype=self.dtype)(tokens)
        pooled = jnp.mean(tokens, axis=1)
        return nn.Dense(self.num_classes, dtype=self.dtype)(pooled)


@register_model("mvit_v1_b")
def mvit_v1_b(*, num_classes: int = 400, dtype=jnp.float32):
    return MViT(num_classes=num_classes, dtype=dtype)

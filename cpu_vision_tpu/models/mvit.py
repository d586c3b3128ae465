"""MViT — Multiscale Vision Transformers for video (reference
``torchvision/models/video/mvit.py``): space-time patchify, class token,
pooled multi-head attention (per-head depthwise stride-conv pooling of
Q/K/V), channel expansion across stages.

Covers both variants:

* ``mvit_v1_b`` — absolute spatio-temporal positional encodings
  (``PositionalEncoding``, reference ``mvit.py:395-421``), no residual
  pooling, projection in the MLP.
* ``mvit_v2_s`` — decomposed relative position embeddings
  (``_add_rel_pos``, reference ``mvit.py:122-180``), residual pooling
  (``_add_shortcut``), projection after attention.

Layout is TPU-native NDHWC: videos enter as ``(B, T, H, W, C)``; pooling
convs run as grouped 3D convs over the channel-last layout.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Sequence, Tuple

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model
from .layers import StochasticDepth

__all__ = ["MViT", "MSBlockConfig", "mvit_v1_b", "mvit_v2_s"]


class MSBlockConfig(NamedTuple):
    """One multiscale block (reference ``mvit.py:MSBlockConfig:27-35``)."""

    num_heads: int
    input_channels: int
    output_channels: int
    kernel_q: Tuple[int, ...]
    kernel_kv: Tuple[int, ...]
    stride_q: Tuple[int, ...]
    stride_kv: Tuple[int, ...]


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= x
    return out


def _rel_dist(q_n: int, k_n: int) -> np.ndarray:
    """Relative-distance index table (reference ``_add_rel_pos`` distance
    math, ``video/mvit.py:138-148``): q/k size mismatch handled by ratio."""
    q_ratio = max(k_n / q_n, 1.0)
    k_ratio = max(q_n / k_n, 1.0)
    dist = (
        np.arange(q_n)[:, None] * q_ratio
        - (np.arange(k_n)[None, :] + (1.0 - k_n)) * k_ratio
    )
    return dist.astype(np.int32)


class _Pool(nn.Module):
    """Per-head token pooling (reference ``mvit.py:Pool:64-105``): split the
    class token off, pool the spatial tokens as a 5D volume, re-attach, then
    LayerNorm over head_dim (conv pooling only)."""

    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    mode: str = "conv"  # "conv" (depthwise, shared across heads) | "max"
    with_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, thw):
        # x: (B, heads, 1 + THW, head_dim)
        b, n_heads, _, hd = x.shape
        t, h, w = thw
        cls_tok, sp = x[:, :, :1], x[:, :, 1:]
        vol = sp.reshape(b * n_heads, t, h, w, hd)
        pads = [(k // 2, k // 2) for k in self.kernel]
        if self.mode == "conv":
            vol = nn.Conv(
                hd, self.kernel, self.stride, padding=pads,
                feature_group_count=hd, use_bias=False,
                dtype=self.dtype, name="pool_conv",
            )(vol)
        else:
            vol = nn.max_pool(vol, self.kernel, self.stride, padding=pads)
        nt, nh, nw = vol.shape[1], vol.shape[2], vol.shape[3]
        sp = vol.reshape(b, n_heads, nt * nh * nw, hd)
        x = jnp.concatenate([cls_tok, sp], axis=2)
        if self.with_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x, (nt, nh, nw)


class MultiscaleAttention(nn.Module):
    """Pooled multi-head attention (reference
    ``mvit.py:MultiscaleAttention:195-321``): fused QKV projection at
    ``output_dim``, per-head depthwise conv pooling of Q/K/V, optional
    decomposed rel-pos bias and residual pooling."""

    input_size: Tuple[int, int, int]
    embed_dim: int
    output_dim: int
    num_heads: int
    kernel_q: Tuple[int, ...]
    kernel_kv: Tuple[int, ...]
    stride_q: Tuple[int, ...]
    stride_kv: Tuple[int, ...]
    residual_pool: bool
    residual_with_cls_embed: bool
    rel_pos_embed: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, thw):
        b, n, _ = x.shape
        head_dim = self.output_dim // self.num_heads
        qkv = nn.Dense(3 * self.output_dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        k_thw = thw
        if _prod(self.kernel_kv) > 1 or _prod(self.stride_kv) > 1:
            k, k_thw = _Pool(tuple(self.kernel_kv), tuple(self.stride_kv),
                             dtype=self.dtype, name="pool_k")(k, thw)
            v, _ = _Pool(tuple(self.kernel_kv), tuple(self.stride_kv),
                         dtype=self.dtype, name="pool_v")(v, thw)
        if _prod(self.kernel_q) > 1 or _prod(self.stride_q) > 1:
            q, thw = _Pool(tuple(self.kernel_q), tuple(self.stride_q),
                           dtype=self.dtype, name="pool_q")(q, thw)

        scaler = 1.0 / math.sqrt(head_dim)
        attn = jnp.einsum("bhnd,bhmd->bhnm", scaler * q, k)

        if self.rel_pos_embed:
            attn = attn + self._rel_pos_bias(q, thw, k_thw, head_dim)

        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        if self.residual_pool:  # _add_shortcut (reference mvit.py:183-188)
            if self.residual_with_cls_embed:
                out = out + q
            else:
                out = jnp.concatenate(
                    [out[:, :, :1], out[:, :, 1:] + q[:, :, 1:]], axis=2)
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.output_dim)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="project")(out), thw

    def _rel_pos_bias(self, q, q_thw, k_thw, head_dim):
        """Decomposed relative position bias over the non-class tokens
        (reference ``_add_rel_pos``, ``mvit.py:122-180``); table sizes per
        ``mvit.py:275-283``."""
        qt, qy, qx = q_thw
        kt, ky, kx = k_thw
        size = max(self.input_size[1:])
        q_size = size // self.stride_q[1] if len(self.stride_q) > 0 else size
        kv_size = size // self.stride_kv[1] if len(self.stride_kv) > 0 else size
        spatial_dim = 2 * max(q_size, kv_size) - 1
        temporal_dim = 2 * self.input_size[0] - 1
        init = nn.initializers.truncated_normal(0.02)
        rel_h = self.param("rel_pos_h", init, (spatial_dim, head_dim))
        rel_w = self.param("rel_pos_w", init, (spatial_dim, head_dim))
        rel_t = self.param("rel_pos_t", init, (temporal_dim, head_dim))
        Rh = rel_h[jnp.asarray(_rel_dist(qy, ky))]  # (qy, ky, head_dim)
        Rw = rel_w[jnp.asarray(_rel_dist(qx, kx))]
        Rt = rel_t[jnp.asarray(_rel_dist(qt, kt))]
        b = q.shape[0]
        r_q = q[:, :, 1:].reshape(b, self.num_heads, qt, qy, qx, head_dim)
        rel_h_q = jnp.einsum("bnthwc,hkc->bnthwk", r_q, Rh)  # (.., ky)
        rel_w_q = jnp.einsum("bnthwc,wkc->bnthwk", r_q, Rw)  # (.., kx)
        rel_t_q = jnp.einsum("bnthwc,tkc->bnthwk", r_q, Rt)  # (.., kt)
        bias = (
            rel_t_q[:, :, :, :, :, :, None, None]
            + rel_h_q[:, :, :, :, :, None, :, None]
            + rel_w_q[:, :, :, :, :, None, None, :]
        ).reshape(b, self.num_heads, qt * qy * qx, kt * ky * kx)
        # class token row/column carry no relative bias (attn[:, :, 1:, 1:])
        return jnp.pad(bias, ((0, 0), (0, 0), (1, 0), (1, 0)))


class MultiscaleBlock(nn.Module):
    """Reference ``mvit.py:MultiscaleBlock:323-393``: pre-norm attention with
    a pooled skip connection, then an MLP expanding to the block's output
    channels; the channel projection sits before or after attention depending
    on ``proj_after_attn``."""

    input_size: Tuple[int, int, int]
    cnf: MSBlockConfig
    residual_pool: bool
    residual_with_cls_embed: bool
    rel_pos_embed: bool
    proj_after_attn: bool
    sd_prob: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, thw, train: bool = False):
        cnf = self.cnf
        attn_dim = cnf.output_channels if self.proj_after_attn else cnf.input_channels
        needs_proj = cnf.input_channels != cnf.output_channels
        sd = StochasticDepth(self.sd_prob, "row")

        x_norm1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x_attn, thw_new = MultiscaleAttention(
            self.input_size, cnf.input_channels, attn_dim, cnf.num_heads,
            kernel_q=tuple(cnf.kernel_q), kernel_kv=tuple(cnf.kernel_kv),
            stride_q=tuple(cnf.stride_q), stride_kv=tuple(cnf.stride_kv),
            residual_pool=self.residual_pool,
            residual_with_cls_embed=self.residual_with_cls_embed,
            rel_pos_embed=self.rel_pos_embed,
            dtype=self.dtype, name="attn",
        )(x_norm1, thw)

        if needs_proj and self.proj_after_attn:
            x = nn.Dense(cnf.output_channels, dtype=self.dtype, name="project")(x_norm1)
        if _prod(cnf.stride_q) > 1:
            kernel_skip = tuple(s + 1 if s > 1 else s for s in cnf.stride_q)
            x4 = x[:, None] if x.ndim == 3 else x
            x_skip, _ = _Pool(kernel_skip, tuple(cnf.stride_q), mode="max",
                              with_norm=False, name="pool_skip")(x4, thw)
            x_skip = x_skip[:, 0]
        else:
            x_skip = x
        x = x_skip + sd(x_attn, train=train)

        x_norm2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(4 * attn_dim, dtype=self.dtype, name="mlp_fc1")(x_norm2)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(cnf.output_channels, dtype=self.dtype, name="mlp_fc2")(y)
        if needs_proj and not self.proj_after_attn:
            x = nn.Dense(cnf.output_channels, dtype=self.dtype, name="project")(x_norm2)
        return x + sd(y, train=train), thw_new


class PositionalEncoding(nn.Module):
    """Class token + (for v1) separate spatial/temporal/class absolute
    positional embeddings (reference ``mvit.py:PositionalEncoding:395-421``)."""

    embed_size: int
    spatial_size: Tuple[int, int]
    temporal_size: int
    rel_pos_embed: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.truncated_normal(0.02)
        cls_tok = self.param("class_token", init, (self.embed_size,))
        b = x.shape[0]
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok.astype(x.dtype), (b, 1, self.embed_size)), x], axis=1)
        if not self.rel_pos_embed:
            hw = self.spatial_size[0] * self.spatial_size[1]
            spatial = self.param("spatial_pos", init, (hw, self.embed_size))
            temporal = self.param("temporal_pos", init, (self.temporal_size, self.embed_size))
            class_pos = self.param("class_pos", init, (self.embed_size,))
            pos = jnp.repeat(temporal, hw, axis=0) + jnp.tile(spatial, (self.temporal_size, 1))
            pos = jnp.concatenate([class_pos[None], pos], axis=0)
            x = x + pos[None].astype(x.dtype)
        return x


class MViT(nn.Module):
    """Reference ``mvit.py:MViT:424-566``: patchify conv (3,7,7)/(2,4,4),
    positional encoding, 16 multiscale blocks, classify from the class
    token."""

    block_setting: Sequence[MSBlockConfig]
    residual_pool: bool
    residual_with_cls_embed: bool
    rel_pos_embed: bool
    proj_after_attn: bool
    spatial_size: Tuple[int, int] = (224, 224)
    temporal_size: int = 16
    stochastic_depth_prob: float = 0.2
    num_classes: int = 400
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, H, W, C)
        x = nn.Conv(self.block_setting[0].input_channels, (3, 7, 7), (2, 4, 4),
                    padding=[(1, 1), (3, 3), (3, 3)], dtype=self.dtype,
                    name="conv_proj")(x)
        b, t, h, w, c = x.shape
        tokens = x.reshape(b, t * h * w, c)
        tokens = PositionalEncoding(
            c, (h, w), t, self.rel_pos_embed, dtype=self.dtype,
            name="pos_encoding")(tokens)
        thw = (t, h, w)
        input_size = [t, h, w]
        n_blocks = len(self.block_setting)
        for i, cnf in enumerate(self.block_setting):
            sd = self.stochastic_depth_prob * i / max(n_blocks - 1.0, 1.0)
            tokens, thw = MultiscaleBlock(
                tuple(input_size), cnf,
                residual_pool=self.residual_pool,
                residual_with_cls_embed=self.residual_with_cls_embed,
                rel_pos_embed=self.rel_pos_embed,
                proj_after_attn=self.proj_after_attn,
                sd_prob=sd, dtype=self.dtype, name=f"block{i}",
            )(tokens, thw, train=train)
            if len(cnf.stride_q) > 0:
                input_size = [s // st for s, st in zip(input_size, cnf.stride_q)]
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(tokens[:, 0])


def _make_blocks(config) -> Tuple[MSBlockConfig, ...]:
    return tuple(
        MSBlockConfig(
            num_heads=config["num_heads"][i],
            input_channels=config["input_channels"][i],
            output_channels=config["output_channels"][i],
            kernel_q=tuple(config["kernel_q"][i]),
            kernel_kv=tuple(config["kernel_kv"][i]),
            stride_q=tuple(config["stride_q"][i]),
            stride_kv=tuple(config["stride_kv"][i]),
        )
        for i in range(len(config["num_heads"]))
    )


# reference mvit.py:694-737 (mvit_v1_b block_setting)
_V1_B_CONFIG = {
    "num_heads": [1, 2, 2, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 8, 8],
    "input_channels": [96, 192, 192, 384, 384, 384, 384, 384, 384, 384, 384, 384, 384, 384, 768, 768],
    "output_channels": [192, 192, 384, 384, 384, 384, 384, 384, 384, 384, 384, 384, 384, 768, 768, 768],
    "kernel_q": [[], [3, 3, 3], [], [3, 3, 3]] + [[]] * 10 + [[3, 3, 3], []],
    "kernel_kv": [[3, 3, 3]] * 16,
    "stride_q": [[], [1, 2, 2], [], [1, 2, 2]] + [[]] * 10 + [[1, 2, 2], []],
    "stride_kv": [[1, 8, 8], [1, 4, 4], [1, 4, 4]] + [[1, 2, 2]] * 11 + [[1, 1, 1], [1, 1, 1]],
}

# reference mvit.py:790-870 (mvit_v2_s block_setting)
_V2_S_CONFIG = {
    "num_heads": [1, 2, 2, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 8, 8],
    "input_channels": [96, 96, 192, 192, 384, 384, 384, 384, 384, 384, 384, 384, 384, 384, 384, 768],
    "output_channels": [96, 192, 192, 384, 384, 384, 384, 384, 384, 384, 384, 384, 384, 384, 768, 768],
    "kernel_q": [[3, 3, 3]] * 16,
    "kernel_kv": [[3, 3, 3]] * 16,
    "stride_q": [[1, 1, 1], [1, 2, 2], [1, 1, 1], [1, 2, 2]] + [[1, 1, 1]] * 10 + [[1, 2, 2], [1, 1, 1]],
    "stride_kv": [[1, 8, 8], [1, 4, 4], [1, 4, 4]] + [[1, 2, 2]] * 11 + [[1, 1, 1], [1, 1, 1]],
}


@register_model("mvit_v1_b")
def mvit_v1_b(*, num_classes: int = 400, dtype=jnp.float32, **kwargs):
    """MViTv1-B (reference ``mvit.py:mvit_v1_b:668-763``)."""
    return MViT(
        block_setting=_make_blocks(_V1_B_CONFIG),
        residual_pool=False,
        residual_with_cls_embed=False,
        rel_pos_embed=False,
        proj_after_attn=False,
        num_classes=num_classes, dtype=dtype, **kwargs,
    )


@register_model("mvit_v2_s")
def mvit_v2_s(*, num_classes: int = 400, dtype=jnp.float32, **kwargs):
    """MViTv2-S (reference ``mvit.py:mvit_v2_s:766-897``)."""
    return MViT(
        block_setting=_make_blocks(_V2_S_CONFIG),
        residual_pool=True,
        residual_with_cls_embed=False,
        rel_pos_embed=True,
        proj_after_attn=True,
        num_classes=num_classes, dtype=dtype, **kwargs,
    )

"""Vision Transformer (reference ``torchvision/models/vision_transformer.py``):
patchify conv, class token, learned position embeddings, pre-LN encoder.

TPU: attention and MLP are plain ``nn.Dense``/``dot_general`` — all MXU;
use ``dtype=jnp.bfloat16`` for the standard mixed-precision recipe.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model
from .layers import PatchifyDense

# A/B switches for the fused Pallas sub-block kernels (tools/vit_train_ab.py)
FUSED_ATTENTION = True
FUSED_MLP = True

__all__ = ["VisionTransformer", "vit_b_16", "vit_b_32", "vit_l_16", "vit_l_32", "vit_h_14"]


class _ProjParams(nn.Module):
    """Parameter slot matching one of flax MHA's DenseGeneral projections
    (kernel (D, H, hd) / bias (H, hd), or (H, hd, D) / (D,) for out)."""

    kernel_shape: tuple
    bias_shape: tuple

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.kernel_shape)
        b = self.param("bias", nn.initializers.zeros, self.bias_shape)
        return k, b


class FusedMHA(nn.Module):
    """Self-attention with a FUSED QKV projection: one (D -> 3D) matmul
    instead of flax MHA's three separate DenseGenerals.  At ViT-B b256 the
    three D=768 projections under-fill the MXU and triple the activation
    HBM reads; the fused form runs one 2304-wide contraction.  Parameters
    live in the exact slots flax ``MultiHeadDotProductAttention`` uses
    (query/key/value/out with (D, H, hd) kernels), so weight converters and
    checkpoints are unchanged.  Math identical to flax MHA (softmax(q k^T /
    sqrt(hd)) v), verified to 1e-5 in tests/test_patchify_dense.py.
    """

    num_heads: int
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.shape[-1]
        nh = self.num_heads
        hd = d // nh
        qk, qb = _ProjParams((d, nh, hd), (nh, hd), name="query")()
        kk, kb = _ProjParams((d, nh, hd), (nh, hd), name="key")()
        vk, vb = _ProjParams((d, nh, hd), (nh, hd), name="value")()
        ok, ob = _ProjParams((nh, hd, d), (d,), name="out")()

        w_qkv = jnp.concatenate(
            [qk.reshape(d, d), kk.reshape(d, d), vk.reshape(d, d)], axis=1
        ).astype(self.dtype)
        b_qkv = jnp.concatenate(
            [qb.reshape(d), kb.reshape(d), vb.reshape(d)]).astype(self.dtype)
        qkv = x.astype(self.dtype) @ w_qkv + b_qkv  # (N, S, 3D)
        n, s, _ = qkv.shape
        q, k, v = [a.reshape(n, s, nh, hd) for a in jnp.split(qkv, 3, axis=-1)]

        if deterministic or self.dropout_rate == 0.0:
            # fused path: scores stay VMEM-resident (43% of ViT iteration
            # time was the f32 softmax round-tripping HBM — see
            # ops/pallas/flash_attention.py)
            from ..ops.pallas.flash_attention import flash_mha

            o = flash_mha(
                q, k, v, 1.0 / float(hd) ** 0.5,
                jax.default_backend() != "tpu",
            ).transpose(0, 2, 1, 3)
        else:
            scores = jnp.einsum(
                "nqhd,nkhd->nhqk", q / jnp.sqrt(hd).astype(self.dtype), k)
            weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
            weights = nn.Dropout(self.dropout_rate, deterministic=deterministic)(weights)
            o = jnp.einsum("nhqk,nkhd->nqhd", weights, v)
        return o.reshape(n, s, d) @ ok.reshape(d, d).astype(self.dtype) + ob.astype(self.dtype)


class _LNParams(nn.Module):
    """Parameter slot matching ``nn.LayerNorm`` (scale ones, bias zeros)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _DenseParams(nn.Module):
    """Parameter slot matching ``nn.Dense`` (lecun_normal / zeros)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(), self.shape),
                self.param("bias", nn.initializers.zeros, (self.shape[1],)))


class _MHAParams(nn.Module):
    """The four flax-MHA projection slots (query/key/value/out) as raw
    arrays, for the fused attention kernel."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self):
        d, nh = self.dim, self.heads
        hd = d // nh
        qk, qb = _ProjParams((d, nh, hd), (nh, hd), name="query")()
        kk, kb = _ProjParams((d, nh, hd), (nh, hd), name="key")()
        vk, vb = _ProjParams((d, nh, hd), (nh, hd), name="value")()
        ok, ob = _ProjParams((nh, hd, d), (d,), name="out")()
        w_qkv = jnp.concatenate(
            [qk.reshape(d, d), kk.reshape(d, d), vk.reshape(d, d)], axis=1)
        b_qkv = jnp.concatenate([qb.reshape(d), kb.reshape(d), vb.reshape(d)])
        return w_qkv, b_qkv, ok.reshape(d, d), ob


class EncoderBlock(nn.Module):
    num_heads: int
    mlp_dim: int
    dropout: float
    attention_dropout: float
    dtype: Any = jnp.float32

    def _mlp_fits_vmem(self, d: int) -> bool:
        # the kernel streams the hidden dim in blocks (transformer_block.py
        # _pick_block_dh), so it only needs aligned dims: lanes for d,
        # a 256-multiple for the hidden blocking
        return d % 128 == 0 and self.mlp_dim % 256 == 0

    def _attn_fits_vmem(self, d: int, s: int) -> bool:
        # QKV + out weights, the (S, 3D) QKV product (f32 + cast), and the
        # (S, S) score tile must co-reside in VMEM with the token blocks
        it = jnp.dtype(self.dtype).itemsize
        return 4 * d * d * it + s * 3 * d * (4 + it) + s * s * 4 <= 12_500_000

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, s, d = x.shape
        det = not train
        attn_fusable = (FUSED_ATTENTION
                        and (det or (self.attention_dropout == 0.0
                                     and self.dropout == 0.0))
                        and self._attn_fits_vmem(d, s))
        if attn_fusable:
            # whole attention sub-block (LN + QKV + MHA + out + residual)
            # as one VMEM-resident kernel — kills the (N,S,H,hd) layout
            # copies that cost 23% of ViT-B inference (see
            # ops/pallas/transformer_block.py)
            from ..ops.pallas.transformer_block import attention_block

            g0, b0 = _LNParams(d, name="LayerNorm_0")()
            w_qkv, b_qkv, w_o, b_o = _MHAParams(
                d, self.num_heads, name="MultiHeadDotProductAttention_0")()
            hd = d // self.num_heads
            x = attention_block(
                x, g0, b0, w_qkv.astype(self.dtype), b_qkv,
                w_o.astype(self.dtype), b_o, self.num_heads,
                1.0 / float(hd) ** 0.5, 1e-6,
                jax.default_backend() != "tpu",
            )
        else:
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name="LayerNorm_0")(x)
            # param-compatible fused-QKV attention (see FusedMHA docstring)
            h = FusedMHA(
                num_heads=self.num_heads,
                dropout_rate=self.attention_dropout,
                dtype=self.dtype,
                name="MultiHeadDotProductAttention_0",
            )(h, deterministic=det)
            h = nn.Dropout(self.dropout, deterministic=det)(h)
            x = x + h

        drop_off = self.dropout == 0.0 or det
        if FUSED_MLP and drop_off and self._mlp_fits_vmem(d):
            # one-kernel MLP sub-block: LN + both matmuls + gelu +
            # residual, weights VMEM-resident (ops/pallas/transformer_block
            # docstring has the trace evidence: XLA's own fusion of this
            # sub-block recomputes the up-projection matmul)
            g, b = _LNParams(d, name="LayerNorm_1")()
            w1, b1 = _DenseParams((d, self.mlp_dim), name="Dense_0")()
            w2, b2 = _DenseParams((self.mlp_dim, d), name="Dense_1")()
            from ..ops.pallas.transformer_block import mlp_block

            out = mlp_block(
                x.reshape(n * s, d), g, b, w1.astype(self.dtype), b1,
                w2.astype(self.dtype), b2, 1e-6, 256,
                jax.default_backend() != "tpu",
            )
            return out.reshape(n, s, d)

        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="LayerNorm_1")(x)
        h = nn.Dense(self.mlp_dim, dtype=self.dtype, name="Dense_0")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="Dense_1")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return x + h


class VisionTransformer(nn.Module):
    patch_size: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        p = self.patch_size
        if h % p or w % p:
            raise ValueError(f"image size {(h, w)} not divisible by patch size {p}")
        # patchify as space-to-depth matmul (models/layers.py:PatchifyDense);
        # named Conv_0 for param-tree compatibility with the conv formulation
        x = PatchifyDense(self.hidden_dim, (p, p), dtype=self.dtype, name="Conv_0")(x)
        x = x.reshape(n, -1, self.hidden_dim)  # (N, S, D)
        cls = self.param("class_token", nn.initializers.zeros, (1, 1, self.hidden_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, self.hidden_dim)).astype(x.dtype), x], axis=1)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, x.shape[1], self.hidden_dim),
        )
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        for i in range(self.num_layers):
            x = EncoderBlock(self.num_heads, self.mlp_dim, self.dropout,
                             self.attention_dropout, dtype=self.dtype,
                             name=f"encoder_{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        x = x[:, 0]
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def _make(name, patch, layers, heads, hidden, mlp):
    def builder(*, num_classes: int = 1000, dtype=jnp.float32, **kwargs):
        return VisionTransformer(patch, layers, heads, hidden, mlp,
                                 num_classes=num_classes, dtype=dtype, **kwargs)

    builder.__name__ = name
    return register_model(name)(builder)


vit_b_16 = _make("vit_b_16", 16, 12, 12, 768, 3072)
vit_b_32 = _make("vit_b_32", 32, 12, 12, 768, 3072)
vit_l_16 = _make("vit_l_16", 16, 24, 16, 1024, 4096)
vit_l_32 = _make("vit_l_32", 32, 24, 16, 1024, 4096)
vit_h_14 = _make("vit_h_14", 14, 32, 16, 1280, 5120)

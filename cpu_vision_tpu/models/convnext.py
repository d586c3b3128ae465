"""ConvNeXt family (reference ``torchvision/models/convnext.py``):
CNBlock = 7x7 depthwise -> LN -> 1x1 MLP (x4) with layer scale + stochastic
depth; patchify stem; LN downsampling between stages."""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model
from .layers import DepthwiseConv, StochasticDepth

__all__ = ["ConvNeXt", "convnext_tiny", "convnext_small", "convnext_base", "convnext_large"]


class CNBlock(nn.Module):
    """(reference ``convnext.py:CNBlock``)."""

    dim: int
    layer_scale: float
    sd_prob: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = DepthwiseConv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                            dtype=self.dtype, name="Conv_0")(x)
        scale = self.param("layer_scale", lambda k: jnp.full((self.dim,), self.layer_scale))
        if not train or self.sd_prob == 0.0:
            # fused tail (ops/pallas/transformer_block.py:cn_mlp_block):
            # LN + MLP + layer_scale + residual in one VMEM-resident pass —
            # traced 36% of convnext_tiny device time was LN convert/reduce
            # fusions.  Param slots match the unfused module path below.
            import jax

            from ..ops.pallas.transformer_block import cn_mlp_block
            from .vision_transformer import _DenseParams, _LNParams

            c = self.dim
            g, b = _LNParams(c, name="LayerNorm_0")()
            w1, b1 = _DenseParams((c, 4 * c), name="Dense_0")()
            w2, b2 = _DenseParams((4 * c, c), name="Dense_1")()
            fused = cn_mlp_block(
                out.reshape(-1, c), residual.reshape(-1, c), g, b,
                w1.astype(self.dtype), b1, w2.astype(self.dtype), b2,
                scale, 1e-6, 512, jax.default_backend() != "tpu")
            return fused.reshape(x.shape)
        out = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(out)
        out = nn.Dense(4 * self.dim, dtype=self.dtype)(out)
        out = nn.gelu(out, approximate=False)
        out = nn.Dense(self.dim, dtype=self.dtype)(out)
        out = out * scale
        out = StochasticDepth(self.sd_prob, "row")(out, train)
        return residual + out


class ConvNeXt(nn.Module):
    block_dims: Sequence[int]
    block_depths: Sequence[int]
    sd_prob: float = 0.1
    layer_scale: float = 1e-6
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # patchify stem: 4x4 stride-4 conv + LN
        x = nn.Conv(self.block_dims[0], (4, 4), (4, 4), padding="VALID", dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        total = sum(self.block_depths)
        bid = 0
        for stage, (dim, depth) in enumerate(zip(self.block_dims, self.block_depths)):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
                x = nn.Conv(dim, (2, 2), (2, 2), padding="VALID", dtype=self.dtype)(x)
            for _ in range(depth):
                sd = self.sd_prob * bid / max(total - 1.0, 1.0)
                x = CNBlock(dim, self.layer_scale, sd, dtype=self.dtype)(x, train)
                bid += 1
        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


def _make(name, dims, depths, sd):
    def builder(*, num_classes: int = 1000, dtype=jnp.float32):
        return ConvNeXt(dims, depths, sd, num_classes=num_classes, dtype=dtype)

    builder.__name__ = name
    return register_model(name)(builder)


convnext_tiny = _make("convnext_tiny", (96, 192, 384, 768), (3, 3, 9, 3), 0.1)
convnext_small = _make("convnext_small", (96, 192, 384, 768), (3, 3, 27, 3), 0.4)
convnext_base = _make("convnext_base", (128, 256, 512, 1024), (3, 3, 27, 3), 0.5)
convnext_large = _make("convnext_large", (192, 384, 768, 1536), (3, 3, 27, 3), 0.5)

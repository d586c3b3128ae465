"""GoogLeNet + Inception V3 (reference ``torchvision/models/googlenet.py``
and ``inception.py``)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ._api import register_model
from .layers import ConvNormActivation

__all__ = ["GoogLeNet", "Inception3", "googlenet", "inception_v3"]


def _cba(features, kernel, strides=1, padding=None, dtype=jnp.float32):
    # reference BasicConv2d: BatchNorm2d(eps=0.001) (googlenet.py:270, inception.py:402)
    return ConvNormActivation(features, kernel, strides, padding=padding, eps=1e-3, dtype=dtype)


def _adaptive_avg_pool(x, out_hw):
    """Exact torch ``adaptive_avg_pool2d`` bins: bin i spans
    [floor(i*S/O), ceil((i+1)*S/O))."""
    oh, ow = out_hw
    n, h, w, c = x.shape
    rows = []
    for i in range(oh):
        y0, y1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            x0, x1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(jnp.mean(x[:, y0:y1, x0:x1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (N, oh, ow, C)


class GoogLeNetAux(nn.Module):
    """(reference ``googlenet.py:InceptionAux``): 4x4 adaptive pool ->
    1x1 conv(128) -> fc(2048->1024) -> dropout(0.7) -> fc(num_classes)."""

    num_classes: int
    dropout: float = 0.7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _adaptive_avg_pool(x, (4, 4))
        x = _cba(128, 1, dtype=self.dtype)(x, train)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(1024, dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


class Inception3Aux(nn.Module):
    """(reference ``inception.py:InceptionAux``): 5x5/3 avg pool ->
    conv(128,1x1) -> conv(768,5x5) -> global pool -> fc(num_classes)."""

    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.avg_pool(x, (5, 5), (3, 3))
        x = _cba(128, 1, dtype=self.dtype)(x, train)
        x = _cba(768, 5, padding=0, dtype=self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


class InceptionBlock(nn.Module):
    """GoogLeNet inception module (reference ``googlenet.py:Inception``)."""

    c1: int
    c3red: int
    c3: int
    c5red: int
    c5: int
    pool_proj: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = _cba(self.c1, 1, dtype=self.dtype)(x, train)
        b2 = _cba(self.c3red, 1, dtype=self.dtype)(x, train)
        b2 = _cba(self.c3, 3, dtype=self.dtype)(b2, train)
        b3 = _cba(self.c5red, 1, dtype=self.dtype)(x, train)
        b3 = _cba(self.c5, 3, dtype=self.dtype)(b3, train)  # reference uses 3x3 here too
        b4 = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        b4 = nn.max_pool(b4, (3, 3), (1, 1))
        b4 = _cba(self.pool_proj, 1, dtype=self.dtype)(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class GoogLeNet(nn.Module):
    """(reference ``googlenet.py:GoogLeNet``).  ``aux_logits=True`` (the
    reference default) adds the two training-time classifier heads; like
    the reference, ``train=True`` returns ``(logits, aux2, aux1)`` and
    eval returns logits only (aux params still exist for weight parity)."""

    num_classes: int = 1000
    aux_logits: bool = True
    dropout: float = 0.2
    dropout_aux: float = 0.7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def mp(x):
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=-jnp.inf)
            return nn.max_pool(x, (3, 3), (2, 2))

        x = _cba(64, 7, 2, dtype=self.dtype)(x, train)
        x = mp(x)
        x = _cba(64, 1, dtype=self.dtype)(x, train)
        x = _cba(192, 3, dtype=self.dtype)(x, train)
        x = mp(x)
        x = InceptionBlock(64, 96, 128, 16, 32, 32, self.dtype)(x, train)
        x = InceptionBlock(128, 128, 192, 32, 96, 64, self.dtype)(x, train)
        x = mp(x)
        x = InceptionBlock(192, 96, 208, 16, 48, 64, self.dtype)(x, train)
        aux1 = None
        if self.aux_logits:
            aux1 = GoogLeNetAux(self.num_classes, self.dropout_aux,
                                self.dtype, name="aux1")(x, train)
        x = InceptionBlock(160, 112, 224, 24, 64, 64, self.dtype)(x, train)
        x = InceptionBlock(128, 128, 256, 24, 64, 64, self.dtype)(x, train)
        x = InceptionBlock(112, 144, 288, 32, 64, 64, self.dtype)(x, train)
        aux2 = None
        if self.aux_logits:
            aux2 = GoogLeNetAux(self.num_classes, self.dropout_aux,
                                self.dtype, name="aux2")(x, train)
        x = InceptionBlock(256, 160, 320, 32, 128, 128, self.dtype)(x, train)
        x = mp(x)
        x = InceptionBlock(256, 160, 320, 32, 128, 128, self.dtype)(x, train)
        x = InceptionBlock(384, 192, 384, 48, 128, 128, self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        if train and self.aux_logits:
            return logits, aux2, aux1  # reference GoogLeNetOutputs order
        return logits


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = _cba(64, 1, dtype=self.dtype)(x, train)
        b2 = _cba(48, 1, dtype=self.dtype)(x, train)
        b2 = _cba(64, 5, dtype=self.dtype)(b2, train)
        b3 = _cba(64, 1, dtype=self.dtype)(x, train)
        b3 = _cba(96, 3, dtype=self.dtype)(b3, train)
        b3 = _cba(96, 3, dtype=self.dtype)(b3, train)
        b4 = nn.avg_pool(x, (3, 3), (1, 1), padding=[(1, 1), (1, 1)])
        b4 = _cba(self.pool_features, 1, dtype=self.dtype)(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = _cba(384, 3, 2, padding=0, dtype=self.dtype)(x, train)
        b2 = _cba(64, 1, dtype=self.dtype)(x, train)
        b2 = _cba(96, 3, dtype=self.dtype)(b2, train)
        b2 = _cba(96, 3, 2, padding=0, dtype=self.dtype)(b2, train)
        b3 = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        c7 = self.c7
        b1 = _cba(192, 1, dtype=self.dtype)(x, train)
        b2 = _cba(c7, 1, dtype=self.dtype)(x, train)
        b2 = _cba(c7, (1, 7), dtype=self.dtype)(b2, train)
        b2 = _cba(192, (7, 1), dtype=self.dtype)(b2, train)
        b3 = _cba(c7, 1, dtype=self.dtype)(x, train)
        b3 = _cba(c7, (7, 1), dtype=self.dtype)(b3, train)
        b3 = _cba(c7, (1, 7), dtype=self.dtype)(b3, train)
        b3 = _cba(c7, (7, 1), dtype=self.dtype)(b3, train)
        b3 = _cba(192, (1, 7), dtype=self.dtype)(b3, train)
        b4 = nn.avg_pool(x, (3, 3), (1, 1), padding=[(1, 1), (1, 1)])
        b4 = _cba(192, 1, dtype=self.dtype)(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = _cba(192, 1, dtype=self.dtype)(x, train)
        b1 = _cba(320, 3, 2, padding=0, dtype=self.dtype)(b1, train)
        b2 = _cba(192, 1, dtype=self.dtype)(x, train)
        b2 = _cba(192, (1, 7), dtype=self.dtype)(b2, train)
        b2 = _cba(192, (7, 1), dtype=self.dtype)(b2, train)
        b2 = _cba(192, 3, 2, padding=0, dtype=self.dtype)(b2, train)
        b3 = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b1, b2, b3], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b1 = _cba(320, 1, dtype=self.dtype)(x, train)
        b2 = _cba(384, 1, dtype=self.dtype)(x, train)
        b2 = jnp.concatenate([
            _cba(384, (1, 3), dtype=self.dtype)(b2, train),
            _cba(384, (3, 1), dtype=self.dtype)(b2, train),
        ], axis=-1)
        b3 = _cba(448, 1, dtype=self.dtype)(x, train)
        b3 = _cba(384, 3, dtype=self.dtype)(b3, train)
        b3 = jnp.concatenate([
            _cba(384, (1, 3), dtype=self.dtype)(b3, train),
            _cba(384, (3, 1), dtype=self.dtype)(b3, train),
        ], axis=-1)
        b4 = nn.avg_pool(x, (3, 3), (1, 1), padding=[(1, 1), (1, 1)])
        b4 = _cba(192, 1, dtype=self.dtype)(b4, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class Inception3(nn.Module):
    """(reference ``inception.py:Inception3``).  ``aux_logits=True`` (the
    reference default) adds the training-time aux head; ``train=True``
    returns ``(logits, aux)`` like the reference's InceptionOutputs."""

    num_classes: int = 1000
    aux_logits: bool = True
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _cba(32, 3, 2, padding=0, dtype=self.dtype)(x, train)
        x = _cba(32, 3, padding=0, dtype=self.dtype)(x, train)
        x = _cba(64, 3, dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = _cba(80, 1, padding=0, dtype=self.dtype)(x, train)
        x = _cba(192, 3, padding=0, dtype=self.dtype)(x, train)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = InceptionA(32, self.dtype)(x, train)
        x = InceptionA(64, self.dtype)(x, train)
        x = InceptionA(64, self.dtype)(x, train)
        x = InceptionB(self.dtype)(x, train)
        x = InceptionC(128, self.dtype)(x, train)
        x = InceptionC(160, self.dtype)(x, train)
        x = InceptionC(160, self.dtype)(x, train)
        x = InceptionC(192, self.dtype)(x, train)
        aux = None
        if self.aux_logits:
            aux = Inception3Aux(self.num_classes, self.dtype, name="AuxLogits")(x, train)
        x = InceptionD(self.dtype)(x, train)
        x = InceptionE(self.dtype)(x, train)
        x = InceptionE(self.dtype)(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        if train and self.aux_logits:
            return logits, aux  # reference InceptionOutputs order
        return logits


@register_model("googlenet")
def googlenet(*, num_classes: int = 1000, aux_logits: bool = True, dtype=jnp.float32):
    return GoogLeNet(num_classes=num_classes, aux_logits=aux_logits, dtype=dtype)


@register_model("inception_v3")
def inception_v3(*, num_classes: int = 1000, aux_logits: bool = True, dtype=jnp.float32):
    return Inception3(num_classes=num_classes, aux_logits=aux_logits, dtype=dtype)

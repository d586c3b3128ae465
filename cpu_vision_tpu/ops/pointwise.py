"""Pointwise (1x1) convolution with a Pallas weight-gradient kernel.

Forward and grad-input are plain MXU matmuls (what XLA lowers a 1x1 conv
to anyway); the weight gradient goes through ``ops.pallas.wgrad_matmul``,
which streams the huge M = N*H*W contraction through VMEM and keeps the
tiny (Cin, Cout) output resident on-chip.

**Measured outcome (v5e, r50 b128 bf16 — see BENCH_NOTES.md):** standalone
the Pallas wgrad is 0.9-1.3x XLA's dot; wired into the full train step it
LOSES 24 ms/step (76.6 vs 52.8 ms) because pallas_call forces lane-padding
copies of the big 64-channel layer1 activations and breaks XLA's
backward-pass fusion, while a custom-vjp with XLA's own dot exactly
matches the stock conv backward (2415 vs 2423 img/s).  So the ResNet
models keep plain ``nn.Conv`` and this module stays an op-level tool (and
the recorded evidence that the 31% train-MFU plateau is structural, not a
missing kernel).

``PointwiseConv`` is param-compatible with ``flax.linen.Conv`` (kernel
shape ``(1, 1, Cin, Cout)``, no bias, same initializer), so checkpoint
converters and the int8 engine's introspection see an identical tree.

Counterpart: the reference's ``conv1x1`` helper (``models/resnet.py:59``)
whose backward runs through ATen ``convolution_backward``.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .pallas.wgrad_matmul import wgrad_matmul

__all__ = ["conv1x1", "PointwiseConv"]

# below this many rows the contraction is too small for the kernel's
# grid/padding overhead to pay off — fall back to XLA's dot
_MIN_ROWS_FOR_PALLAS = 16384


def _matmul_nhwc(x: jax.Array, kernel: jax.Array) -> jax.Array:
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    y = jax.lax.dot_general(
        x.reshape(-1, cin), kernel.reshape(cin, cout),
        (((1,), (0,)), ((), ())))
    return y.reshape(n, h, w, cout)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv1x1(x: jax.Array, kernel: jax.Array, stride: int = 1) -> jax.Array:
    """1x1 stride-``s`` pad-0 conv: exact as a spatial slice + matmul.

    ``x`` NHWC, ``kernel`` (1, 1, Cin, Cout).
    """
    if stride > 1:
        x = x[:, ::stride, ::stride, :]
    return _matmul_nhwc(x, kernel)


def _fwd(x, kernel, stride):
    return conv1x1(x, kernel, stride), (x, kernel)


def _bwd(stride, res, dy):
    x, kernel = res
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    xs = x[:, ::stride, ::stride, :] if stride > 1 else x
    dy2 = dy.reshape(-1, cout)

    # grad-input: dy @ W^T at the sampled positions, zero elsewhere
    dxs = jax.lax.dot_general(
        dy2, kernel.reshape(cin, cout), (((1,), (1,)), ((), ())),
    ).reshape(xs.shape).astype(x.dtype)
    if stride > 1:
        dx = jnp.zeros(x.shape, x.dtype).at[:, ::stride, ::stride, :].set(dxs)
    else:
        dx = dxs

    # grad-weight: K-streaming Pallas reduction on TPU, XLA dot elsewhere
    xf = xs.reshape(-1, cin)
    if jax.default_backend() == "tpu" and xf.shape[0] >= _MIN_ROWS_FOR_PALLAS:
        dw = wgrad_matmul(xf, dy2)
    else:
        dw = jax.lax.dot_general(xf, dy2, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dw = dw.astype(kernel.dtype).reshape(kernel.shape)
    return dx, dw


conv1x1.defvjp(_fwd, _bwd)


class PointwiseConv(nn.Module):
    """Drop-in for ``nn.Conv(features, (1, 1), strides, use_bias=False)``.

    Give it an explicit ``name="Conv_k"`` so the param tree is identical
    to the ``nn.Conv`` it replaces.
    """

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, cin, self.features))
        return conv1x1(x.astype(self.dtype), kernel.astype(self.dtype),
                       self.strides)

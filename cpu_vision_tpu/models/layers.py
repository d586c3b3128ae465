"""Reusable NN building blocks (flax.linen, NHWC).

Counterpart of the reference's ``torchvision/ops/misc.py``:
``FrozenBatchNorm2d`` (:13), ``Conv2dNormActivation``/``Conv3dNormActivation``
(:125,175), ``SqueezeExcitation`` (:224), ``MLP`` (:263), plus
``StochasticDepth`` (``ops/stochastic_depth.py:53``) and ``Permute``.

TPU notes: convs are NHWC, default dtype is configurable for bf16 compute
with f32 params (the standard TPU mixed-precision recipe).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "Conv",
    "DepthwiseConv",
    "ConvNormActivation",
    "Conv2dNormActivation",
    "SqueezeExcitation",
    "MLP",
    "FrozenBatchNorm",
    "StochasticDepth",
    "Permute",
]

ModuleDef = Any


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv(nn.Conv):
    """``nn.Conv`` with torch-style 'same-for-odd-kernels' default padding."""


class PatchifyDense(nn.Module):
    """Non-overlapping patchify conv (stride == kernel) as space-to-depth +
    one matmul.

    ViT's ``conv_proj`` (reference ``vision_transformer.py:290``), Swin's
    4x4 embed (``swin_transformer.py``) and Swin3D's (2,4,4) embed all
    convolve a 3-channel input with stride == kernel: each input element is
    read exactly once, so the op IS a dense matmul over flattened patches.
    On TPU the conv form pads the 3 input channels to 128 lanes (≈42x
    wasted MXU work and HBM traffic); this form contracts over the packed
    prod(patch)*C lanes at full utilisation.  The parameter keeps the
    conv's HWIO/DHWIO kernel shape, so weight converters and param-parity
    are unchanged — instantiate with ``name="Conv_0"`` (etc.) to occupy the
    same slot in the param tree.

    Output is the patch grid ``(N, *spatial//patch, features)``.
    """

    features: int
    patch: tuple
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ps = tuple(self.patch)
        n, c = x.shape[0], x.shape[-1]
        spatial = x.shape[1:-1]
        if len(ps) != len(spatial):
            raise ValueError(f"patch {ps} does not match spatial dims {spatial}")
        if any(s % p for s, p in zip(spatial, ps)):
            raise ValueError(f"spatial dims {spatial} not divisible by patch {ps}")
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*ps, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        shape = [n]
        for s, p in zip(spatial, ps):
            shape += [s // p, p]
        shape.append(c)
        x = x.reshape(shape)
        k = len(ps)
        # (n, g1, p1, g2, p2, ..., c) -> (n, g1, g2, ..., p1, p2, ..., c):
        # row-major flatten of (p1, ..., pk, c) matches the kernel's
        # (*patch, C, features) reduction order exactly
        perm = [0] + [1 + 2 * i for i in range(k)] + [2 + 2 * i for i in range(k)] + [2 * k + 1]
        x = x.transpose(perm)
        grid = tuple(s // p for s, p in zip(spatial, ps))
        flat = 1
        for p in ps:
            flat *= p
        x = x.reshape(n, *grid, flat * c)
        w = kernel.reshape(flat * c, self.features)
        return x.astype(self.dtype) @ w.astype(self.dtype) + bias.astype(self.dtype)


class DepthwiseConv(nn.Module):
    """Depthwise KxK conv: Pallas VMEM kernel when eligible, grouped
    ``lax.conv`` otherwise.

    On-chip A/B at ConvNeXt's stage shapes (v5e, b256): grouped
    ``lax.conv`` 5.6 ms, XLA shifted-slice accumulation 13.7 ms (49 HBM
    re-reads — XLA does not fuse the taps), HBM floor 0.38 ms.  The
    Pallas kernel (``ops/pallas/depthwise.py``) reads each image into
    VMEM once and runs the K*K taps there — used for stride-1,
    undilated, SAME-padded convs whose padded image fits VMEM (ConvNeXt's
    7x7 at every stage); everything else (MobileNet's strided 3x3s, big
    feature maps) takes XLA's grouped path.  Reference semantics:
    ``torchvision/models/convnext.py:62-92`` CNBlock, groups=dim.

    The parameter keeps ``nn.Conv``'s grouped HWIO kernel shape
    ``(kh, kw, 1, C)`` + ``(C,)`` bias, so weight converters and
    param-parity are unchanged — instantiate with ``name="Conv_0"`` to
    occupy the same slot in the param tree.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    kernel_dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        sy, sx = self.strides
        dy, dx = self.kernel_dilation
        c = x.shape[-1]
        if c != self.features:
            raise ValueError(
                f"DepthwiseConv needs in_channels == features, got {c} vs {self.features}")
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, 1, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)

        ekh, ekw = (kh - 1) * dy + 1, (kw - 1) * dx + 1  # effective extent
        if self.padding == "SAME":
            pads = [((ekh - 1) // 2, ekh // 2), ((ekw - 1) // 2, ekw // 2)]
        elif self.padding == "VALID":
            pads = [(0, 0), (0, 0)]
        else:
            pads = [tuple(p) for p in self.padding]

        xd = x.astype(self.dtype)
        kd = kernel.astype(self.dtype)
        n, h, w, _ = x.shape
        from ..ops.pallas.depthwise import depthwise_conv2d, fits_vmem

        # Measured negative (v5e, b256, all four ConvNeXt stages): the
        # Pallas VMEM kernel runs 13.6/7.8/4.4/3.9 ms vs grouped
        # lax.conv's 4.9/4.0/3.0/4.4 — the 49-tap FMA chain is
        # VMEM-bandwidth bound (3 VMEM touches per FMA), and bf16
        # accumulation is slower still (VPU is natively f32).  XLA's
        # grouped conv is the best known depthwise path on TPU; keep the
        # kernel behind an opt-in env for future re-measurement.
        import os as _os

        pallas_ok = (
            _os.environ.get("CVT_DW_PALLAS") == "1"
            and (sy, sx) == (1, 1) and (dy, dx) == (1, 1)
            and kh % 2 == 1 and kw % 2 == 1
            and pads == [(kh // 2, kh // 2), (kw // 2, kw // 2)]
            and fits_vmem(h, w, c, kh, kw, jnp.dtype(self.dtype).itemsize)
        )
        if pallas_ok:
            b_in = (bias.astype(jnp.float32) if bias is not None
                    else jnp.zeros((c,), jnp.float32))
            return depthwise_conv2d(
                xd, kd[:, :, 0, :], b_in, bias is not None,
                jax.default_backend() != "tpu")
        out = jax.lax.conv_general_dilated(
            xd, kd,
            window_strides=(sy, sx),
            padding=pads,
            rhs_dilation=(dy, dx),
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")),
            feature_group_count=c,
        )
        if bias is not None:
            out = out + bias.astype(self.dtype)
        return out


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine params (reference
    ``FrozenBatchNorm2d``, ``ops/misc.py:13``): used by detection backbones
    where batch stats must not update."""

    features: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.variable("batch_stats", "scale", lambda: jnp.ones((self.features,)))
        bias = self.variable("batch_stats", "bias", lambda: jnp.zeros((self.features,)))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.features,)))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((self.features,)))
        w = (scale.value * jax.lax.rsqrt(var.value + self.eps)).astype(self.dtype)
        b = (bias.value - mean.value * scale.value * jax.lax.rsqrt(var.value + self.eps)).astype(self.dtype)
        return x * w + b


class ConvNormActivation(nn.Module):
    """Conv -> Norm -> Activation (reference ``ConvNormActivation``,
    ``ops/misc.py:70-170``)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    dilation: Union[int, Tuple[int, int]] = 1
    norm: Optional[str] = "batch"  # "batch" | "frozen" | "layer" | None
    activation: Optional[Callable] = nn.relu
    bias: Optional[bool] = None
    padding: Optional[Union[str, int]] = None
    eps: float = 1e-5  # BN epsilon (reference families override, e.g. 1e-3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _pair(self.kernel_size)
        d = _pair(self.dilation)
        if self.padding is None:
            pad = [(((ki - 1) // 2) * di,) * 2 for ki, di in zip(k, d)]
        elif isinstance(self.padding, int):
            pad = [(self.padding, self.padding)] * 2
        else:
            pad = self.padding
        use_bias = self.bias if self.bias is not None else self.norm is None
        if self.groups > 1 and self.groups == self.features and x.shape[-1] == self.features:
            # fully-depthwise: shifted-slice FMAs instead of the grouped
            # lax.conv lane trap (same param slot via name="Conv_0")
            x = DepthwiseConv(
                self.features, k, strides=_pair(self.strides), padding=pad,
                kernel_dilation=d, use_bias=use_bias, dtype=self.dtype,
                name="Conv_0",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                k,
                strides=_pair(self.strides),
                padding=pad,
                feature_group_count=self.groups,
                kernel_dilation=d,
                use_bias=use_bias,
                dtype=self.dtype,
            )(x)
        if self.norm == "batch":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=self.eps, dtype=self.dtype)(x)
        elif self.norm == "frozen":
            x = FrozenBatchNorm(self.features, dtype=self.dtype)(x)
        elif self.norm == "layer":
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


Conv2dNormActivation = ConvNormActivation


class SqueezeExcitation(nn.Module):
    """Squeeze-and-Excitation (reference ``SqueezeExcitation``,
    ``ops/misc.py:224``)."""

    squeeze_features: int
    activation: Callable = nn.relu
    scale_activation: Callable = nn.sigmoid
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.Conv(self.squeeze_features, (1, 1), dtype=self.dtype)(s)
        s = self.activation(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype)(s)
        return x * self.scale_activation(s)


class MLP(nn.Module):
    """MLP head (reference ``MLP``, ``ops/misc.py:263``)."""

    hidden_features: Sequence[int]
    activation: Callable = nn.relu
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, h in enumerate(self.hidden_features):
            x = nn.Dense(h, dtype=self.dtype)(x)
            if i < len(self.hidden_features) - 1:
                x = self.activation(x)
                if self.dropout_rate > 0:
                    x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class StochasticDepth(nn.Module):
    """Module wrapper over ``ops.stochastic_depth`` (reference
    ``StochasticDepth``, ``ops/stochastic_depth.py:53``)."""

    p: float
    mode: str = "row"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..ops import stochastic_depth

        if not train or self.p == 0.0:
            return x
        key = self.make_rng("dropout")
        return stochastic_depth(x, self.p, self.mode, True, key)


class Permute(nn.Module):
    dims: Tuple[int, ...]

    def __call__(self, x):
        return jnp.transpose(x, self.dims)


class SyncBatchNorm(nn.BatchNorm):
    """Cross-replica BatchNorm (reference ``torch.nn.SyncBatchNorm`` as
    enabled by ``references/classification/train.py:251-252``).

    Under ``jit`` over a sharded batch, GSPMD lowers the BN mean/variance
    reductions to global collectives automatically — every ``nn.BatchNorm``
    here already IS a SyncBatchNorm when the batch axis is sharded (that is
    the TPU-native replacement for torch's wrapper; see
    ``tests/test_sync_batchnorm.py`` for the proof).  The subclass exists to
    carry the reference name and for explicit ``axis_name`` use under
    ``shard_map``/``pmap``, where reductions are per-shard unless named.
    """


def convert_sync_batchnorm(module, axis_name=None):
    """(reference ``SyncBatchNorm.convert_sync_batchnorm``): no module
    surgery is needed under jit/GSPMD (see :class:`SyncBatchNorm`) — returns
    the module unchanged.  Only ``shard_map``/``pmap`` code needs per-module
    ``axis_name`` plumbing, which flax models take at construction."""
    return module


__all__ += ["SyncBatchNorm", "convert_sync_batchnorm"]

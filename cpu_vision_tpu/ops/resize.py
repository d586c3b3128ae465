"""Image resize with reference-parity semantics.

Matches ``torch.nn.functional.interpolate`` (and therefore the reference's
``resize``, torchvision ``transforms/_functional_tensor.py:441-474``) for
``nearest`` / ``nearest-exact`` / ``bilinear`` / ``bicubic``, with and
without antialias, including the uint8 cast/round/clamp protocol.

TPU-native design: resampling along each axis is a dense weight-matrix
contraction (built with NumPy at trace time — shapes are static under jit —
and contracted on the MXU), instead of the reference's per-pixel C++ loops
(aten ``UpSample.h`` ``compute_indices_weights_aa``).  For ``nearest`` it is
a pure gather.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .._dtype import cast_back, cast_to_float, is_integer_dtype
from .._layout import ensure_nhwc

__all__ = ["resize", "resize_weight_matrix", "rescale"]


def _cubic_filter(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), ``a=-0.75`` like torch/OpenCV."""
    x = np.abs(x)
    out = np.where(
        x <= 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )
    return out


def _triangle_filter(x: np.ndarray) -> np.ndarray:
    return np.maximum(0.0, 1.0 - np.abs(x))


def resize_weight_matrix(
    in_size: int,
    out_size: int,
    mode: str = "bilinear",
    antialias: bool = True,
) -> np.ndarray:
    """Dense ``(out_size, in_size)`` resampling weights for one axis.

    Replicates aten's index/weight computation:

    * no antialias: ``center = (o + 0.5) * scale - 0.5``; bilinear takes
      2 taps, bicubic 4 taps (cubic a=-0.75), indices clamped to the edge.
    * antialias (only when downscaling): filter support scaled by ``scale``,
      taps from ``floor(center - support + 0.5)``, weights normalised —
      identical to PIL's convolution resampling.
    """
    if mode not in ("bilinear", "bicubic"):
        raise ValueError(f"weights only for bilinear/bicubic, got {mode}")
    scale = in_size / out_size
    support_base = 1.0 if mode == "bilinear" else 2.0
    if mode == "bilinear":
        filt = _triangle_filter
    elif antialias:
        # the antialias path matches PIL: cubic a=-0.5
        filt = lambda x: _cubic_filter(x, a=-0.5)  # noqa: E731
    else:
        filt = _cubic_filter
    w = np.zeros((out_size, in_size), np.float64)
    # torch's antialias path is used whenever antialias=True (upscales keep
    # support_base but still normalise boundary weights, which differs from
    # the clamp-and-accumulate non-AA path for bicubic)
    use_aa = antialias

    if use_aa:
        kscale = max(scale, 1.0)
        support = support_base * kscale
        inv_scale = 1.0 / kscale
        for o in range(out_size):
            center = scale * (o + 0.5)
            xmin = max(int(center - support + 0.5), 0)
            xmax = min(int(center + support + 0.5), in_size)
            x = (np.arange(xmin, xmax) - center + 0.5) * inv_scale
            ww = filt(x)
            s = ww.sum()
            if s != 0:
                ww = ww / s
            w[o, xmin:xmax] = ww
    else:
        for o in range(out_size):
            center = (o + 0.5) * scale - 0.5
            if mode == "bilinear":
                i0 = math.floor(center)
                t = center - i0
                taps = [(i0, 1.0 - t), (i0 + 1, t)]
            else:
                i0 = math.floor(center)
                t = center - i0
                offs = np.array([-1, 0, 1, 2])
                ww = _cubic_filter(offs - t)
                taps = [(i0 + int(d), float(v)) for d, v in zip(offs, ww)]
            for idx, val in taps:
                w[o, min(max(idx, 0), in_size - 1)] += val
    return w.astype(np.float32)


def _nearest_indices(in_size: int, out_size: int, exact: bool) -> np.ndarray:
    o = np.arange(out_size, dtype=np.float64)
    scale = in_size / out_size
    if exact:
        idx = np.floor((o + 0.5) * scale)
    else:
        idx = np.floor(o * scale)
    return np.clip(idx, 0, in_size - 1).astype(np.int32)


def _contract_h(nhwc: jax.Array, w: jax.Array) -> jax.Array:
    # (oh, ih) x (n, ih, iw, c) -> (n, oh, iw, c)
    return jnp.einsum("oi,nixc->noxc", w, nhwc, precision=lax.Precision.HIGHEST)


def _contract_w(nhwc: jax.Array, w: jax.Array) -> jax.Array:
    # (ow, iw) x (n, h, iw, c) -> (n, h, ow, c)
    return jnp.einsum("oi,nxic->nxoc", w, nhwc, precision=lax.Precision.HIGHEST)


def resize(
    image: jax.Array,
    size: Sequence[int],
    interpolation: str = "bilinear",
    antialias: bool = True,
) -> jax.Array:
    """Resize to ``size = (height, width)``.

    Reference semantics (``resize``, ``_functional_tensor.py:441-474``):
    antialias only applies to bilinear/bicubic; integer inputs are computed
    in float32 and rounded back; bicubic uint8 results are clamped.
    ``size`` must be static (Python ints) under ``jit``.
    """
    oh, ow = int(size[0]), int(size[1])
    if interpolation in ("nearest", "nearest-exact"):
        nhwc, restore = ensure_nhwc(jnp.asarray(image))
        ih, iw = nhwc.shape[1], nhwc.shape[2]
        exact = interpolation == "nearest-exact"
        if (ih, iw) != (oh, ow):
            hi = jnp.asarray(_nearest_indices(ih, oh, exact))
            wi = jnp.asarray(_nearest_indices(iw, ow, exact))
            nhwc = nhwc[:, hi][:, :, wi]
        return restore(nhwc)

    if interpolation not in ("bilinear", "bicubic"):
        raise ValueError(f"unsupported interpolation {interpolation!r}")

    image = jnp.asarray(image)
    fimg, orig = cast_to_float(image)
    nhwc, restore = ensure_nhwc(fimg)
    ih, iw = nhwc.shape[1], nhwc.shape[2]
    if ih != oh:
        wh = jnp.asarray(resize_weight_matrix(ih, oh, interpolation, antialias))
        nhwc = _contract_h(nhwc, wh)
    if iw != ow:
        ww = jnp.asarray(resize_weight_matrix(iw, ow, interpolation, antialias))
        nhwc = _contract_w(nhwc, ww)
    out = restore(nhwc)
    if interpolation == "bicubic" and is_integer_dtype(orig):
        info = jnp.iinfo(orig)
        out = jnp.clip(out, info.min, info.max)
    return cast_back(out, orig)


def rescale(
    image: jax.Array,
    factor: Union[float, Tuple[float, float]],
    interpolation: str = "bilinear",
    antialias: bool = True,
) -> jax.Array:
    """Resize by a scale factor (output size = floor(in * factor))."""
    fh, fw = (factor, factor) if isinstance(factor, (int, float)) else factor
    nhwc, _ = ensure_nhwc(jnp.asarray(image))
    oh = max(1, int(nhwc.shape[1] * fh))
    ow = max(1, int(nhwc.shape[2] * fw))
    return resize(image, (oh, ow), interpolation, antialias)

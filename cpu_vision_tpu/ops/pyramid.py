"""Gaussian / Laplacian image pyramids (OpenCV-style 5-tap kernel).

North-star config: "4-level Gaussian/Laplacian pyramid + bilinear
resize/warp on batch of 64 RGB 640x480 images" (BASELINE.json).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from .._dtype import cast_back, cast_to_float
from .._layout import ensure_nhwc
from .filters import separable_filter2d
from .resize import resize

__all__ = [
    "pyr_down",
    "pyr_up",
    "gaussian_pyramid",
    "laplacian_pyramid",
    "reconstruct_from_laplacian",
]

# OpenCV pyrDown/pyrUp binomial kernel
_PYR_KERNEL = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _pyr_blur(nhwc: jax.Array) -> jax.Array:
    k = jnp.asarray(_PYR_KERNEL, nhwc.dtype)
    return separable_filter2d(nhwc, k, k, mode="reflect")


def pyr_down(image: jax.Array) -> jax.Array:
    """Blur with the 5-tap binomial kernel, then subsample by 2 (even rows
    and columns) — OpenCV ``pyrDown`` semantics."""
    image = jnp.asarray(image)
    fimg, orig = cast_to_float(image)
    nhwc, restore = ensure_nhwc(fimg)
    blurred = _pyr_blur(nhwc)
    return cast_back(restore(blurred[:, ::2, ::2, :]), orig)


def pyr_up(image: jax.Array, size: Sequence[int] = None) -> jax.Array:
    """Upsample by 2 (zero-stuffing + 4x-gain binomial blur) — OpenCV
    ``pyrUp`` semantics.  ``size`` overrides the output (h, w) to allow
    odd-sized reconstruction."""
    image = jnp.asarray(image)
    fimg, orig = cast_to_float(image)
    nhwc, restore = ensure_nhwc(fimg)
    n, h, w, c = nhwc.shape
    oh, ow = (2 * h, 2 * w) if size is None else (int(size[0]), int(size[1]))
    up = jnp.zeros((n, oh, ow, c), nhwc.dtype)
    up = up.at[:, : 2 * h : 2, : 2 * w : 2, :].set(nhwc[:, : (oh + 1) // 2, : (ow + 1) // 2, :])
    blurred = _pyr_blur(up) * 4.0
    return cast_back(restore(blurred), orig)


def gaussian_pyramid(image: jax.Array, levels: int = 4) -> List[jax.Array]:
    """[level0 = input, level1 = pyr_down(level0), ...] with ``levels`` entries."""
    out = [jnp.asarray(image)]
    for _ in range(levels - 1):
        out.append(pyr_down(out[-1]))
    return out


def laplacian_pyramid(image: jax.Array, levels: int = 4) -> List[jax.Array]:
    """Band-pass pyramid: ``lap[i] = gauss[i] - pyr_up(gauss[i+1])``; the last
    entry is the coarsest Gaussian level.  Float output (band-pass values are
    signed)."""
    fimg, _ = cast_to_float(jnp.asarray(image))
    gauss = gaussian_pyramid(fimg, levels)
    laps = []
    for i in range(levels - 1):
        nhwc, restore = ensure_nhwc(gauss[i])
        up = pyr_up(gauss[i + 1], size=nhwc.shape[1:3])
        up_n, _ = ensure_nhwc(up)
        laps.append(restore(nhwc - up_n))
    laps.append(gauss[-1])
    return laps


def reconstruct_from_laplacian(pyramid: Sequence[jax.Array]) -> jax.Array:
    """Invert ``laplacian_pyramid``."""
    out = jnp.asarray(pyramid[-1])
    for lap in reversed(pyramid[:-1]):
        nhwc, restore = ensure_nhwc(jnp.asarray(lap))
        up = pyr_up(out, size=nhwc.shape[1:3])
        up_n, _ = ensure_nhwc(up)
        out = restore(nhwc + up_n)
    return out

"""Array layout helpers.

Everything in this library is channels-last (NHWC) — the TPU-native layout.
Public kernels accept ``HW``, ``HWC`` or ``NHWC`` arrays; these helpers
normalise to NHWC and restore the caller's rank on the way out.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = ["ensure_nhwc", "num_channels", "spatial_size"]


def ensure_nhwc(image: jax.Array) -> Tuple[jax.Array, Callable[[jax.Array], jax.Array]]:
    """Return ``(nhwc, restore)`` where ``restore`` maps back to the input rank."""
    image = jnp.asarray(image)
    if image.ndim == 2:  # HW -> 1HW1
        return image[None, :, :, None], lambda x: x[0, :, :, 0]
    if image.ndim == 3:  # HWC -> 1HWC
        return image[None], lambda x: x[0]
    if image.ndim == 4:
        return image, lambda x: x
    raise ValueError(f"expected HW, HWC or NHWC array, got shape {image.shape}")


def num_channels(image: jax.Array) -> int:
    if image.ndim == 2:
        return 1
    return image.shape[-1]


def spatial_size(image: jax.Array) -> Tuple[int, int]:
    """(height, width) of an HW / HWC / NHWC image."""
    if image.ndim == 2:
        return image.shape[0], image.shape[1]
    return image.shape[-3], image.shape[-2]

"""Misc class transforms (reference ``transforms/v2/_misc.py`` and
``_meta.py``): Normalize, ToDtype, Lambda, bbox meta ops."""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from . import functional as F  # noqa: N812
from ..tv_arrays import BoundingBoxes, Image, Mask, TVArray, Video
from ._transform import Transform

__all__ = [
    "Normalize",
    "ToDtype",
    "Lambda",
    "Identity",
    "ConvertBoundingBoxFormat",
    "ClampBoundingBoxes",
    "SanitizeBoundingBoxes",
    "ToImage",
    "ToPureArray",
]


class Identity(Transform):
    def _transform(self, inpt, params):
        return inpt


class Lambda(Transform):
    def __init__(self, fn: Callable, *types):
        self.fn = fn
        self.types = types or (object,)

    def _transform(self, inpt, params):
        return self.fn(inpt) if isinstance(inpt, self.types) else inpt


class Normalize(Transform):
    def __init__(self, mean: Sequence[float], std: Sequence[float]):
        self.mean = list(mean)
        self.std = list(std)

    def _transform(self, inpt, params):
        if isinstance(inpt, (BoundingBoxes, Mask)):
            return inpt
        return F.normalize(inpt, self.mean, self.std)


class ToDtype(Transform):
    """Convert dtype with optional value rescale (reference v2 ``ToDtype``).

    ``dtype`` may be a single dtype or a {type: dtype} mapping.
    """

    def __init__(self, dtype, scale: bool = False):
        self.dtype = dtype
        self.scale = scale

    def _transform(self, inpt, params):
        if isinstance(self.dtype, dict):
            for t, dt in self.dtype.items():
                if isinstance(inpt, t):
                    if dt is None:
                        return inpt
                    return F.to_dtype(inpt, dt, self.scale)
            return inpt
        if isinstance(inpt, (BoundingBoxes, Mask)):
            return inpt
        return F.to_dtype(inpt, self.dtype, self.scale)


class ConvertBoundingBoxFormat(Transform):
    def __init__(self, format: str):
        self.format = format

    def _transform(self, inpt, params):
        if isinstance(inpt, BoundingBoxes):
            return F.convert_bounding_box_format(inpt, self.format)
        return inpt


class ClampBoundingBoxes(Transform):
    def _transform(self, inpt, params):
        if isinstance(inpt, BoundingBoxes):
            return F.clamp_bounding_boxes(inpt)
        return inpt


class SanitizeBoundingBoxes(Transform):
    """Zero-out degenerate boxes and (optionally) report the validity mask.

    The reference (``v2/_misc.py:342``) *removes* invalid boxes and their
    labels; with static shapes we instead clamp boxes and zero invalid rows,
    returning the same structure.  Use ``functional.sanitize_bounding_boxes_mask``
    to get the mask for label filtering.
    """

    def __init__(self, min_size: float = 1.0, min_area: float = 1.0):
        self.min_size = min_size
        self.min_area = min_area

    def _transform(self, inpt, params):
        if not isinstance(inpt, BoundingBoxes):
            return inpt
        clamped = F.clamp_bounding_boxes(inpt)
        ok = F.sanitize_bounding_boxes_mask(clamped, self.min_size, self.min_area)
        data = jnp.where(ok[..., None], clamped.data, 0.0)
        return BoundingBoxes(data, clamped.format, tuple(clamped.canvas_size))


class ToImage(Transform):
    """Wrap arrays / PIL images as :class:`Image` (reference v2 ``ToImage``)."""

    def _transform(self, inpt, params):
        import numpy as np

        if isinstance(inpt, TVArray):
            return inpt
        try:
            from PIL import Image as PILImage

            if isinstance(inpt, PILImage.Image):
                return Image(jnp.asarray(np.asarray(inpt)))
        except ImportError:
            pass
        return Image(jnp.asarray(inpt))


class ToPureArray(Transform):
    """Unwrap TV types to plain arrays (reference v2 ``ToPureTensor``)."""

    def _transform(self, inpt, params):
        return inpt.data if isinstance(inpt, TVArray) else inpt

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


class ConvertImageDtype(Transform):
    """Deprecated alias of ``ToDtype(dtype, scale=True)`` (reference v2
    ``_deprecated.py:ConvertImageDtype``)."""

    def __init__(self, dtype=jnp.float32):
        self.dtype = dtype

    def _transform(self, inpt, params):
        if isinstance(inpt, (BoundingBoxes, Mask)):
            return inpt
        return F.to_dtype(inpt, self.dtype, scale=True)


class LinearTransformation(Transform):
    """Whitening transform (reference v2 ``_misc.py:LinearTransformation``):
    flatten the image, subtract ``mean_vector``, multiply by
    ``transformation_matrix`` (D x D where D = H*W*C), reshape back."""

    def __init__(self, transformation_matrix, mean_vector):
        self.transformation_matrix = jnp.asarray(transformation_matrix)
        self.mean_vector = jnp.asarray(mean_vector)
        d = self.transformation_matrix.shape
        if d[0] != d[1]:
            raise ValueError(f"transformation_matrix must be square, got {d}")
        if self.mean_vector.shape[0] != d[0]:
            raise ValueError(
                f"mean_vector should have {d[0]} elements, got {self.mean_vector.shape[0]}")

    def _transform(self, inpt, params):
        if isinstance(inpt, (BoundingBoxes, Mask)):
            return inpt
        arr = inpt.data if isinstance(inpt, TVArray) else inpt
        flat = arr.reshape(-1)
        if flat.shape[0] != self.transformation_matrix.shape[0]:
            raise ValueError(
                f"input has {flat.shape[0]} elements, transformation_matrix is "
                f"{self.transformation_matrix.shape}")
        out = ((flat - self.mean_vector) @ self.transformation_matrix).reshape(arr.shape)
        return type(inpt)(out) if isinstance(inpt, TVArray) else out


class UniformTemporalSubsample(Transform):
    """Evenly pick ``num_samples`` frames along the leading (time) axis of a
    (T, H, W, C) video (reference v2 ``_temporal.py:UniformTemporalSubsample``)."""

    def __init__(self, num_samples: int):
        self.num_samples = num_samples

    def _transform(self, inpt, params):
        if isinstance(inpt, (BoundingBoxes, Mask)):
            return inpt
        arr = inpt.data if isinstance(inpt, TVArray) else inpt
        t = arr.shape[0]
        idx = jnp.linspace(0, t - 1, self.num_samples).round().astype(jnp.int32)
        out = jnp.take(arr, idx, axis=0)
        return type(inpt)(out) if isinstance(inpt, TVArray) else out


class ToTensor(Transform):
    """v1 ``ToTensor`` (reference v2 ``_deprecated.py:ToTensor``): any image
    -> float array scaled to [0, 1].  Layout stays HWC (TPU-native
    channels-last; torch transposes to CHW)."""

    def _transform(self, inpt, params):
        return F.to_tensor(inpt)


class PILToTensor(Transform):
    """PIL -> uint8 array, no scaling (reference v2 ``PILToTensor``); HWC."""

    def _transform(self, inpt, params):
        return F.pil_to_tensor(inpt)


class ToPILImage(Transform):
    """Array -> PIL image (reference v1 ``ToPILImage``): uint8 pass-through,
    floats scaled from [0, 1]."""

    def _transform(self, inpt, params):
        import numpy as np
        from PIL import Image as PILImage

        arr = inpt.data if isinstance(inpt, TVArray) else inpt
        arr = np.asarray(arr)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        return PILImage.fromarray(arr)


ToPureTensor = ToPureArray  # reference name (v2 ``_misc.py:ToPureTensor``)

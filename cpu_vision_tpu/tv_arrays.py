"""Typed vision arrays — the counterpart of the reference's TV tensors
(``torchvision/tv_tensors/``).

JAX arrays cannot be subclassed, so instead of the reference's
``TVTensor(torch.Tensor)`` + ``__torch_function__`` unwrapping
(``tv_tensors/_tv_tensor.py:50-95``), each type is a small pytree-registered
wrapper: the payload is a leaf (traced/sharded/differentiated like any
array), the metadata (bbox format, canvas size) is static aux data — which is
exactly what pytrees are for and composes with jit/vmap/pjit for free.

Types: :class:`Image`, :class:`Video`, :class:`Mask`,
:class:`BoundingBoxes` (+ ``format``/``canvas_size`` metadata, reference
``tv_tensors/_bounding_boxes.py:27``).  ``wrap()`` re-wraps results like the
reference's ``tv_tensors.wrap``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

__all__ = ["TVArray", "Image", "Video", "Mask", "BoundingBoxes", "wrap", "unwrap"]

BBOX_FORMATS = ("xyxy", "xywh", "cxcywh")


class TVArray:
    """Base class for typed vision arrays (marker + shared plumbing)."""

    data: jax.Array

    @property
    def shape(self):
        return jnp.shape(self.data)

    @property
    def dtype(self):
        return jnp.asarray(self.data).dtype

    @property
    def ndim(self):
        return jnp.ndim(self.data)

    def __array__(self, dtype=None):
        import numpy as np

        return np.asarray(self.data, dtype=dtype)

    def __jax_array__(self):
        return jnp.asarray(self.data)


def _register(cls, meta_fields: Tuple[str, ...] = ()):
    def flatten(obj):
        return (obj.data,), tuple(getattr(obj, f) for f in meta_fields)

    def unflatten(aux, children):
        return cls(children[0], *aux)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@dataclasses.dataclass(frozen=True)
class Image(TVArray):
    """An image: HWC or NHWC, channels last."""

    data: Any

    def __repr__(self):
        return f"Image(shape={self.shape}, dtype={self.dtype})"


@dataclasses.dataclass(frozen=True)
class Video(TVArray):
    """A video: NTHWC or THWC."""

    data: Any

    def __repr__(self):
        return f"Video(shape={self.shape}, dtype={self.dtype})"


@dataclasses.dataclass(frozen=True)
class Mask(TVArray):
    """Segmentation or instance mask(s): HW, NHW, or NHWC."""

    data: Any

    def __repr__(self):
        return f"Mask(shape={self.shape}, dtype={self.dtype})"


@dataclasses.dataclass(frozen=True)
class BoundingBoxes(TVArray):
    """Boxes (..., 4) with ``format`` in {xyxy, xywh, cxcywh} and
    ``canvas_size`` (height, width) — reference
    ``tv_tensors/_bounding_boxes.py:27``."""

    data: Any
    format: str = "xyxy"
    canvas_size: Tuple[int, int] = (0, 0)

    def __post_init__(self):
        # accept the reference's uppercase BoundingBoxFormat names too
        # (tv_tensors/_bounding_boxes.py: BoundingBoxFormat.XYXY et al.)
        fmt = str(getattr(self.format, "name", self.format)).lower()
        if fmt != self.format:
            object.__setattr__(self, "format", fmt)
        if self.format not in BBOX_FORMATS:
            raise ValueError(f"format must be one of {BBOX_FORMATS}, got {self.format!r}")

    def __repr__(self):
        return (
            f"BoundingBoxes(shape={self.shape}, format={self.format!r}, "
            f"canvas_size={self.canvas_size})"
        )


_register(Image)
_register(Video)
_register(Mask)
_register(BoundingBoxes, ("format", "canvas_size"))


def wrap(data: jax.Array, like: TVArray, **overrides) -> TVArray:
    """Wrap ``data`` in the same TV type as ``like`` (reference
    ``tv_tensors.wrap``).  Metadata is copied unless overridden."""
    if isinstance(like, BoundingBoxes):
        return BoundingBoxes(
            data,
            overrides.get("format", like.format),
            tuple(overrides.get("canvas_size", like.canvas_size)),
        )
    return type(like)(data)


def unwrap(obj) -> jax.Array:
    return obj.data if isinstance(obj, TVArray) else obj


class BoundingBoxFormat:
    """Box coordinate formats (reference ``tv_tensors.BoundingBoxFormat``
    enum); our string formats are accepted anywhere these constants are."""

    XYXY = "xyxy"
    XYWH = "xywh"
    CXCYWH = "cxcywh"


TVTensor = TVArray  # reference base-class name (``tv_tensors._tv_tensor``)


def set_return_type(return_type: str) -> None:
    """(reference ``tv_tensors.set_return_type``): controls whether torch ops
    on TV tensors return the subclass or plain tensors.  JAX arrays are
    immutable pytree leaves and our wrappers are static dataclasses, so ops
    always return plain arrays ("Tensor" mode) — the only behavior here;
    "TVTensor" mode is not representable and raises."""
    if return_type not in ("Tensor", "TVTensor"):
        raise ValueError(f"return_type must be 'Tensor' or 'TVTensor', got {return_type!r}")
    if return_type == "TVTensor":
        raise NotImplementedError(
            "jax ops always unwrap to plain arrays; re-wrap with tv_arrays.wrap")


__all__ += ["BoundingBoxFormat", "TVTensor", "set_return_type"]

"""Transform base class.

Mirrors the reference v2 ``Transform`` (``transforms/v2/_transform.py:40-87``):
``__call__`` pytree-flattens the input, samples parameters once, and applies
``_transform`` to every transformable leaf — so an (image, boxes, mask) dict
is augmented consistently.

API departure from the reference (necessary in JAX): randomness comes from
an explicit ``key`` argument (``t(sample, key=...)``) instead of torch's
global RNG.  Deterministic transforms ignore the key.  ``RNG-less`` calls of
random transforms raise.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..tv_arrays import BoundingBoxes, Image, Mask, TVArray, Video

__all__ = ["Transform"]


def _is_leaf(x) -> bool:
    return isinstance(x, TVArray)


def _is_transformable(x) -> bool:
    if isinstance(x, TVArray):
        return True
    if isinstance(x, (jax.Array, jnp.ndarray)):
        return True
    import numpy as np

    if isinstance(x, np.ndarray):
        return True
    try:  # PIL inputs (ToTensor / PILToTensor / ToImage interop tier)
        from PIL import Image as PILImage

        return isinstance(x, PILImage.Image)
    except ImportError:  # pragma: no cover
        return False


class Transform:
    """Base class.  Subclasses implement ``_transform(leaf, params)`` and
    optionally ``_get_params(flat_inputs, key)``."""

    _needs_key = False  # random transforms set True

    def _get_params(self, flat_inputs: List[Any], key: Optional[jax.Array]) -> Dict[str, Any]:
        return {}

    def _transform(self, inpt: Any, params: Dict[str, Any]) -> Any:
        raise NotImplementedError

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        if self._needs_key and key is None:
            raise ValueError(
                f"{type(self).__name__} is random: pass a PRNG key, e.g. "
                f"t(sample, key=jax.random.PRNGKey(0))"
            )
        flat, spec = jax.tree.flatten(sample, is_leaf=_is_leaf)
        params = self._get_params(flat, key)
        out = [
            self._transform(leaf, params) if _is_transformable(leaf) else leaf
            for leaf in flat
        ]
        return jax.tree.unflatten(spec, out)

    def __repr__(self):
        return f"{type(self).__name__}()"


def query_size(flat_inputs) -> tuple:
    """(height, width) from the first sized leaf (reference ``query_size``)."""
    from .functional import get_size

    for leaf in flat_inputs:
        if _is_transformable(leaf):
            return get_size(leaf)
    raise ValueError("no sized input found")


def query_channels(flat_inputs) -> int:
    for leaf in flat_inputs:
        if isinstance(leaf, (Image, Video)):
            return leaf.shape[-1]
        if not isinstance(leaf, TVArray) and _is_transformable(leaf):
            arr = jnp.asarray(leaf)
            return arr.shape[-1] if arr.ndim >= 3 else 1
    raise ValueError("no image/video input found")

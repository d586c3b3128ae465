"""Typed kernel registry + dispatch.

Clone of the reference's v2 dispatch machinery
(``transforms/v2/functional/_utils.py:16-118``): a two-level dict
``{functional: {input_type: kernel}}``, an MRO walk on lookup, and a public
``register_kernel`` for user types.  Plain ``jax.Array``/NumPy inputs
dispatch as :class:`~cpu_vision_tpu.tv_arrays.Image`.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..tv_arrays import BoundingBoxes, Image, Mask, TVArray, Video, wrap

_KERNEL_REGISTRY: Dict[Callable, Dict[type, Callable]] = {}


def _kernel_table(functional: Callable) -> Dict[type, Callable]:
    return _KERNEL_REGISTRY.setdefault(functional, {})


def register_kernel(functional: Callable, tv_type: type):
    """Decorator: register ``kernel`` for ``functional`` on ``tv_type``
    (reference ``register_kernel``, ``_utils.py:69``)."""

    def decorator(kernel):
        _kernel_table(functional)[tv_type] = kernel
        return kernel

    return decorator


def _get_kernel(functional: Callable, tv_type: type) -> Callable:
    """MRO-walking lookup (reference ``_get_kernel``, ``_utils.py:98-118``)."""
    table = _KERNEL_REGISTRY.get(functional, {})
    for cls in tv_type.__mro__:
        if cls in table:
            return table[cls]
    # passthrough for unregistered TV types (reference allow_passthrough)
    return None


def dispatch(functional: Callable) -> Callable:
    """Wrap a functional: dispatch on the input's TV type.

    * plain arrays (jax/numpy) -> the Image kernel, returned unwrapped
    * TV types -> their kernel, result re-wrapped (metadata preserved unless
      the kernel returns a TV type itself)
    * TV types without a kernel -> passthrough unchanged
    """

    @functools.wraps(functional)
    def wrapper(inpt, *args, **kwargs):
        if isinstance(inpt, TVArray):
            kernel = _get_kernel(wrapper, type(inpt))
            if kernel is None:
                return inpt
            out = kernel(inpt, *args, **kwargs)
            return out if isinstance(out, TVArray) else wrap(out, inpt)
        kernel = _get_kernel(wrapper, Image)
        if kernel is None:
            raise TypeError(f"{functional.__name__} has no Image kernel")
        out = kernel(Image(jnp.asarray(inpt)), *args, **kwargs)
        return out.data if isinstance(out, TVArray) else out

    wrapper._is_typed_functional = True
    return wrapper

"""Image dtype protocol.

TPU-native convention: images are NHWC (or HWC / HW) arrays, uint8 "at rest",
float32/bfloat16 in compute.  Integer-typed inputs to float-domain kernels are
cast to float32, processed, rounded, clipped and cast back — reproducing the
reference's cast/round protocol (reference: torchvision
``transforms/_functional_tensor.py:516-542`` ``_cast_squeeze_in/_cast_squeeze_out``)
so uint8 outputs match the reference bit-for-bit.

``to_dtype`` implements the value-scale conversion rules of the reference's
``transforms/v2/functional/_misc.py:250-309`` (``to_dtype_image``).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "max_value",
    "is_integer_dtype",
    "compute_dtype",
    "cast_to_float",
    "cast_back",
    "float_kernel",
    "to_dtype",
]

# Number of value bits for the integer image dtypes we support.
_NUM_VALUE_BITS = {
    jnp.dtype(jnp.uint8): 8,
    jnp.dtype(jnp.int8): 7,
    jnp.dtype(jnp.int16): 15,
    jnp.dtype(jnp.uint16): 16,
    jnp.dtype(jnp.int32): 31,
    jnp.dtype(jnp.uint32): 32,
    jnp.dtype(jnp.int64): 63,
}


def is_integer_dtype(dtype) -> bool:
    return jnp.issubdtype(jnp.dtype(dtype), jnp.integer)


def max_value(dtype) -> float:
    """Maximum representable value of an image dtype (1.0 for floats)."""
    dtype = jnp.dtype(dtype)
    if is_integer_dtype(dtype):
        return float(2 ** _NUM_VALUE_BITS[dtype] - 1)
    return 1.0


def compute_dtype(dtype):
    """The float dtype a kernel computes in for a given storage dtype."""
    dtype = jnp.dtype(dtype)
    if jnp.issubdtype(dtype, jnp.floating):
        return dtype
    return jnp.dtype(jnp.float32)


def cast_to_float(image: jax.Array, dtype=None):
    """Cast an image to its compute dtype.  Returns (float_image, orig_dtype).

    No value rescaling — matches the reference protocol, which convolves uint8
    values in the 0..255 range as float32.
    """
    orig = image.dtype
    tgt = compute_dtype(orig) if dtype is None else jnp.dtype(dtype)
    if orig != tgt:
        image = image.astype(tgt)
    return image, orig


def cast_back(image: jax.Array, orig_dtype) -> jax.Array:
    """Round (for integer targets), clip to the dtype range, and cast back."""
    orig_dtype = jnp.dtype(orig_dtype)
    if image.dtype == orig_dtype:
        return image
    if is_integer_dtype(orig_dtype):
        image = jnp.round(image)
        info = jnp.iinfo(orig_dtype)
        image = jnp.clip(image, info.min, info.max)
    return image.astype(orig_dtype)


def float_kernel(fn: Callable) -> Callable:
    """Decorator: run ``fn`` in float compute dtype, cast result back.

    The wrapped kernel receives a float image as its first argument and may
    return either a single array or a pytree of arrays (all cast back).
    """

    @functools.wraps(fn)
    def wrapper(image, *args, **kwargs):
        image = jnp.asarray(image)
        fimg, orig = cast_to_float(image)
        out = fn(fimg, *args, **kwargs)
        return jax.tree.map(lambda o: cast_back(o, orig), out)

    return wrapper


def to_dtype(image: jax.Array, dtype, scale: bool = True) -> jax.Array:
    """Convert an image between dtypes, rescaling values when ``scale``.

    Reference semantics: ``to_dtype_image``
    (torchvision ``transforms/v2/functional/_misc.py:250-309``):

    * float -> float: plain cast.
    * float -> int:   ``img * (max+1-eps)`` then truncating cast.
    * int -> float:   cast then ``* 1/max``.
    * int -> int:     bit-shift by the difference in value bits.
    """
    image = jnp.asarray(image)
    src = jnp.dtype(image.dtype)
    dst = jnp.dtype(dtype)
    if src == dst:
        return image
    if not scale:
        if is_integer_dtype(dst) and jnp.issubdtype(src, jnp.floating):
            return cast_back(image, dst)
        return image.astype(dst)

    float_src = jnp.issubdtype(src, jnp.floating)
    float_dst = jnp.issubdtype(dst, jnp.floating)

    if float_src and float_dst:
        return image.astype(dst)

    if float_src:
        # float -> int.  eps keeps 1.0 from overflowing to max+1.
        num_bits = _NUM_VALUE_BITS[dst]
        eps = 1e-3
        scale_v = float(2**num_bits) - eps
        return (image * scale_v).astype(dst)

    if float_dst:
        return image.astype(dst) * (1.0 / max_value(src))

    # int -> int via bit shift (exact, matches the reference).
    bits_src = _NUM_VALUE_BITS[src]
    bits_dst = _NUM_VALUE_BITS[dst]
    if bits_src > bits_dst:
        return (image >> (bits_src - bits_dst)).astype(dst)
    return image.astype(dst) << (bits_dst - bits_src)

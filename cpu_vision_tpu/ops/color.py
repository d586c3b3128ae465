"""Color / intensity ops with reference parity.

Reference: torchvision ``transforms/_functional_tensor.py`` —
``rgb_to_grayscale`` (:151-168), ``adjust_brightness/contrast/saturation/hue/
gamma`` (:171-255), ``_blend`` (:258-261), ``_rgb2hsv``/``_hsv2rgb``
(:264-321), ``invert/posterize/solarize`` (:767-806), ``autocontrast``
(:841-860), ``equalize`` (:863-902), ``normalize`` (:905+).

All ops are channels-last (HWC / NHWC) and jit/vmap-friendly: the histogram
in ``equalize`` uses a fixed 256-bin one-hot sum rather than data-dependent
shapes.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .._dtype import cast_back, cast_to_float, is_integer_dtype, max_value, to_dtype
from .._layout import ensure_nhwc, num_channels

__all__ = [
    "rgb_to_grayscale",
    "grayscale_to_rgb",
    "rgb_to_hsv",
    "hsv_to_rgb",
    "adjust_brightness",
    "adjust_contrast",
    "adjust_saturation",
    "adjust_hue",
    "adjust_gamma",
    "invert",
    "posterize",
    "solarize",
    "autocontrast",
    "equalize",
    "normalize",
    "blend",
]


def blend(img1: jax.Array, img2: jax.Array, ratio: float) -> jax.Array:
    """``ratio * img1 + (1 - ratio) * img2`` clamped to the dtype range
    (reference ``_blend``, ``:258-261``)."""
    ratio = float(ratio)
    bound = max_value(img1.dtype)
    f1, orig = cast_to_float(img1)
    f2, _ = cast_to_float(jnp.asarray(img2))
    return cast_back(jnp.clip(ratio * f1 + (1.0 - ratio) * f2, 0, bound), orig)


def rgb_to_grayscale(image: jax.Array, num_output_channels: int = 1) -> jax.Array:
    """ITU-R 601-2 luma (reference ``rgb_to_grayscale``, ``:151-168``);
    uint8 results are rounded via the cast-back protocol."""
    image = jnp.asarray(image)
    c = num_channels(image)
    if c == 1:
        l_img = image if image.ndim == 2 else image
        if image.ndim == 2:
            l_img = image[..., None]
    else:
        fimg, orig = cast_to_float(image)
        r, g, b = fimg[..., 0], fimg[..., 1], fimg[..., 2]
        l_img = cast_back(0.2989 * r + 0.587 * g + 0.114 * b, orig)[..., None]
    if num_output_channels == 3:
        l_img = jnp.repeat(l_img, 3, axis=-1)
    return l_img


def grayscale_to_rgb(image: jax.Array) -> jax.Array:
    image = jnp.asarray(image)
    if image.ndim == 2:
        image = image[..., None]
    return jnp.repeat(image, 3, axis=-1) if image.shape[-1] == 1 else image


def rgb_to_hsv(image: jax.Array) -> jax.Array:
    """Float RGB (..., 3) in [0,1] -> HSV, reference ``_rgb2hsv`` (:264-300)."""
    r, g, b = image[..., 0], image[..., 1], image[..., 2]
    maxc = jnp.max(image, axis=-1)
    minc = jnp.min(image, axis=-1)
    eqc = maxc == minc
    cr = maxc - minc
    ones = jnp.ones_like(maxc)
    s = cr / jnp.where(eqc, ones, maxc)
    cr_div = jnp.where(eqc, ones, cr)
    rc = (maxc - r) / cr_div
    gc = (maxc - g) / cr_div
    bc = (maxc - b) / cr_div
    hr = (maxc == r) * (bc - gc)
    hg = ((maxc == g) & (maxc != r)) * (2.0 + rc - bc)
    hb = ((maxc != g) & (maxc != r)) * (4.0 + gc - rc)
    h = hr + hg + hb
    h = jnp.mod(h / 6.0 + 1.0, 1.0)
    return jnp.stack([h, s, maxc], axis=-1)


def hsv_to_rgb(image: jax.Array) -> jax.Array:
    """Float HSV (..., 3) -> RGB, reference ``_hsv2rgb`` (:303-321)."""
    h, s, v = image[..., 0], image[..., 1], image[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    i = i.astype(jnp.int32) % 6
    p = jnp.clip(v * (1.0 - s), 0.0, 1.0)
    q = jnp.clip(v * (1.0 - s * f), 0.0, 1.0)
    t = jnp.clip(v * (1.0 - s * (1.0 - f)), 0.0, 1.0)
    # select per sextant
    a1 = jnp.stack([v, q, p, p, t, v], axis=-1)
    a2 = jnp.stack([t, v, v, q, p, p], axis=-1)
    a3 = jnp.stack([p, p, t, v, v, q], axis=-1)
    onehot = jax.nn.one_hot(i, 6, dtype=image.dtype)
    r = jnp.sum(a1 * onehot, axis=-1)
    g = jnp.sum(a2 * onehot, axis=-1)
    b = jnp.sum(a3 * onehot, axis=-1)
    return jnp.stack([r, g, b], axis=-1)


def adjust_brightness(image: jax.Array, brightness_factor: float) -> jax.Array:
    if brightness_factor < 0:
        raise ValueError("brightness_factor must be non-negative")
    return blend(image, jnp.zeros_like(image), brightness_factor)


def adjust_contrast(image: jax.Array, contrast_factor: float) -> jax.Array:
    if contrast_factor < 0:
        raise ValueError("contrast_factor must be non-negative")
    image = jnp.asarray(image)
    c = num_channels(image)
    fimg, _ = cast_to_float(image)
    if c == 3:
        gray = 0.2989 * fimg[..., 0] + 0.587 * fimg[..., 1] + 0.114 * fimg[..., 2]
        if is_integer_dtype(image.dtype):
            gray = jnp.round(gray)  # reference greys through rgb_to_grayscale's round
    else:
        gray = fimg[..., 0] if fimg.ndim >= 3 else fimg
    # per-image mean over H, W (and channels — grayscale is single-channel)
    axes = tuple(range(gray.ndim - 2, gray.ndim))
    mean = jnp.mean(gray, axis=axes, keepdims=True)[..., None]
    return blend(image, jnp.broadcast_to(mean, fimg.shape), contrast_factor)


def adjust_saturation(image: jax.Array, saturation_factor: float) -> jax.Array:
    if saturation_factor < 0:
        raise ValueError("saturation_factor must be non-negative")
    image = jnp.asarray(image)
    if num_channels(image) == 1:
        return image
    return blend(image, rgb_to_grayscale(image, num_output_channels=3), saturation_factor)


def adjust_hue(image: jax.Array, hue_factor: float) -> jax.Array:
    if not -0.5 <= hue_factor <= 0.5:
        raise ValueError("hue_factor must be in [-0.5, 0.5]")
    image = jnp.asarray(image)
    if num_channels(image) == 1:
        return image
    orig = image.dtype
    fimg = to_dtype(image, jnp.float32, scale=True)
    hsv = rgb_to_hsv(fimg)
    h = jnp.mod(hsv[..., 0] + hue_factor, 1.0)
    rgb = hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))
    return to_dtype(rgb, orig, scale=True)


def adjust_gamma(image: jax.Array, gamma: float, gain: float = 1.0) -> jax.Array:
    if gamma < 0:
        raise ValueError("gamma must be non-negative")
    image = jnp.asarray(image)
    orig = image.dtype
    fimg = to_dtype(image, jnp.float32, scale=True)
    out = jnp.clip(gain * fimg**gamma, 0.0, 1.0)
    return to_dtype(out, orig, scale=True)


def invert(image: jax.Array) -> jax.Array:
    """``max - img`` (reference ``invert``, ``:767-776``)."""
    image = jnp.asarray(image)
    bound = max_value(image.dtype)
    if is_integer_dtype(image.dtype):
        return (jnp.asarray(bound, image.dtype) - image).astype(image.dtype)
    return bound - image


def posterize(image: jax.Array, bits: int) -> jax.Array:
    """Keep the top ``bits`` bits (reference uint8 path ``:779-790``; float
    path = quantise to ``2**bits`` levels, v2 ``_color.py:462-472``)."""
    image = jnp.asarray(image)
    if jnp.issubdtype(image.dtype, jnp.floating):
        levels = 1 << bits
        return jnp.clip(jnp.floor(image * levels), 0, levels - 1) * (1.0 / levels)
    if image.dtype != jnp.uint8:
        raise TypeError("posterize expects uint8 or float")
    mask = jnp.uint8(256 - 2 ** (8 - bits)) if bits < 8 else jnp.uint8(255)
    return image & mask


def solarize(image: jax.Array, threshold: float) -> jax.Array:
    """Invert pixels >= threshold (reference ``:793-806``)."""
    image = jnp.asarray(image)
    return jnp.where(image >= jnp.asarray(threshold, image.dtype), invert(image), image)


def autocontrast(image: jax.Array) -> jax.Array:
    """Per-image/channel linear stretch to the full range (reference
    ``:841-860``)."""
    image = jnp.asarray(image)
    bound = max_value(image.dtype)
    fimg, orig = cast_to_float(image)
    nhwc, restore = ensure_nhwc(fimg)
    minimum = jnp.min(nhwc, axis=(1, 2), keepdims=True)
    maximum = jnp.max(nhwc, axis=(1, 2), keepdims=True)
    eq = maximum == minimum
    scale = bound / jnp.where(eq, 1.0, maximum - minimum)
    minimum = jnp.where(eq, 0.0, minimum)
    scale = jnp.where(eq, 1.0, scale)
    out = jnp.clip((nhwc - minimum) * scale, 0, bound)
    return cast_back(restore(out), orig)


def _equalize_channel(chan: jax.Array) -> jax.Array:
    """Equalize one uint8 (H, W) channel — reference ``_scale_channel``
    (:863-881) with fixed shapes: 256-bin histogram via one-hot sum."""
    flat = chan.reshape(-1).astype(jnp.int32)
    hist = jnp.zeros((256,), jnp.int32).at[flat].add(1)
    nonzero = hist != 0
    # value of the last nonzero bin
    idx = jnp.arange(256)
    last_nz = jnp.max(jnp.where(nonzero, idx, -1))
    last_val = hist[jnp.maximum(last_nz, 0)]
    step = (jnp.sum(hist) - last_val) // 255
    cum = jnp.cumsum(hist)
    lut = (cum + step // 2) // jnp.maximum(step, 1)
    lut = jnp.clip(jnp.concatenate([jnp.zeros((1,), lut.dtype), lut[:-1]]), 0, 255)
    out = lut[flat].astype(jnp.uint8).reshape(chan.shape)
    return jnp.where(step == 0, chan, out)


def equalize(image: jax.Array) -> jax.Array:
    """Histogram equalisation for uint8 images (reference ``equalize``,
    ``:888-902``)."""
    image = jnp.asarray(image)
    if image.dtype != jnp.uint8:
        raise TypeError("equalize expects uint8")
    nhwc, restore = ensure_nhwc(image)
    out = jax.vmap(jax.vmap(_equalize_channel, in_axes=-1, out_axes=-1))(nhwc)
    return restore(out)


def normalize(
    image: jax.Array,
    mean: Sequence[float],
    std: Sequence[float],
) -> jax.Array:
    """Channel-wise ``(img - mean) / std`` for float images (reference
    ``normalize``, ``:905+``).  Channels-last."""
    image = jnp.asarray(image)
    if is_integer_dtype(image.dtype):
        raise TypeError("normalize expects a float image; use to_dtype first")
    mean_a = jnp.asarray(mean, image.dtype).reshape(1, 1, -1)
    std_a = jnp.asarray(std, image.dtype).reshape(1, 1, -1)
    return (image - mean_a) / std_a

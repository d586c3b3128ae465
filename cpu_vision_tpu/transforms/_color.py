"""Color class transforms (reference ``transforms/v2/_color.py``)."""

from __future__ import annotations

from typing import Tuple, Union

import jax
import numpy as np

from . import functional as F  # noqa: N812
from ._transform import Transform, query_channels

__all__ = [
    "ColorJitter",
    "Grayscale",
    "RandomGrayscale",
    "GaussianBlur",
    "GaussianNoise",
    "RandomInvert",
    "RandomPosterize",
    "RandomSolarize",
    "RandomAutocontrast",
    "RandomEqualize",
    "RandomAdjustSharpness",
    "RandomChannelPermutation",
    "RandomPhotometricDistort",
]


def _u(key, lo, hi):
    return float(jax.random.uniform(key)) * (hi - lo) + lo


class _RandomApplyOp(Transform):
    """Apply a functional with probability p (base for Random* color ops)."""

    _needs_key = True
    p: float = 0.5

    def _get_params(self, flat, key):
        return {"apply": float(jax.random.uniform(key)) < self.p}

    def _op(self, inpt):
        raise NotImplementedError

    def _transform(self, inpt, params):
        return self._op(inpt) if params["apply"] else inpt


class RandomInvert(_RandomApplyOp):
    def __init__(self, p: float = 0.5):
        self.p = p

    def _op(self, inpt):
        return F.invert(inpt)


class RandomAutocontrast(_RandomApplyOp):
    def __init__(self, p: float = 0.5):
        self.p = p

    def _op(self, inpt):
        return F.autocontrast(inpt)


class RandomEqualize(_RandomApplyOp):
    def __init__(self, p: float = 0.5):
        self.p = p

    def _op(self, inpt):
        return F.equalize(inpt)


class RandomPosterize(_RandomApplyOp):
    def __init__(self, bits: int, p: float = 0.5):
        self.bits = bits
        self.p = p

    def _op(self, inpt):
        return F.posterize(inpt, self.bits)


class RandomSolarize(_RandomApplyOp):
    def __init__(self, threshold: float, p: float = 0.5):
        self.threshold = threshold
        self.p = p

    def _op(self, inpt):
        return F.solarize(inpt, self.threshold)


class RandomAdjustSharpness(_RandomApplyOp):
    def __init__(self, sharpness_factor: float, p: float = 0.5):
        self.sharpness_factor = sharpness_factor
        self.p = p

    def _op(self, inpt):
        return F.adjust_sharpness(inpt, self.sharpness_factor)


class Grayscale(Transform):
    def __init__(self, num_output_channels: int = 1):
        self.num_output_channels = num_output_channels

    def _transform(self, inpt, params):
        return F.rgb_to_grayscale(inpt, self.num_output_channels)


class RandomGrayscale(_RandomApplyOp):
    def __init__(self, p: float = 0.1):
        self.p = p

    def _op(self, inpt):
        return F.rgb_to_grayscale(inpt, num_output_channels=3)


class GaussianBlur(Transform):
    """Blur with sigma ~ U[lo, hi] (reference v2 ``GaussianBlur._get_params``,
    ``v2/_misc.py:168``)."""

    _needs_key = True

    def __init__(self, kernel_size, sigma: Union[float, Tuple[float, float]] = (0.1, 2.0)):
        self.kernel_size = kernel_size
        self.sigma = (sigma, sigma) if isinstance(sigma, (int, float)) else tuple(sigma)

    def _get_params(self, flat, key):
        return {"sigma": _u(key, *self.sigma)}

    def _transform(self, inpt, params):
        return F.gaussian_blur(inpt, self.kernel_size, params["sigma"])


class GaussianNoise(Transform):
    _needs_key = True

    def __init__(self, mean: float = 0.0, sigma: float = 0.1, clip: bool = True):
        self.mean = mean
        self.sigma = sigma
        self.clip = clip

    def _get_params(self, flat, key):
        return {"key": key}

    def _transform(self, inpt, params):
        return F.gaussian_noise(inpt, params["key"], self.mean, self.sigma, self.clip)


class ColorJitter(Transform):
    """Random brightness/contrast/saturation/hue in random order (reference
    v1 ``ColorJitter``, ``transforms.py:1150``)."""

    _needs_key = True

    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0):
        self.brightness = self._range(brightness, "brightness")
        self.contrast = self._range(contrast, "contrast")
        self.saturation = self._range(saturation, "saturation")
        self.hue = self._range(hue, "hue", center=0.0, bound=0.5)

    @staticmethod
    def _range(value, name, center=1.0, bound=None):
        if isinstance(value, (int, float)):
            if value == 0:
                return None
            lo, hi = center - value, center + value
            lo = max(lo, 0.0)
        else:
            lo, hi = value
        if bound is not None:
            lo, hi = max(lo, -bound), min(hi, bound)
        return (lo, hi)

    def _get_params(self, flat, key):
        keys = jax.random.split(key, 5)
        order = np.asarray(jax.random.permutation(keys[0], 4))
        return {
            "order": order.tolist(),
            "brightness": _u(keys[1], *self.brightness) if self.brightness else None,
            "contrast": _u(keys[2], *self.contrast) if self.contrast else None,
            "saturation": _u(keys[3], *self.saturation) if self.saturation else None,
            "hue": _u(keys[4], *self.hue) if self.hue else None,
        }

    def _transform(self, inpt, params):
        for idx in params["order"]:
            if idx == 0 and params["brightness"] is not None:
                inpt = F.adjust_brightness(inpt, params["brightness"])
            elif idx == 1 and params["contrast"] is not None:
                inpt = F.adjust_contrast(inpt, params["contrast"])
            elif idx == 2 and params["saturation"] is not None:
                inpt = F.adjust_saturation(inpt, params["saturation"])
            elif idx == 3 and params["hue"] is not None:
                inpt = F.adjust_hue(inpt, params["hue"])
        return inpt


class RandomChannelPermutation(Transform):
    _needs_key = True

    def _get_params(self, flat, key):
        c = query_channels(flat)
        return {"perm": np.asarray(jax.random.permutation(key, c)).tolist()}

    def _transform(self, inpt, params):
        from ..tv_arrays import BoundingBoxes, Mask, TVArray, wrap

        if isinstance(inpt, (BoundingBoxes, Mask)):
            return inpt
        import jax.numpy as jnp

        data = inpt.data if isinstance(inpt, TVArray) else jnp.asarray(inpt)
        out = data[..., jnp.asarray(params["perm"])]
        return wrap(out, inpt) if isinstance(inpt, TVArray) else out


class RandomPhotometricDistort(Transform):
    """SSD-style photometric distortion (reference v2
    ``RandomPhotometricDistort``, ``_color.py``)."""

    _needs_key = True

    def __init__(self, brightness=(0.875, 1.125), contrast=(0.5, 1.5),
                 saturation=(0.5, 1.5), hue=(-0.05, 0.05), p: float = 0.5):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.p = p

    def _get_params(self, flat, key):
        keys = jax.random.split(key, 10)
        coin = lambda k: float(jax.random.uniform(k)) < self.p  # noqa: E731
        return {
            "brightness": _u(keys[0], *self.brightness) if coin(keys[1]) else None,
            "contrast": _u(keys[2], *self.contrast) if coin(keys[3]) else None,
            "contrast_before": coin(keys[4]),
            "saturation": _u(keys[5], *self.saturation) if coin(keys[6]) else None,
            "hue": _u(keys[7], *self.hue) if coin(keys[8]) else None,
        }

    def _transform(self, inpt, params):
        if params["brightness"] is not None:
            inpt = F.adjust_brightness(inpt, params["brightness"])
        if params["contrast_before"] and params["contrast"] is not None:
            inpt = F.adjust_contrast(inpt, params["contrast"])
        if params["saturation"] is not None:
            inpt = F.adjust_saturation(inpt, params["saturation"])
        if params["hue"] is not None:
            inpt = F.adjust_hue(inpt, params["hue"])
        if not params["contrast_before"] and params["contrast"] is not None:
            inpt = F.adjust_contrast(inpt, params["contrast"])
        return inpt


class RGB(Transform):
    """Convert to 3-channel RGB (reference v2 ``_color.py:RGB``): grayscale
    inputs are channel-repeated, RGB passes through."""

    def _transform(self, inpt, params):
        import jax.numpy as jnp

        arr = inpt.data if hasattr(inpt, "data") else inpt
        if arr.shape[-1] == 3:
            return inpt
        if arr.shape[-1] == 1:
            out = jnp.repeat(arr, 3, axis=-1)
            return type(inpt)(out) if hasattr(inpt, "data") else out
        raise ValueError(f"expected 1 or 3 channels, got {arr.shape[-1]}")

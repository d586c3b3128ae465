"""AutoAugment family: AutoAugment, RandAugment, TrivialAugmentWide, AugMix.

Reference: ``torchvision/transforms/autoaugment.py`` (the policy tables are
the published constants from the AutoAugment/RandAugment/TrivialAugment/
AugMix papers; the magnitude spaces match ``_augmentation_space`` at
``autoaugment.py:223-240, 321-338, 407-424, 552-575``).

Randomness from explicit PRNG keys; ops run on uint8 or float images
(Solarize thresholds scale with the image dtype's max value).
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import numpy as np

from . import functional as F  # noqa: N812
from .._dtype import max_value
from ..tv_arrays import BoundingBoxes, Mask, TVArray
from ._transform import Transform, query_size

__all__ = ["AutoAugment", "RandAugment", "TrivialAugmentWide", "AugMix"]


def _apply_op(img, op_name: str, magnitude: float, interpolation: str, fill):
    """Reference ``_apply_op`` (``autoaugment.py:13-90``)."""
    if op_name == "ShearX":
        return F.affine(img, 0.0, (0, 0), 1.0,
                        (math.degrees(math.atan(magnitude)), 0.0),
                        interpolation, fill, center=(0, 0))
    if op_name == "ShearY":
        return F.affine(img, 0.0, (0, 0), 1.0,
                        (0.0, math.degrees(math.atan(magnitude))),
                        interpolation, fill, center=(0, 0))
    if op_name == "TranslateX":
        return F.affine(img, 0.0, (int(magnitude), 0), 1.0, (0.0, 0.0), interpolation, fill)
    if op_name == "TranslateY":
        return F.affine(img, 0.0, (0, int(magnitude)), 1.0, (0.0, 0.0), interpolation, fill)
    if op_name == "Rotate":
        return F.rotate(img, magnitude, interpolation, fill=fill)
    if op_name == "Brightness":
        return F.adjust_brightness(img, 1.0 + magnitude)
    if op_name == "Color":
        return F.adjust_saturation(img, 1.0 + magnitude)
    if op_name == "Contrast":
        return F.adjust_contrast(img, 1.0 + magnitude)
    if op_name == "Sharpness":
        return F.adjust_sharpness(img, 1.0 + magnitude)
    if op_name == "Posterize":
        return F.posterize(img, int(magnitude))
    if op_name == "Solarize":
        return F.solarize(img, magnitude)
    if op_name == "AutoContrast":
        return F.autocontrast(img)
    if op_name == "Equalize":
        return F.equalize(img)
    if op_name == "Invert":
        return F.invert(img)
    if op_name == "Identity":
        return img
    raise ValueError(f"unknown op {op_name!r}")


def _scale_solarize(img, magnitude):
    """Reference thresholds are on the 0..255 scale; rescale for floats."""
    from ..tv_arrays import TVArray

    dtype = img.dtype if isinstance(img, TVArray) else np.asarray(img).dtype if not hasattr(img, "dtype") else img.dtype
    return magnitude / 255.0 * max_value(dtype)


class _AutoAugmentBase(Transform):
    _needs_key = True

    def __init__(self, interpolation: str = "nearest", fill=None):
        self.interpolation = interpolation
        self.fill = fill

    def _apply(self, img, op_name, magnitude):
        if isinstance(img, (BoundingBoxes, Mask)):
            return img
        if op_name == "Solarize":
            magnitude = _scale_solarize(img, magnitude)
        return _apply_op(img, op_name, magnitude, self.interpolation, self.fill)


def _space_autoaugment(num_bins: int, size: Tuple[int, int]) -> Dict[str, Tuple[np.ndarray, bool]]:
    h, w = size
    return {
        "ShearX": (np.linspace(0.0, 0.3, num_bins), True),
        "ShearY": (np.linspace(0.0, 0.3, num_bins), True),
        "TranslateX": (np.linspace(0.0, 150.0 / 331.0 * w, num_bins), True),
        "TranslateY": (np.linspace(0.0, 150.0 / 331.0 * h, num_bins), True),
        "Rotate": (np.linspace(0.0, 30.0, num_bins), True),
        "Brightness": (np.linspace(0.0, 0.9, num_bins), True),
        "Color": (np.linspace(0.0, 0.9, num_bins), True),
        "Contrast": (np.linspace(0.0, 0.9, num_bins), True),
        "Sharpness": (np.linspace(0.0, 0.9, num_bins), True),
        "Posterize": (8 - np.round(np.arange(num_bins) / ((num_bins - 1) / 4)), False),
        "Solarize": (np.linspace(255.0, 0.0, num_bins), False),
        "AutoContrast": (np.array([0.0]), False),
        "Equalize": (np.array([0.0]), False),
        "Invert": (np.array([0.0]), False),
    }


_IMAGENET_POLICY = [
    (("Posterize", 0.4, 8), ("Rotate", 0.6, 9)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, None)),
    (("Equalize", 0.8, None), ("Equalize", 0.6, None)),
    (("Posterize", 0.6, 7), ("Posterize", 0.6, 6)),
    (("Equalize", 0.4, None), ("Solarize", 0.2, 4)),
    (("Equalize", 0.4, None), ("Rotate", 0.8, 8)),
    (("Solarize", 0.6, 3), ("Equalize", 0.6, None)),
    (("Posterize", 0.8, 5), ("Equalize", 1.0, None)),
    (("Rotate", 0.2, 3), ("Solarize", 0.6, 8)),
    (("Equalize", 0.6, None), ("Posterize", 0.4, 6)),
    (("Rotate", 0.8, 8), ("Color", 0.4, 0)),
    (("Rotate", 0.4, 9), ("Equalize", 0.6, None)),
    (("Equalize", 0.0, None), ("Equalize", 0.8, None)),
    (("Invert", 0.6, None), ("Equalize", 1.0, None)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Rotate", 0.8, 8), ("Color", 1.0, 2)),
    (("Color", 0.8, 8), ("Solarize", 0.8, 7)),
    (("Sharpness", 0.4, 7), ("Invert", 0.6, None)),
    (("ShearX", 0.6, 5), ("Equalize", 1.0, None)),
    (("Color", 0.4, 0), ("Equalize", 0.6, None)),
    (("Equalize", 0.4, None), ("Solarize", 0.2, 4)),
    (("Solarize", 0.6, 5), ("AutoContrast", 0.6, None)),
    (("Invert", 0.6, None), ("Equalize", 1.0, None)),
    (("Color", 0.6, 4), ("Contrast", 1.0, 8)),
    (("Equalize", 0.8, None), ("Equalize", 0.6, None)),
]

_CIFAR10_POLICY = [
    (("Invert", 0.1, None), ("Contrast", 0.2, 6)),
    (("Rotate", 0.7, 2), ("TranslateX", 0.3, 9)),
    (("Sharpness", 0.8, 1), ("Sharpness", 0.9, 3)),
    (("ShearY", 0.5, 8), ("TranslateY", 0.7, 9)),
    (("AutoContrast", 0.5, None), ("Equalize", 0.9, None)),
    (("ShearY", 0.2, 7), ("Posterize", 0.3, 7)),
    (("Color", 0.4, 3), ("Brightness", 0.6, 7)),
    (("Sharpness", 0.3, 9), ("Brightness", 0.7, 9)),
    (("Equalize", 0.6, None), ("Equalize", 0.5, None)),
    (("Contrast", 0.6, 7), ("Sharpness", 0.6, 5)),
    (("Color", 0.7, 7), ("TranslateX", 0.5, 8)),
    (("Equalize", 0.3, None), ("AutoContrast", 0.4, None)),
    (("TranslateY", 0.4, 3), ("Sharpness", 0.2, 6)),
    (("Brightness", 0.9, 6), ("Color", 0.2, 8)),
    (("Solarize", 0.5, 2), ("Invert", 0.0, None)),
    (("Equalize", 0.2, None), ("AutoContrast", 0.6, None)),
    (("Equalize", 0.2, None), ("Equalize", 0.6, None)),
    (("Color", 0.9, 9), ("Equalize", 0.6, None)),
    (("AutoContrast", 0.8, None), ("Solarize", 0.2, 8)),
    (("Brightness", 0.1, 3), ("Color", 0.7, 0)),
    (("Solarize", 0.4, 5), ("AutoContrast", 0.9, None)),
    (("TranslateY", 0.9, 9), ("TranslateY", 0.7, 9)),
    (("AutoContrast", 0.9, None), ("Solarize", 0.8, 3)),
    (("Equalize", 0.8, None), ("Invert", 0.1, None)),
    (("TranslateY", 0.7, 9), ("AutoContrast", 0.9, None)),
]

_SVHN_POLICY = [
    (("ShearX", 0.9, 4), ("Invert", 0.2, None)),
    (("ShearY", 0.9, 8), ("Invert", 0.7, None)),
    (("Equalize", 0.6, None), ("Solarize", 0.6, 6)),
    (("Invert", 0.9, None), ("Equalize", 0.6, None)),
    (("Equalize", 0.6, None), ("Rotate", 0.9, 3)),
    (("ShearX", 0.9, 4), ("AutoContrast", 0.8, None)),
    (("ShearY", 0.9, 8), ("Invert", 0.4, None)),
    (("ShearY", 0.9, 5), ("Solarize", 0.2, 6)),
    (("Invert", 0.9, None), ("AutoContrast", 0.8, None)),
    (("Equalize", 0.6, None), ("Rotate", 0.9, 3)),
    (("ShearX", 0.9, 4), ("Solarize", 0.3, 3)),
    (("ShearY", 0.8, 8), ("Invert", 0.7, None)),
    (("Equalize", 0.9, None), ("TranslateY", 0.6, 6)),
    (("Invert", 0.9, None), ("Equalize", 0.6, None)),
    (("Contrast", 0.3, 3), ("Rotate", 0.8, 4)),
    (("Invert", 0.8, None), ("TranslateY", 0.0, 2)),
    (("ShearY", 0.7, 6), ("Solarize", 0.4, 8)),
    (("Invert", 0.6, None), ("Rotate", 0.8, 4)),
    (("ShearY", 0.3, 7), ("TranslateX", 0.9, 3)),
    (("ShearX", 0.1, 6), ("Invert", 0.6, None)),
    (("Solarize", 0.7, 2), ("TranslateY", 0.6, 7)),
    (("ShearY", 0.8, 4), ("Invert", 0.8, None)),
    (("ShearX", 0.7, 9), ("TranslateY", 0.8, 3)),
    (("ShearY", 0.8, 5), ("AutoContrast", 0.7, None)),
    (("ShearX", 0.7, 2), ("Invert", 0.1, None)),
]

_POLICIES = {"imagenet": _IMAGENET_POLICY, "cifar10": _CIFAR10_POLICY, "svhn": _SVHN_POLICY}


class AutoAugment(_AutoAugmentBase):
    """AutoAugment (reference ``autoaugment.py:104-284``)."""

    def __init__(self, policy: str = "imagenet", interpolation: str = "nearest", fill=None):
        super().__init__(interpolation, fill)
        if policy not in _POLICIES:
            raise ValueError(f"policy must be one of {list(_POLICIES)}")
        self.policy = policy
        self.policies = _POLICIES[policy]

    def _get_params(self, flat, key):
        h, w = query_size(flat)
        k1, k2, k3 = jax.random.split(key, 3)
        policy_id = int(jax.random.randint(k1, (), 0, len(self.policies)))
        probs = np.asarray(jax.random.uniform(k2, (2,)))
        signs = np.asarray(jax.random.randint(k3, (2,), 0, 2))
        space = _space_autoaugment(10, (h, w))
        ops: List[Tuple[str, float]] = []
        for i, (op_name, p, mag_id) in enumerate(self.policies[policy_id]):
            if probs[i] <= p:
                magnitudes, signed = space[op_name]
                magnitude = float(magnitudes[mag_id]) if mag_id is not None else 0.0
                if signed and signs[i] == 0:
                    magnitude = -magnitude
                ops.append((op_name, magnitude))
        return {"ops": ops}

    def _transform(self, inpt, params):
        for op_name, magnitude in params["ops"]:
            inpt = self._apply(inpt, op_name, magnitude)
        return inpt


class RandAugment(_AutoAugmentBase):
    """RandAugment (reference ``autoaugment.py:287-379``)."""

    def __init__(self, num_ops: int = 2, magnitude: int = 9, num_magnitude_bins: int = 31,
                 interpolation: str = "nearest", fill=None):
        super().__init__(interpolation, fill)
        self.num_ops = num_ops
        self.magnitude = magnitude
        self.num_magnitude_bins = num_magnitude_bins

    def _space(self, size):
        space = _space_autoaugment(self.num_magnitude_bins, size)
        del space["Invert"]
        space["Identity"] = (np.array([0.0]), False)
        return space

    def _get_params(self, flat, key):
        h, w = query_size(flat)
        space = self._space((h, w))
        names = list(space.keys())
        keys = jax.random.split(key, self.num_ops * 2)
        ops = []
        for i in range(self.num_ops):
            idx = int(jax.random.randint(keys[2 * i], (), 0, len(names)))
            op_name = names[idx]
            magnitudes, signed = space[op_name]
            mag = float(magnitudes[self.magnitude]) if magnitudes.shape[0] > 1 else 0.0
            if signed and int(jax.random.randint(keys[2 * i + 1], (), 0, 2)) == 0:
                mag = -mag
            ops.append((op_name, mag))
        return {"ops": ops}

    def _transform(self, inpt, params):
        for op_name, magnitude in params["ops"]:
            inpt = self._apply(inpt, op_name, magnitude)
        return inpt


class TrivialAugmentWide(_AutoAugmentBase):
    """TrivialAugment Wide (reference ``autoaugment.py:382-460``)."""

    def __init__(self, num_magnitude_bins: int = 31, interpolation: str = "nearest", fill=None):
        super().__init__(interpolation, fill)
        self.num_magnitude_bins = num_magnitude_bins

    def _space(self):
        n = self.num_magnitude_bins
        return {
            "Identity": (np.array([0.0]), False),
            "ShearX": (np.linspace(0.0, 0.99, n), True),
            "ShearY": (np.linspace(0.0, 0.99, n), True),
            "TranslateX": (np.linspace(0.0, 32.0, n), True),
            "TranslateY": (np.linspace(0.0, 32.0, n), True),
            "Rotate": (np.linspace(0.0, 135.0, n), True),
            "Brightness": (np.linspace(0.0, 0.99, n), True),
            "Color": (np.linspace(0.0, 0.99, n), True),
            "Contrast": (np.linspace(0.0, 0.99, n), True),
            "Sharpness": (np.linspace(0.0, 0.99, n), True),
            "Posterize": (8 - np.round(np.arange(n) / ((n - 1) / 6)), False),
            "Solarize": (np.linspace(255.0, 0.0, n), False),
            "AutoContrast": (np.array([0.0]), False),
            "Equalize": (np.array([0.0]), False),
        }

    def _get_params(self, flat, key):
        space = self._space()
        names = list(space.keys())
        k1, k2, k3 = jax.random.split(key, 3)
        op_name = names[int(jax.random.randint(k1, (), 0, len(names)))]
        magnitudes, signed = space[op_name]
        if magnitudes.shape[0] > 1:
            mag = float(magnitudes[int(jax.random.randint(k2, (), 0, magnitudes.shape[0]))])
        else:
            mag = 0.0
        if signed and int(jax.random.randint(k3, (), 0, 2)) == 0:
            mag = -mag
        return {"ops": [(op_name, mag)]}

    def _transform(self, inpt, params):
        for op_name, magnitude in params["ops"]:
            inpt = self._apply(inpt, op_name, magnitude)
        return inpt


class AugMix(_AutoAugmentBase):
    """AugMix (reference ``autoaugment.py:466-620``): mix ``mixture_width``
    augmentation chains with Dirichlet weights + a Beta skip-connection."""

    _PARAMETER_MAX = 10

    def __init__(self, severity: int = 3, mixture_width: int = 3, chain_depth: int = -1,
                 alpha: float = 1.0, all_ops: bool = True,
                 interpolation: str = "bilinear", fill=None):
        super().__init__(interpolation, fill)
        if not 1 <= severity <= self._PARAMETER_MAX:
            raise ValueError(f"severity must be in [1, {self._PARAMETER_MAX}]")
        self.severity = severity
        self.mixture_width = mixture_width
        self.chain_depth = chain_depth
        self.alpha = alpha
        self.all_ops = all_ops

    def _space(self, size):
        h, w = size
        n = self._PARAMETER_MAX
        s = {
            "ShearX": (np.linspace(0.0, 0.3, n), True),
            "ShearY": (np.linspace(0.0, 0.3, n), True),
            "TranslateX": (np.linspace(0.0, w / 3.0, n), True),
            "TranslateY": (np.linspace(0.0, h / 3.0, n), True),
            "Rotate": (np.linspace(0.0, 30.0, n), True),
            "Posterize": (4 - np.round(np.arange(n) / ((n - 1) / 4)), False),
            "Solarize": (np.linspace(255.0, 0.0, n), False),
            "AutoContrast": (np.array([0.0]), False),
            "Equalize": (np.array([0.0]), False),
        }
        if self.all_ops:
            s.update({
                "Brightness": (np.linspace(0.0, 0.9, n), True),
                "Color": (np.linspace(0.0, 0.9, n), True),
                "Contrast": (np.linspace(0.0, 0.9, n), True),
                "Sharpness": (np.linspace(0.0, 0.9, n), True),
            })
        return s

    def __call__(self, *inputs, key=None):
        import jax.numpy as jnp

        from .._dtype import to_dtype

        sample = inputs if len(inputs) > 1 else inputs[0]
        if key is None:
            raise ValueError("AugMix needs a PRNG key")
        img = sample
        if not isinstance(img, TVArray) and not hasattr(img, "dtype"):
            img = jnp.asarray(img)
        data = img.data if isinstance(img, TVArray) else jnp.asarray(img)
        h, w = (data.shape[-3], data.shape[-2]) if data.ndim >= 3 else data.shape
        space = self._space((h, w))
        names = list(space.keys())

        k_dir, k_beta, key = jax.random.split(key, 3)
        mix_w = np.asarray(jax.random.dirichlet(k_dir, jnp.full((self.mixture_width,), self.alpha)))
        m = float(jax.random.beta(k_beta, self.alpha, self.alpha))

        orig_dtype = data.dtype
        fdata = to_dtype(data, jnp.float32, scale=True)
        mix = m * fdata
        for i in range(self.mixture_width):
            key, k_depth = jax.random.split(key)
            depth = self.chain_depth if self.chain_depth > 0 else int(jax.random.randint(k_depth, (), 1, 4))
            aug = data
            for _ in range(depth):
                key, k_op, k_mag, k_sign = jax.random.split(key, 4)
                op_name = names[int(jax.random.randint(k_op, (), 0, len(names)))]
                magnitudes, signed = space[op_name]
                if magnitudes.shape[0] > 1:
                    mag = float(magnitudes[int(jax.random.randint(k_mag, (), 0, self.severity))])
                else:
                    mag = 0.0
                if signed and int(jax.random.randint(k_sign, (), 0, 2)) == 0:
                    mag = -mag
                aug = self._apply(aug, op_name, mag)
            mix = mix + mix_w[i] * to_dtype(jnp.asarray(aug), jnp.float32, scale=True)
        out = to_dtype(jnp.clip(mix, 0.0, 1.0), orig_dtype, scale=True)
        from ..tv_arrays import wrap

        return wrap(out, img) if isinstance(img, TVArray) else out

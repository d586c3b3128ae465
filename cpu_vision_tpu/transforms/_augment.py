"""Augmentation transforms: RandomErasing, MixUp, CutMix (reference
``transforms/v2/_augment.py``)."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from . import functional as F  # noqa: N812
from ..tv_arrays import BoundingBoxes, Image, Mask, TVArray, Video, wrap
from ._transform import Transform, query_size

__all__ = ["RandomErasing", "MixUp", "CutMix"]


class RandomErasing(Transform):
    """Erase a random rectangle (reference v2 ``RandomErasing``; Zhong et al.)."""

    _needs_key = True

    def __init__(self, p: float = 0.5, scale=(0.02, 0.33), ratio=(0.3, 3.3), value=0.0):
        self.p = p
        self.scale = scale
        self.ratio = ratio
        self.value = value

    def _get_params(self, flat, key):
        h, w = query_size(flat)
        keys = jax.random.split(key, 32)
        if float(jax.random.uniform(keys[0])) >= self.p:
            return {"apply": False}
        area = h * w
        log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        for t in range(10):
            k1, k2, k3 = jax.random.split(keys[t + 1], 3)
            erase_area = area * (float(jax.random.uniform(k1)) * (self.scale[1] - self.scale[0]) + self.scale[0])
            aspect = math.exp(float(jax.random.uniform(k2)) * (log_ratio[1] - log_ratio[0]) + log_ratio[0])
            eh = int(round(math.sqrt(erase_area * aspect)))
            ew = int(round(math.sqrt(erase_area / aspect)))
            if eh < h and ew < w:
                k4, k5 = jax.random.split(k3)
                i = int(jax.random.randint(k4, (), 0, h - eh + 1))
                j = int(jax.random.randint(k5, (), 0, w - ew + 1))
                return {"apply": True, "i": i, "j": j, "h": eh, "w": ew}
        return {"apply": False}

    def _transform(self, inpt, params):
        if not params["apply"] or isinstance(inpt, (BoundingBoxes, Mask)):
            return inpt
        return F.erase(inpt, params["i"], params["j"], params["h"], params["w"], self.value)


class _BatchMix(Transform):
    """Base for batch transforms MixUp/CutMix: operate on (images, labels)
    where images are NHWC and labels are (N,) int or (N, K) one-hot."""

    _needs_key = True

    def __init__(self, alpha: float = 1.0, num_classes: Optional[int] = None):
        self.alpha = alpha
        self.num_classes = num_classes

    def _one_hot(self, labels):
        if labels.ndim == 1:
            if self.num_classes is None:
                raise ValueError("num_classes required for integer labels")
            return jax.nn.one_hot(labels, self.num_classes)
        return labels

    @staticmethod
    def _beta(key, alpha):
        a = jax.random.gamma(key, alpha)
        key2 = jax.random.fold_in(key, 1)
        b = jax.random.gamma(key2, alpha)
        return a / (a + b)


class MixUp(_BatchMix):
    """Blend each sample with the batch rolled by one (reference v2 ``MixUp``,
    ``_augment.py:219``)."""

    def __call__(self, images, labels, *, key=None):
        if key is None:
            raise ValueError("MixUp needs a PRNG key")
        data = images.data if isinstance(images, TVArray) else jnp.asarray(images)
        lam = self._beta(key, self.alpha)
        labels1h = self._one_hot(jnp.asarray(labels))
        mixed = data * lam + jnp.roll(data, 1, axis=0) * (1.0 - lam)
        mixed_labels = labels1h * lam + jnp.roll(labels1h, 1, axis=0) * (1.0 - lam)
        out = wrap(mixed, images) if isinstance(images, TVArray) else mixed
        return out, mixed_labels


class CutMix(_BatchMix):
    """Paste a random box from the rolled batch (reference v2 ``CutMix``,
    ``_augment.py:267``)."""

    def __call__(self, images, labels, *, key=None):
        if key is None:
            raise ValueError("CutMix needs a PRNG key")
        data = images.data if isinstance(images, TVArray) else jnp.asarray(images)
        n, h, w, c = data.shape
        k1, k2, k3 = jax.random.split(key, 3)
        lam = self._beta(k1, self.alpha)
        labels1h = self._one_hot(jnp.asarray(labels))

        r_x = jax.random.randint(k2, (), 0, w)
        r_y = jax.random.randint(k3, (), 0, h)
        r = 0.5 * jnp.sqrt(1.0 - lam)
        r_w_half = (r * w).astype(jnp.int32)
        r_h_half = (r * h).astype(jnp.int32)
        x1 = jnp.clip(r_x - r_w_half, 0, w)
        y1 = jnp.clip(r_y - r_h_half, 0, h)
        x2 = jnp.clip(r_x + r_w_half, 0, w)
        y2 = jnp.clip(r_y + r_h_half, 0, h)

        ys = jnp.arange(h)[None, :, None, None]
        xs = jnp.arange(w)[None, None, :, None]
        box = (ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2)
        mixed = jnp.where(box, jnp.roll(data, 1, axis=0), data)
        lam_adj = 1.0 - ((x2 - x1) * (y2 - y1)) / (w * h)
        mixed_labels = labels1h * lam_adj + jnp.roll(labels1h, 1, axis=0) * (1.0 - lam_adj)
        out = wrap(mixed, images) if isinstance(images, TVArray) else mixed
        return out, mixed_labels

"""Geometric class transforms (reference ``transforms/v2/_geometry.py``).

Random parameters are sampled on the host from the explicit PRNG key (input
pipelines run per-sample; the jit-traceable path is the functional layer).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple, Union

import jax
import numpy as np

from . import functional as F  # noqa: N812
from ._transform import Transform, query_size

__all__ = [
    "RandomHorizontalFlip",
    "RandomVerticalFlip",
    "Resize",
    "RandomResize",
    "CenterCrop",
    "RandomCrop",
    "RandomResizedCrop",
    "Pad",
    "RandomZoomOut",
    "RandomRotation",
    "RandomAffine",
    "RandomPerspective",
    "ElasticTransform",
    "ScaleJitter",
    "RandomShortestSize",
    "FiveCrop",
    "TenCrop",
]


def _u(key, lo, hi):
    return float(jax.random.uniform(key)) * (hi - lo) + lo


class RandomHorizontalFlip(Transform):
    _needs_key = True

    def __init__(self, p: float = 0.5):
        self.p = p

    def _get_params(self, flat, key):
        return {"flip": float(jax.random.uniform(key)) < self.p}

    def _transform(self, inpt, params):
        return F.horizontal_flip(inpt) if params["flip"] else inpt


class RandomVerticalFlip(RandomHorizontalFlip):
    def _transform(self, inpt, params):
        return F.vertical_flip(inpt) if params["flip"] else inpt


class Resize(Transform):
    def __init__(self, size, interpolation: str = "bilinear", max_size: Optional[int] = None,
                 antialias: bool = True):
        self.size = size
        self.interpolation = interpolation
        self.max_size = max_size
        self.antialias = antialias

    def _get_params(self, flat, key):
        h, w = query_size(flat)
        if isinstance(self.size, int) or len(self.size) == 1:
            # shorter-side rule with optional max_size (reference resize rules)
            s = self.size if isinstance(self.size, int) else self.size[0]
            short, long = (h, w) if h <= w else (w, h)
            new_short = s
            new_long = int(s * long / short)
            if self.max_size is not None and new_long > self.max_size:
                new_long = self.max_size
                new_short = int(self.max_size * short / long)
            oh, ow = (new_short, new_long) if h <= w else (new_long, new_short)
        else:
            oh, ow = self.size
        return {"size": (oh, ow)}

    def _transform(self, inpt, params):
        return F.resize(inpt, params["size"], self.interpolation, self.antialias)


class RandomResize(Transform):
    _needs_key = True

    def __init__(self, min_size: int, max_size: int, interpolation: str = "bilinear",
                 antialias: bool = True):
        self.min_size = min_size
        self.max_size = max_size
        self.interpolation = interpolation
        self.antialias = antialias

    def _get_params(self, flat, key):
        s = int(jax.random.randint(key, (), self.min_size, self.max_size))
        return {"size": (s, s)}

    def _transform(self, inpt, params):
        return F.resize(inpt, params["size"], self.interpolation, self.antialias)


class CenterCrop(Transform):
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def _transform(self, inpt, params):
        return F.center_crop(inpt, self.size)


class RandomCrop(Transform):
    _needs_key = True

    def __init__(self, size, padding=None, pad_if_needed: bool = False, fill=0,
                 padding_mode: str = "constant"):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.padding = padding
        self.pad_if_needed = pad_if_needed
        self.fill = fill
        self.padding_mode = padding_mode

    def _get_params(self, flat, key):
        h, w = query_size(flat)
        if self.padding is not None:
            l, t, r, b = F._parse_pad(self.padding)
            h, w = h + t + b, w + l + r
        ch, cw = self.size
        if self.pad_if_needed:
            h, w = max(h, ch), max(w, cw)
        if ch > h or cw > w:
            raise ValueError(f"crop size {self.size} larger than image ({h}, {w})")
        k1, k2 = jax.random.split(key)
        top = int(jax.random.randint(k1, (), 0, h - ch + 1))
        left = int(jax.random.randint(k2, (), 0, w - cw + 1))
        return {"top": top, "left": left}

    def _transform(self, inpt, params):
        if self.padding is not None:
            inpt = F.pad(inpt, self.padding, self.fill, self.padding_mode)
        if self.pad_if_needed:
            h, w = F.get_size(inpt)
            ch, cw = self.size
            pr = max(0, cw - w)
            pb = max(0, ch - h)
            if pr or pb:
                inpt = F.pad(inpt, [0, 0, pr, pb], self.fill, self.padding_mode)
        return F.crop(inpt, params["top"], params["left"], *self.size)


class RandomResizedCrop(Transform):
    """Random scale/ratio crop then resize (reference
    ``RandomResizedCrop._get_params``, v1 ``transforms.py:910``)."""

    _needs_key = True

    def __init__(self, size, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                 interpolation: str = "bilinear", antialias: bool = True):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.scale = scale
        self.ratio = ratio
        self.interpolation = interpolation
        self.antialias = antialias

    def _get_params(self, flat, key):
        h, w = query_size(flat)
        area = h * w
        log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
        keys = jax.random.split(key, 10 * 3)
        for i in range(10):
            k1, k2, k3 = keys[3 * i], keys[3 * i + 1], keys[3 * i + 2]
            target_area = area * _u(k1, *self.scale)
            aspect = math.exp(_u(k2, *log_ratio))
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                k4, k5 = jax.random.split(k3)
                top = int(jax.random.randint(k4, (), 0, h - ch + 1))
                left = int(jax.random.randint(k5, (), 0, w - cw + 1))
                return {"top": top, "left": left, "height": ch, "width": cw}
        # fallback: center crop at a valid ratio
        in_ratio = w / h
        if in_ratio < self.ratio[0]:
            cw, ch = w, int(round(w / self.ratio[0]))
        elif in_ratio > self.ratio[1]:
            ch, cw = h, int(round(h * self.ratio[1]))
        else:
            cw, ch = w, h
        return {"top": (h - ch) // 2, "left": (w - cw) // 2, "height": ch, "width": cw}

    def _transform(self, inpt, params):
        return F.resized_crop(
            inpt, params["top"], params["left"], params["height"], params["width"],
            self.size, self.interpolation, self.antialias,
        )


class Pad(Transform):
    def __init__(self, padding, fill=0, padding_mode: str = "constant"):
        self.padding = padding
        self.fill = fill
        self.padding_mode = padding_mode

    def _transform(self, inpt, params):
        return F.pad(inpt, self.padding, self.fill, self.padding_mode)


class RandomZoomOut(Transform):
    """Zoom out by padding (reference ``RandomZoomOut``, v2 ``_geometry.py``)."""

    _needs_key = True

    def __init__(self, fill=0, side_range: Tuple[float, float] = (1.0, 4.0), p: float = 0.5):
        self.fill = fill
        self.side_range = side_range
        self.p = p

    def _get_params(self, flat, key):
        h, w = query_size(flat)
        k0, k1, k2, k3 = jax.random.split(key, 4)
        if float(jax.random.uniform(k0)) >= self.p:
            return {"apply": False}
        r = _u(k1, *self.side_range)
        ch, cw = int(h * r), int(w * r)
        top = int(jax.random.randint(k2, (), 0, ch - h + 1))
        left = int(jax.random.randint(k3, (), 0, cw - w + 1))
        return {
            "apply": True,
            "padding": [left, top, cw - w - left, ch - h - top],
        }

    def _transform(self, inpt, params):
        if not params["apply"]:
            return inpt
        return F.pad(inpt, params["padding"], self.fill)


class RandomRotation(Transform):
    _needs_key = True

    def __init__(self, degrees, interpolation: str = "nearest", expand: bool = False,
                 center=None, fill=None):
        self.degrees = (-degrees, degrees) if isinstance(degrees, (int, float)) else tuple(degrees)
        self.interpolation = interpolation
        self.expand = expand
        self.center = center
        self.fill = fill

    def _get_params(self, flat, key):
        return {"angle": _u(key, *self.degrees)}

    def _transform(self, inpt, params):
        return F.rotate(inpt, params["angle"], self.interpolation, self.expand,
                        self.center, self.fill)


class RandomAffine(Transform):
    _needs_key = True

    def __init__(self, degrees, translate=None, scale=None, shear=None,
                 interpolation: str = "nearest", fill=None, center=None):
        self.degrees = (-degrees, degrees) if isinstance(degrees, (int, float)) else tuple(degrees)
        self.translate = translate
        self.scale = scale
        self.shear = (
            None if shear is None
            else ((-shear, shear, 0.0, 0.0) if isinstance(shear, (int, float)) else tuple(shear))
        )
        self.interpolation = interpolation
        self.fill = fill
        self.center = center

    def _get_params(self, flat, key):
        h, w = query_size(flat)
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        angle = _u(k1, *self.degrees)
        if self.translate is not None:
            tx = _u(k2, -self.translate[0] * w, self.translate[0] * w)
            ty = _u(k3, -self.translate[1] * h, self.translate[1] * h)
            translate = (int(round(tx)), int(round(ty)))
        else:
            translate = (0, 0)
        scale = _u(k4, *self.scale) if self.scale is not None else 1.0
        if self.shear is not None:
            sx = _u(k5, self.shear[0], self.shear[1])
            sy = _u(k6, self.shear[2], self.shear[3]) if len(self.shear) == 4 else 0.0
        else:
            sx = sy = 0.0
        return {"angle": angle, "translate": translate, "scale": scale, "shear": (sx, sy)}

    def _transform(self, inpt, params):
        return F.affine(inpt, params["angle"], params["translate"], params["scale"],
                        params["shear"], self.interpolation, self.fill, self.center)


class RandomPerspective(Transform):
    """Random 4-corner perspective (reference v1 ``transforms.py:770``)."""

    _needs_key = True

    def __init__(self, distortion_scale: float = 0.5, p: float = 0.5,
                 interpolation: str = "bilinear", fill=None):
        self.distortion_scale = distortion_scale
        self.p = p
        self.interpolation = interpolation
        self.fill = fill

    def _get_params(self, flat, key):
        h, w = query_size(flat)
        keys = jax.random.split(key, 9)
        if float(jax.random.uniform(keys[0])) >= self.p:
            return {"apply": False}
        d = self.distortion_scale
        hw = int(d * w / 2)
        hh = int(d * h / 2)
        ri = lambda k, lo, hi: int(jax.random.randint(k, (), lo, hi + 1))  # noqa: E731
        tl = (ri(keys[1], 0, hw), ri(keys[2], 0, hh))
        tr = (w - 1 - ri(keys[3], 0, hw), ri(keys[4], 0, hh))
        br = (w - 1 - ri(keys[5], 0, hw), h - 1 - ri(keys[6], 0, hh))
        bl = (ri(keys[7], 0, hw), h - 1 - ri(keys[8], 0, hh))
        start = [(0, 0), (w - 1, 0), (w - 1, h - 1), (0, h - 1)]
        end = [tl, tr, br, bl]
        return {"apply": True, "coeffs": _perspective_coeffs(end, start)}

    def _transform(self, inpt, params):
        if not params["apply"]:
            return inpt
        return F.perspective(inpt, params["coeffs"], self.interpolation, self.fill)


def _perspective_coeffs(startpoints, endpoints) -> List[float]:
    """Solve the 8 perspective coefficients mapping end->start (reference
    ``functional._get_perspective_coeffs``)."""
    a = np.zeros((8, 8), np.float64)
    b = np.zeros((8,), np.float64)
    for i, (p1, p2) in enumerate(zip(endpoints, startpoints)):
        a[2 * i] = [p1[0], p1[1], 1, 0, 0, 0, -p2[0] * p1[0], -p2[0] * p1[1]]
        a[2 * i + 1] = [0, 0, 0, p1[0], p1[1], 1, -p2[1] * p1[0], -p2[1] * p1[1]]
        b[2 * i] = p2[0]
        b[2 * i + 1] = p2[1]
    coeffs = np.linalg.solve(a, b)
    return [float(c) for c in coeffs]


class ElasticTransform(Transform):
    """Random smooth displacement field (reference v2 ``ElasticTransform``)."""

    _needs_key = True

    def __init__(self, alpha: float = 50.0, sigma: float = 5.0,
                 interpolation: str = "bilinear", fill=None):
        self.alpha = alpha
        self.sigma = sigma
        self.interpolation = interpolation
        self.fill = fill

    def _get_params(self, flat, key):
        from ..ops import gaussian_blur

        h, w = query_size(flat)
        k1, k2 = jax.random.split(key)
        ksize = int(8 * self.sigma + 1) | 1
        dx = jax.random.uniform(k1, (h, w, 1), minval=-1.0, maxval=1.0)
        dy = jax.random.uniform(k2, (h, w, 1), minval=-1.0, maxval=1.0)
        dx = gaussian_blur(dx, ksize, self.sigma) * self.alpha / w
        dy = gaussian_blur(dy, ksize, self.sigma) * self.alpha / h
        import jax.numpy as jnp

        disp = jnp.concatenate([dx, dy], axis=-1)[None] * 2.0  # [-1,1] grid units
        return {"displacement": disp}

    def _transform(self, inpt, params):
        return F.elastic(inpt, params["displacement"], self.interpolation, self.fill)


class ScaleJitter(Transform):
    """Scale jitter aug from 'Simple Copy-Paste' (reference v2
    ``ScaleJitter``, ``_geometry.py:1185``)."""

    _needs_key = True

    def __init__(self, target_size: Tuple[int, int], scale_range: Tuple[float, float] = (0.1, 2.0),
                 interpolation: str = "bilinear", antialias: bool = True):
        self.target_size = target_size
        self.scale_range = scale_range
        self.interpolation = interpolation
        self.antialias = antialias

    def _get_params(self, flat, key):
        h, w = query_size(flat)
        scale = _u(key, *self.scale_range)
        r = min(self.target_size[0] / h, self.target_size[1] / w) * scale
        return {"size": (int(h * r), int(w * r))}

    def _transform(self, inpt, params):
        return F.resize(inpt, params["size"], self.interpolation, self.antialias)


class RandomShortestSize(Transform):
    """Resize so the shorter side is a random choice (reference v2
    ``RandomShortestSize``, ``_geometry.py:1266``)."""

    _needs_key = True

    def __init__(self, min_size: Union[int, Sequence[int]], max_size: Optional[int] = None,
                 interpolation: str = "bilinear", antialias: bool = True):
        self.min_size = [min_size] if isinstance(min_size, int) else list(min_size)
        self.max_size = max_size
        self.interpolation = interpolation
        self.antialias = antialias

    def _get_params(self, flat, key):
        h, w = query_size(flat)
        s = self.min_size[int(jax.random.randint(key, (), 0, len(self.min_size)))]
        r = s / min(h, w)
        if self.max_size is not None:
            r = min(r, self.max_size / max(h, w))
        return {"size": (int(h * r), int(w * r))}

    def _transform(self, inpt, params):
        return F.resize(inpt, params["size"], self.interpolation, self.antialias)


class FiveCrop(Transform):
    """Four corners + center crop; returns a 5-tuple (reference v1
    ``transforms.py:FiveCrop``)."""

    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, *inputs, key=None):
        inpt = inputs if len(inputs) > 1 else inputs[0]
        ch, cw = self.size
        h, w = F.get_size(inpt)
        if ch > h or cw > w:
            raise ValueError("crop size larger than image")
        tl = F.crop(inpt, 0, 0, ch, cw)
        tr = F.crop(inpt, 0, w - cw, ch, cw)
        bl = F.crop(inpt, h - ch, 0, ch, cw)
        br = F.crop(inpt, h - ch, w - cw, ch, cw)
        center = F.center_crop(inpt, self.size)
        return tl, tr, bl, br, center


class TenCrop(FiveCrop):
    """FiveCrop of the image and of its (h-)flip -> 10-tuple."""

    def __init__(self, size, vertical_flip: bool = False):
        super().__init__(size)
        self.vertical_flip = vertical_flip

    def __call__(self, *inputs, key=None):
        inpt = inputs if len(inputs) > 1 else inputs[0]
        first = super().__call__(inpt)
        flipped = F.vertical_flip(inpt) if self.vertical_flip else F.horizontal_flip(inpt)
        second = super().__call__(flipped)
        return first + second

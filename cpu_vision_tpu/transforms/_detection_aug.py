"""Detection-specific augmentations: RandomIoUCrop (SSD) and JPEG
compression aug (reference ``transforms/v2/_geometry.py:1088`` and
``v2/_augment.py:JPEG``)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from . import functional as F  # noqa: N812
from ..tv_arrays import BoundingBoxes, Image, Mask, TVArray, wrap
from ._transform import Transform, query_size

__all__ = ["RandomIoUCrop", "JPEG"]


class RandomIoUCrop(Transform):
    """SSD-style IoU-constrained random crop (reference ``RandomIoUCrop``,
    ``v2/_geometry.py:1088``).  Requires BoundingBoxes in the sample; boxes
    whose centers fall outside the crop are zeroed (fixed-shape analog of
    the reference's filtering; pair with SanitizeBoundingBoxes)."""

    _needs_key = True

    def __init__(self, min_scale: float = 0.3, max_scale: float = 1.0,
                 min_aspect_ratio: float = 0.5, max_aspect_ratio: float = 2.0,
                 sampler_options: Optional[Sequence[float]] = None, trials: int = 40):
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.min_ar = min_aspect_ratio
        self.max_ar = max_aspect_ratio
        self.options = list(sampler_options or [0.0, 0.1, 0.3, 0.5, 0.7, 0.9, 1.0])
        self.trials = trials

    def _get_params(self, flat, key):
        h, w = query_size(flat)
        boxes = next((leaf for leaf in flat if isinstance(leaf, BoundingBoxes)), None)
        if boxes is None:
            return {"apply": False}
        from ..ops import box_iou, box_convert

        xyxy = np.asarray(box_convert(boxes.data, boxes.format, "xyxy"))
        keys = jax.random.split(key, self.trials * 5 + 1)
        for t in range(self.trials):
            k0, k1, k2, k3, k4 = keys[5 * t : 5 * t + 5]
            min_iou = self.options[int(jax.random.randint(k0, (), 0, len(self.options)))]
            if min_iou >= 1.0:
                return {"apply": False}
            cw = int(w * (self.min_scale + float(jax.random.uniform(k1)) * (self.max_scale - self.min_scale)))
            ch = int(h * (self.min_scale + float(jax.random.uniform(k2)) * (self.max_scale - self.min_scale)))
            if cw < 1 or ch < 1:
                continue
            ar = cw / ch
            if not (self.min_ar <= ar <= self.max_ar):
                continue
            left = int(jax.random.randint(k3, (), 0, w - cw + 1))
            top = int(jax.random.randint(k4, (), 0, h - ch + 1))
            crop = np.array([[left, top, left + cw, top + ch]], np.float32)
            cx = (xyxy[:, 0] + xyxy[:, 2]) / 2
            cy = (xyxy[:, 1] + xyxy[:, 3]) / 2
            inside = (cx > left) & (cx < left + cw) & (cy > top) & (cy < top + ch)
            if not inside.any():
                continue
            import jax.numpy as _jnp

            ious = np.asarray(box_iou(_jnp.asarray(xyxy[inside]), _jnp.asarray(crop)))
            if ious.max() < min_iou:
                continue
            return {"apply": True, "top": top, "left": left, "height": ch, "width": cw}
        return {"apply": False}

    def _transform(self, inpt, params):
        if not params["apply"]:
            return inpt
        out = F.crop(inpt, params["top"], params["left"], params["height"], params["width"])
        if isinstance(out, BoundingBoxes):
            # zero boxes whose centers left the crop (reference filters them)
            from ..ops import box_convert

            xyxy = box_convert(out.data, out.format, "xyxy")
            cx = (xyxy[..., 0] + xyxy[..., 2]) / 2
            cy = (xyxy[..., 1] + xyxy[..., 3]) / 2
            h, w = out.canvas_size
            inside = (cx > 0) & (cx < w) & (cy > 0) & (cy < h)
            from . import functional as FF

            clamped = FF.clamp_bounding_boxes(out)
            data = jnp.where(inside[..., None], clamped.data, 0.0)
            return BoundingBoxes(data, out.format, tuple(out.canvas_size))
        return out


class JPEG(Transform):
    """JPEG compression artifact augmentation (reference ``v2/_augment.py:JPEG``)
    via the native codecs — host-side, for input pipelines."""

    _needs_key = True

    def __init__(self, quality):
        self.quality = (quality, quality) if isinstance(quality, int) else tuple(quality)

    def _get_params(self, flat, key):
        q = int(jax.random.randint(key, (), self.quality[0], self.quality[1] + 1))
        return {"quality": q}

    def _transform(self, inpt, params):
        if isinstance(inpt, (BoundingBoxes, Mask)):
            return inpt
        from ..io import decode_jpeg, encode_jpeg

        data = inpt.data if isinstance(inpt, TVArray) else inpt
        arr = np.asarray(data)
        if arr.dtype != np.uint8:
            raise TypeError("JPEG aug expects uint8 images")
        out = decode_jpeg(encode_jpeg(arr, quality=params["quality"]))
        out = jnp.asarray(out.reshape(arr.shape))
        return wrap(out, inpt) if isinstance(inpt, TVArray) else out

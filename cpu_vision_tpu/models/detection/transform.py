"""GeneralizedRCNNTransform (reference
``torchvision/models/detection/transform.py:86-300``): normalize, resize to
min/max-size rule, batch to a fixed /32-divisible canvas, and map detections
back to original coordinates.

TPU-native: the padded canvas is a *static* shape (``fixed_size`` or the
max-size bound), so batches are jit-stable across image sizes.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from ...ops import resize as _resize

__all__ = ["GeneralizedRCNNTransform"]


class GeneralizedRCNNTransform:
    def __init__(
        self,
        min_size: int = 800,
        max_size: int = 1333,
        image_mean: Sequence[float] = (0.485, 0.456, 0.406),
        image_std: Sequence[float] = (0.229, 0.224, 0.225),
        size_divisible: int = 32,
        fixed_size: Optional[Tuple[int, int]] = None,
        size_bucket: Optional[int] = 64,
    ):
        self.min_size = min_size
        self.max_size = max_size
        self.image_mean = jnp.asarray(image_mean, jnp.float32)
        self.image_std = jnp.asarray(image_std, jnp.float32)
        self.size_divisible = size_divisible
        self.fixed_size = fixed_size
        self.size_bucket = size_bucket

    def _target_size(self, h: int, w: int) -> Tuple[int, int]:
        """min/max-size rule (reference ``_resize_image_and_masks``), with
        optional TPU size-bucketing.

        Every distinct ``(th, tw)`` is a fresh XLA compilation of the resize
        program — on a variable-size dataset (COCO: thousands of distinct
        sizes) the exact reference rule is a compile storm.  ``size_bucket``
        (DEFAULT: 64) rounds the target up to a multiple of the bucket
        (clamped to the canvas), collapsing the size set to a small grid;
        box coordinates stay exact because scale factors are tracked per
        image.  Pass ``size_bucket=None`` to opt out into the reference's
        exact sizing (needed only for pixel-level parity checks).
        """
        if self.fixed_size is not None:
            return self.fixed_size
        scale = min(self.min_size / min(h, w), self.max_size / max(h, w))
        th, tw = int(round(h * scale)), int(round(w * scale))
        if self.size_bucket:
            ch, cw = self.canvas_size()
            b = self.size_bucket
            th = min(math.ceil(th / b) * b, ch)
            tw = min(math.ceil(tw / b) * b, cw)
        return th, tw

    def canvas_size(self) -> Tuple[int, int]:
        """The static padded canvas all batches use."""
        if self.fixed_size is not None:
            h, w = self.fixed_size
        else:
            h = w = self.max_size
        d = self.size_divisible
        return (math.ceil(h / d) * d, math.ceil(w / d) * d)

    def __call__(self, images, boxes=None):
        """images: list of HWC float arrays (or one NHWC batch of equal
        sizes).  Returns (batch NHWC on the fixed canvas, scaled boxes,
        original->resized scale factors)."""
        single = not isinstance(images, (list, tuple))
        if single:
            images = [images[i] for i in range(images.shape[0])] if images.ndim == 4 else [images]
        ch, cw = self.canvas_size()
        out_imgs, out_boxes, scales = [], [], []
        for i, img in enumerate(images):
            h, w = img.shape[0], img.shape[1]
            img = (img - self.image_mean) / self.image_std
            th, tw = self._target_size(h, w)
            img = _resize(img, (th, tw), "bilinear", antialias=False)
            pad_h, pad_w = ch - th, cw - tw
            img = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
            out_imgs.append(img)
            scales.append((th / h, tw / w))
            if boxes is not None:
                sy, sx = th / h, tw / w
                b = boxes[i] * jnp.asarray([sx, sy, sx, sy], jnp.float32)
                out_boxes.append(b)
        batch = jnp.stack(out_imgs)
        return batch, (out_boxes if boxes is not None else None), scales

    def postprocess_boxes(self, boxes, scales, index: int):
        """Map predicted boxes back to original image coordinates
        (reference ``postprocess``, ``transform.py:257``)."""
        sy, sx = scales[index]
        return boxes / jnp.asarray([sx, sy, sx, sy], jnp.float32)

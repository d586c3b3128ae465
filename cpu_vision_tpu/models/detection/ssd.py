"""SSD300-VGG16 (reference ``torchvision/models/detection/ssd.py``):
VGG16 features + extra conv layers, multibox heads, DefaultBox anchors.
"""

from __future__ import annotations

import itertools
import math
from typing import Any, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import batched_nms, clip_boxes_to_image
from .._api import register_model
from ._utils import BoxCoder

__all__ = ["SSD", "DefaultBoxGenerator", "ssd300_vgg16"]


class DefaultBoxGenerator:
    """SSD default boxes (reference ``anchor_utils.py:DefaultBoxGenerator``):
    per level, scales s_k with aspect ratios {1, r, 1/r} + the s'_k box."""

    def __init__(
        self,
        aspect_ratios: Sequence[Sequence[int]] = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)),
        scales: Sequence[float] | None = None,
        steps: Sequence[int] | None = None,
        min_ratio: float = 0.15,
        max_ratio: float = 0.9,
    ):
        self.aspect_ratios = aspect_ratios
        if scales is None:
            # the reference's scale interpolation (anchor_utils.py:172-178);
            # the ssd300 builder overrides with the paper scales explicitly
            m = len(aspect_ratios)
            if m > 1:
                self.scales = [min_ratio + (max_ratio - min_ratio) * k / (m - 1.0)
                               for k in range(m)] + [1.0]
            else:
                self.scales = [min_ratio, max_ratio]
        else:
            self.scales = list(scales)
        self.steps = steps

    def num_anchors_per_location(self) -> List[int]:
        return [2 + 2 * len(r) for r in self.aspect_ratios]

    def __call__(self, image_size: int, feature_sizes: Sequence[int]) -> jax.Array:
        boxes = []
        for k, (fs, ratios) in enumerate(zip(feature_sizes, self.aspect_ratios)):
            sk = self.scales[k]
            sk_prime = math.sqrt(sk * self.scales[k + 1])
            wh = [(sk, sk), (sk_prime, sk_prime)]
            for r in ratios:
                sr = math.sqrt(r)
                wh += [(sk * sr, sk / sr), (sk / sr, sk * sr)]
            # reference clamps only w/h at 1 (``clip=True`` clamps the wh
            # pairs); the xyxy corners are NOT clipped to the image
            # (anchor_utils.py:DefaultBoxGenerator.forward)
            wh = [(min(w, 1.0), min(h, 1.0)) for w, h in wh]
            # shift normalizer: image_size/steps[k] when steps are given
            # (ssd300 uses steps=[8,16,32,64,100,300] — NOT the grid size)
            f_norm = (image_size / self.steps[k]) if self.steps is not None else fs
            for i, j in itertools.product(range(fs), repeat=2):
                cx = (j + 0.5) / f_norm
                cy = (i + 0.5) / f_norm
                for w, h in wh:
                    boxes.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
        arr = np.asarray(boxes, np.float32) * image_size
        return jnp.asarray(arr)


class SSD(nn.Module):
    """(reference ``ssd.py:SSD``/``SSDFeatureExtractorVGG``)."""

    num_classes: int = 91
    image_size: int = 300
    score_thresh: float = 0.01
    nms_thresh: float = 0.45
    max_detections: int = 200
    topk_candidates: int = 400
    # static bound on the joint NMS candidate set.  The reference NMS-es the
    # union of per-class top-400 survivors (ssd.py:postprocess_detections, a
    # dynamic set); with trained weights the >0.01 survivors are far fewer
    # than this bound, so the global top-k cap is mAP-neutral.
    nms_candidates: int = 4096
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        """Returns (cls_logits (N, A, C), bbox_deltas (N, A, 4), anchors)."""
        x = images
        conv = lambda c, k=3, s=1, p=1, d=1: nn.Conv(  # noqa: E731
            c, (k, k), (s, s), padding=[(p * d, p * d)] * 2, kernel_dilation=(d, d), dtype=self.dtype
        )
        # VGG16 through conv4_3 (feature map 1), then conv5 + fc-as-conv (map 2)
        for c, n_convs in [(64, 2), (128, 2), (256, 3)]:
            for _ in range(n_convs):
                x = nn.relu(conv(c)(x))
            x = nn.max_pool(x, (2, 2), (2, 2)) if c != 256 else nn.max_pool(
                jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), constant_values=-jnp.inf), (2, 2), (2, 2))
        for _ in range(3):
            x = nn.relu(conv(512)(x))
        # L2-normalised conv4_3 output with learned scale (reference :438)
        scale = self.param("l2_scale", nn.initializers.constant(20.0), (512,))
        f1 = x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-10) * scale
        x = nn.max_pool(x, (2, 2), (2, 2))
        for _ in range(3):
            x = nn.relu(conv(512)(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), (1, 1))
        x = nn.relu(conv(1024, 3, 1, 1, 6)(x))  # fc6 atrous (pad = dilation·1 = 6)
        f2 = nn.relu(conv(1024, 1, 1, 0)(x))  # fc7
        # extra feature layers (maps 3-6)
        feats = [f1, f2]
        x = f2
        for c_mid, c_out, s, p in [(256, 512, 2, 1), (128, 256, 2, 1), (128, 256, 1, 0), (128, 256, 1, 0)]:
            x = nn.relu(conv(c_mid, 1, 1, 0)(x))
            x = nn.relu(conv(c_out, 3, s, p)(x))
            feats.append(x)

        # the ssd300 paper scales, passed explicitly like the reference
        # builder (ssd.py:665-668)
        gen = DefaultBoxGenerator(
            scales=(0.07, 0.15, 0.33, 0.51, 0.69, 0.87, 1.05),
            steps=(8, 16, 32, 64, 100, 300),
        )
        num_anchors = gen.num_anchors_per_location()
        cls_out, reg_out = [], []
        for i, (f, a) in enumerate(zip(feats, num_anchors)):
            c = nn.Conv(a * self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"cls_head{i}")(f)
            r = nn.Conv(a * 4, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"reg_head{i}")(f)
            n = f.shape[0]
            cls_out.append(c.reshape(n, -1, self.num_classes))
            reg_out.append(r.reshape(n, -1, 4))
        anchors = gen(self.image_size, [f.shape[1] for f in feats])
        return jnp.concatenate(cls_out, 1), jnp.concatenate(reg_out, 1), anchors

    @property
    def _coder(self) -> BoxCoder:
        return BoxCoder(weights=(10.0, 10.0, 5.0, 5.0))

    def postprocess(self, cls_logits, bbox_deltas, anchors, image_size):
        """Softmax scores, per-class NMS -> fixed-size detections (reference
        ``ssd.py:postprocess_detections``)."""
        num_fg = self.num_classes - 1

        def per_image(logits, deltas):
            scores = jax.nn.softmax(logits)[:, 1:]  # (A, C-1)
            boxes = self._coder.decode(deltas, anchors)
            boxes = clip_boxes_to_image(boxes, image_size)
            # reference: per-CLASS top-k of thresholded scores
            # (ssd.py:postprocess_detections), then one joint batched NMS
            k_pc = min(self.topk_candidates, scores.shape[0])
            thr = jnp.where(scores > self.score_thresh, scores, 0.0)
            pc_s, pc_a = jax.lax.top_k(thr.T, k_pc)  # (C-1, k_pc) over anchors
            cls_ids = jnp.broadcast_to(jnp.arange(num_fg)[:, None], pc_s.shape)
            flat_s = pc_s.reshape(-1)
            flat_a = pc_a.reshape(-1)
            flat_c = cls_ids.reshape(-1)
            k = min(self.nms_candidates, flat_s.shape[0])
            top_s, sel_i = jax.lax.top_k(flat_s, k)
            a_idx = flat_a[sel_i]
            c_idx = flat_c[sel_i]
            keep = batched_nms(boxes[a_idx], top_s, c_idx, self.nms_thresh)
            final = jnp.where(keep, top_s, -1.0)
            k2 = min(self.max_detections, k)
            sel_s, sel = jax.lax.top_k(final, k2)
            valid = sel_s > 0
            return {
                "boxes": boxes[a_idx][sel],
                "scores": jnp.where(valid, sel_s, 0.0),
                "labels": jnp.where(valid, c_idx[sel] + 1, -1),
                "valid": valid,
            }

        return jax.vmap(per_image)(cls_logits, bbox_deltas)


@register_model("ssd300_vgg16")
def ssd300_vgg16(*, num_classes: int = 91, dtype=jnp.float32, **kwargs) -> SSD:
    return SSD(num_classes=num_classes, dtype=dtype, **kwargs)

"""RetinaNet (reference ``torchvision/models/detection/retinanet.py``):
ResNet-FPN (P3-P7) + shared classification/regression heads, focal loss,
anchor matching, batched-NMS postprocessing.

TPU-native: everything is fixed shape — targets are padded (G_max, 4) boxes
with a validity mask; postprocess returns padded ``max_detections`` arrays
with scores/validity instead of dynamic lists.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..._dtype import cast_to_float
from ...ops import batched_nms, box_iou, clip_boxes_to_image, sigmoid_focal_loss
from .._api import register_model
from ..resnet import Bottleneck, ResNet
from ._utils import BoxCoder, Matcher
from .anchor_utils import AnchorGenerator
from .backbone_utils import BackboneWithFPN

__all__ = ["RetinaNet", "retinanet_resnet50_fpn", "RetinaNetHead"]


class RetinaNetHead(nn.Module):
    """Shared conv towers for classification and regression (reference
    ``RetinaNetClassificationHead``/``RetinaNetRegressionHead``,
    ``retinanet.py:40-210``)."""

    num_classes: int
    num_anchors: int
    channels: int = 256
    norm: str | None = None  # "group" = v2 recipe (GroupNorm(32) in towers)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        use_bias = self.norm is None  # v2 towers: GN replaces the conv bias
        cls_tower = [nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                             use_bias=use_bias, dtype=self.dtype,
                             name=f"cls_conv{i}") for i in range(4)]
        reg_tower = [nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                             use_bias=use_bias, dtype=self.dtype,
                             name=f"reg_conv{i}") for i in range(4)]
        cls_norms = [nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"cls_gn{i}")
                     for i in range(4)] if self.norm == "group" else None
        reg_norms = [nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"reg_gn{i}")
                     for i in range(4)] if self.norm == "group" else None
        # prior-prob bias init for the classification logits (reference :71)
        bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        cls_logits = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                             padding=[(1, 1), (1, 1)], bias_init=bias_init,
                             dtype=self.dtype, name="cls_logits")
        bbox_reg = nn.Conv(self.num_anchors * 4, (3, 3), padding=[(1, 1), (1, 1)],
                           dtype=self.dtype, name="bbox_reg")
        all_cls, all_reg = [], []
        for f in features:
            c = f
            for i, conv in enumerate(cls_tower):
                c = conv(c)
                if cls_norms is not None:
                    c = cls_norms[i](c)
                c = nn.relu(c)
            c = cls_logits(c)
            n, h, w, _ = c.shape
            all_cls.append(c.reshape(n, h * w * self.num_anchors, self.num_classes))
            r = f
            for i, conv in enumerate(reg_tower):
                r = conv(r)
                if reg_norms is not None:
                    r = reg_norms[i](r)
                r = nn.relu(r)
            r = bbox_reg(r)
            all_reg.append(r.reshape(n, h * w * self.num_anchors, 4))
        return jnp.concatenate(all_cls, axis=1), jnp.concatenate(all_reg, axis=1)


class RetinaNet(nn.Module):
    """(reference ``RetinaNet``, ``retinanet.py:319-620``)."""

    num_classes: int = 91
    # reference _default_anchorgen truncates the intermediate scales to int
    # (retinanet.py:51)
    anchor_sizes: Sequence[Sequence[float]] = tuple(
        (s, int(s * 2 ** (1 / 3)), int(s * 2 ** (2 / 3))) for s in (32, 64, 128, 256, 512)
    )
    aspect_ratios: Sequence[Sequence[float]] = ((0.5, 1.0, 2.0),) * 5
    fg_iou_thresh: float = 0.5
    bg_iou_thresh: float = 0.4
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    max_detections: int = 300
    topk_candidates: int = 1000
    variant: str = "v1"  # "v2" = GroupNorm towers (retinanet_resnet50_fpn_v2)
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = BackboneWithFPN(
            ResNet(Bottleneck, (3, 4, 6, 3), dtype=self.dtype),
            out_channels=256,
            extra_p6p7=True,
            # reference: v1 LastLevelP6P7(256, 256) rides P5; v2 (2048, 256) C5
            p6p7_source="p5" if self.variant == "v1" else "c5",
            dtype=self.dtype,
        )
        num_anchors = len(self.anchor_sizes[0]) * len(self.aspect_ratios[0])
        self.head = RetinaNetHead(
            self.num_classes, num_anchors,
            norm="group" if self.variant == "v2" else None, dtype=self.dtype)

    # stateless helpers (plain Python, usable outside apply)
    @property
    def _box_coder(self) -> BoxCoder:
        return BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))

    @property
    def _matcher(self) -> Matcher:
        return Matcher(self.fg_iou_thresh, self.bg_iou_thresh, allow_low_quality_matches=True)

    def _anchors(self, image_size, features) -> jnp.ndarray:
        gen = AnchorGenerator(self.anchor_sizes, self.aspect_ratios)
        shapes = [(f.shape[1], f.shape[2]) for f in features]
        return jnp.concatenate(gen(image_size, shapes), axis=0)  # (A, 4)

    def __call__(self, images, train: bool = False):
        """Returns (cls_logits (N,A,C), bbox_deltas (N,A,4), anchors (A,4))."""
        features = self.backbone(images, train=train)
        cls_logits, bbox_deltas = self.head(features)
        anchors = self._anchors((images.shape[1], images.shape[2]), features)
        return cls_logits, bbox_deltas, anchors

    # ------------------------------------------------------------- loss

    def compute_loss(
        self,
        cls_logits: jnp.ndarray,
        bbox_deltas: jnp.ndarray,
        anchors: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_labels: jnp.ndarray,
        gt_valid: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        """Focal classification loss + L1 box loss (reference
        ``retinanet.py:compute_loss`` / head losses :100-208).

        ``gt_boxes`` (N, G, 4) xyxy padded, ``gt_labels`` (N, G) int,
        ``gt_valid`` (N, G) bool.
        """

        def per_image(logits, deltas, boxes, labels, valid):
            iou = box_iou(boxes, anchors)  # (G, A)
            matches = self._matcher(iou, valid)  # (A,)
            fg = matches >= 0
            midx = jnp.maximum(matches, 0)
            matched_boxes = boxes[midx]
            matched_labels = labels[midx]
            # classification targets: one-hot for fg, zeros for bg, ignore between
            tgt = jax.nn.one_hot(matched_labels, self.num_classes) * fg[:, None]
            valid_anchor = matches != Matcher.BETWEEN_THRESHOLDS
            cls_loss = sigmoid_focal_loss(logits, tgt, reduction="none")
            cls_loss = (cls_loss.sum(-1) * valid_anchor).sum() / jnp.maximum(fg.sum(), 1)
            # regression on foreground anchors
            reg_tgt = self._box_coder.encode(matched_boxes, anchors)
            reg_loss = jnp.abs(deltas - reg_tgt).sum(-1)
            reg_loss = (reg_loss * fg).sum() / jnp.maximum(fg.sum(), 1)
            return cls_loss, reg_loss

        cls_l, reg_l = jax.vmap(per_image)(cls_logits, bbox_deltas, gt_boxes, gt_labels, gt_valid)
        return {"classification": cls_l.mean(), "bbox_regression": reg_l.mean()}

    # ------------------------------------------------------- postprocess

    def postprocess(
        self,
        cls_logits: jnp.ndarray,
        bbox_deltas: jnp.ndarray,
        anchors: jnp.ndarray,
        image_size: Tuple[int, int],
        level_sizes: Sequence[int] | None = None,
    ) -> Dict[str, jnp.ndarray]:
        """Decode + threshold + batched NMS -> fixed-size detections
        (reference ``postprocess_detections``, ``retinanet.py:392-466``).
        The reference selects ``topk_candidates`` PER LEVEL before NMS; pass
        ``level_sizes`` (anchors per FPN level) to reproduce that exactly —
        without it the top-k is global over all levels.
        Returns dict of (N, max_detections) arrays + 'valid' mask."""
        if level_sizes is not None:
            offsets = [0]
            for s in level_sizes:
                offsets.append(offsets[-1] + s)

        def per_image(logits, deltas):
            scores = jax.nn.sigmoid(logits)  # (A, C)
            if level_sizes is None:
                flat = scores.reshape(-1)
                k = min(self.topk_candidates, flat.shape[0])
                top_scores, top_idx = jax.lax.top_k(flat, k)
            else:
                per_level_s, per_level_i = [], []
                for li, s in enumerate(level_sizes):
                    lflat = scores[offsets[li]: offsets[li + 1]].reshape(-1)
                    lk = min(self.topk_candidates, lflat.shape[0])
                    ts, ti = jax.lax.top_k(lflat, lk)
                    per_level_s.append(ts)
                    per_level_i.append(ti + offsets[li] * self.num_classes)
                top_scores = jnp.concatenate(per_level_s)
                top_idx = jnp.concatenate(per_level_i)
            anchor_idx = top_idx // self.num_classes
            class_idx = top_idx % self.num_classes
            boxes = self._box_coder.decode(deltas[anchor_idx], anchors[anchor_idx])
            boxes = clip_boxes_to_image(boxes, image_size)
            keep_score = top_scores > self.score_thresh
            nms_scores = jnp.where(keep_score, top_scores, 0.0)
            keep = batched_nms(boxes, nms_scores, class_idx, self.nms_thresh)
            keep = keep & keep_score
            final_scores = jnp.where(keep, top_scores, -1.0)
            k2 = min(self.max_detections, final_scores.shape[0])
            sel_scores, sel = jax.lax.top_k(final_scores, k2)
            valid = sel_scores > 0
            return {
                "boxes": boxes[sel],
                "scores": jnp.where(valid, sel_scores, 0.0),
                "labels": jnp.where(valid, class_idx[sel], -1),
                "valid": valid,
            }

        return jax.vmap(per_image)(cls_logits, bbox_deltas)


@register_model("retinanet_resnet50_fpn")
def retinanet_resnet50_fpn(*, num_classes: int = 91, dtype=jnp.float32, **kwargs) -> RetinaNet:
    return RetinaNet(num_classes=num_classes, dtype=dtype, **kwargs)


@register_model("retinanet_resnet50_fpn_v2")
def retinanet_resnet50_fpn_v2(*, num_classes: int = 91, dtype=jnp.float32, **kwargs) -> RetinaNet:
    """v2 recipe: GroupNorm(32) tower heads (reference
    ``retinanet_resnet50_fpn_v2``, ``retinanet.py:720-790``; 41.5 box mAP)."""
    return RetinaNet(num_classes=num_classes, variant="v2", dtype=dtype, **kwargs)

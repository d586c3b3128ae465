"""FCOS — anchor-free single-stage detector (reference
``torchvision/models/detection/fcos.py``): per-location (l, t, r, b)
distance regression + centerness, GIoU box loss, center-sampling assignment.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import batched_nms, clip_boxes_to_image, generalized_box_iou_loss, sigmoid_focal_loss
from .._api import register_model
from ..resnet import Bottleneck, ResNet
from .backbone_utils import BackboneWithFPN

__all__ = ["FCOS", "fcos_resnet50_fpn"]


class FCOSHead(nn.Module):
    """Shared towers: classification + (regression, centerness) (reference
    ``FCOSClassificationHead``/``FCOSRegressionHead``, ``fcos.py:60-200``)."""

    num_classes: int
    channels: int = 256
    num_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        # reference towers: plain Conv2d (bias kept) + GroupNorm(32) + relu
        # (fcos.py:167-172, 227-232)
        cls_tower = [nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                             dtype=self.dtype,
                             name=f"cls_conv{i}") for i in range(self.num_convs)]
        reg_tower = [nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                             dtype=self.dtype,
                             name=f"reg_conv{i}") for i in range(self.num_convs)]
        cls_norms = [nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"cls_gn{i}")
                     for i in range(self.num_convs)]
        reg_norms = [nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"reg_gn{i}")
                     for i in range(self.num_convs)]
        bias_init = nn.initializers.constant(-math.log((1 - 0.01) / 0.01))
        cls_logits = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                             bias_init=bias_init, dtype=self.dtype, name="cls_logits")
        bbox_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="bbox_reg")
        ctrness = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="ctrness")
        all_cls, all_reg, all_ctr = [], [], []
        for f in features:
            c = f
            for conv, gn in zip(cls_tower, cls_norms):
                c = nn.relu(gn(conv(c)))
            n, h, w, _ = f.shape
            all_cls.append(cls_logits(c).reshape(n, h * w, self.num_classes))
            r = f
            for conv, gn in zip(reg_tower, reg_norms):
                r = nn.relu(gn(conv(r)))
            all_reg.append(nn.relu(bbox_reg(r)).reshape(n, h * w, 4))
            all_ctr.append(ctrness(r).reshape(n, h * w))
        return (
            jnp.concatenate(all_cls, 1),
            jnp.concatenate(all_reg, 1),
            jnp.concatenate(all_ctr, 1),
        )


class FCOS(nn.Module):
    """(reference ``FCOS``, ``fcos.py:210-660``)."""

    num_classes: int = 91
    score_thresh: float = 0.2
    nms_thresh: float = 0.6
    max_detections: int = 100
    topk_candidates: int = 1000
    center_sampling_radius: float = 1.5
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = BackboneWithFPN(
            ResNet(Bottleneck, (3, 4, 6, 3), dtype=self.dtype),
            out_channels=256, extra_p6p7=True, dtype=self.dtype,
        )
        self.head = FCOSHead(self.num_classes, dtype=self.dtype)

    @staticmethod
    def _locations(image_size, features) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-location centers (P, 2) as (x, y) + per-location stride (P,)."""
        ih = image_size[0]
        pts, strides = [], []
        for f in features:
            h, w = f.shape[1], f.shape[2]
            stride = ih // h
            # reference FCOS anchors are zero-area-ish boxes centered at
            # x*stride (AnchorGenerator shifts carry no +0.5 offset;
            # BoxLinearCoder then decodes around those centers)
            ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
            cx = xs.reshape(-1).astype(np.float32) * stride
            cy = ys.reshape(-1).astype(np.float32) * stride
            pts.append(np.stack([cx, cy], -1))
            strides.append(np.full((h * w,), stride, np.float32))
        return jnp.asarray(np.concatenate(pts).astype(np.float32)), jnp.asarray(np.concatenate(strides))

    def __call__(self, images, train: bool = False):
        """Returns (cls_logits (N,P,C), ltrb (N,P,4), ctrness (N,P),
        locations (P,2), strides (P,))."""
        features = self.backbone(images, train=train)
        cls_logits, reg, ctr = self.head(features)
        locs, strides = self._locations((images.shape[1], images.shape[2]), features)
        return cls_logits, reg, ctr, locs, strides

    def compute_loss(self, cls_logits, reg, ctr, locs, strides, gt_boxes, gt_labels, gt_valid):
        """Focal cls + GIoU box + BCE centerness (reference
        ``fcos.py:compute_loss`` :300-390), with center sampling."""

        def per_image(logits, ltrb, ctrness, boxes, labels, valid):
            # distances of every location to every gt box (P, G, 4)
            x, y = locs[:, 0:1], locs[:, 1:2]
            l = x - boxes[None, :, 0]
            t = y - boxes[None, :, 1]
            r = boxes[None, :, 2] - x
            b = boxes[None, :, 3] - y
            ltrb_gt = jnp.stack([l, t, r, b], axis=-1)  # (P, G, 4)
            inside_box = ltrb_gt.min(-1) > 0
            # center sampling: within radius*stride of the gt center
            cx = (boxes[:, 0] + boxes[:, 2]) / 2
            cy = (boxes[:, 1] + boxes[:, 3]) / 2
            radius = self.center_sampling_radius * strides[:, None]
            near_center = (jnp.abs(x - cx[None]) < radius) & (jnp.abs(y - cy[None]) < radius)
            candidate = inside_box & near_center & valid[None, :]
            # assign each location the smallest-area candidate gt
            areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            big = jnp.float32(1e18)
            cand_areas = jnp.where(candidate, areas[None, :], big)
            gidx = jnp.argmin(cand_areas, axis=1)
            fg = cand_areas.min(axis=1) < big
            tgt_boxes = boxes[gidx]
            tgt_labels = labels[gidx]

            cls_tgt = jax.nn.one_hot(tgt_labels, self.num_classes) * fg[:, None]
            cls_loss = sigmoid_focal_loss(logits, cls_tgt, reduction="sum") / jnp.maximum(fg.sum(), 1)

            # regression: predicted ltrb (scaled by stride) -> boxes
            pred_boxes = jnp.stack(
                [locs[:, 0] - ltrb[:, 0] * strides, locs[:, 1] - ltrb[:, 1] * strides,
                 locs[:, 0] + ltrb[:, 2] * strides, locs[:, 1] + ltrb[:, 3] * strides], -1)
            giou = generalized_box_iou_loss(pred_boxes, tgt_boxes, reduction="none")
            reg_loss = (giou * fg).sum() / jnp.maximum(fg.sum(), 1)

            # centerness target from gt ltrb
            sel = jnp.take_along_axis(ltrb_gt, gidx[:, None, None], axis=1)[:, 0, :]
            lr = jnp.stack([sel[:, 0], sel[:, 2]], -1)
            tb = jnp.stack([sel[:, 1], sel[:, 3]], -1)
            ctr_tgt = jnp.sqrt(
                jnp.clip(lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6), 0, 1)
                * jnp.clip(tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6), 0, 1)
            )
            bce = jnp.maximum(ctrness, 0) - ctrness * ctr_tgt + jnp.log1p(jnp.exp(-jnp.abs(ctrness)))
            ctr_loss = (bce * fg).sum() / jnp.maximum(fg.sum(), 1)
            return cls_loss, reg_loss, ctr_loss

        cls_l, reg_l, ctr_l = jax.vmap(per_image)(cls_logits, reg, ctr, gt_boxes, gt_labels, gt_valid)
        return {
            "classification": cls_l.mean(),
            "bbox_regression": reg_l.mean(),
            "bbox_ctrness": ctr_l.mean(),
        }

    def postprocess(self, cls_logits, reg, ctr, locs, strides, image_size,
                    level_sizes: Sequence[int] | None = None):
        """sqrt(cls·ctrness) scores + NMS (reference
        ``fcos.py:postprocess_detections``).  Pass ``level_sizes`` (locations
        per FPN level) for the reference's per-level top-k selection."""
        if level_sizes is not None:
            offsets = [0]
            for s in level_sizes:
                offsets.append(offsets[-1] + s)

        def per_image(logits, ltrb, ctrness):
            scores = jnp.sqrt(jax.nn.sigmoid(logits) * jax.nn.sigmoid(ctrness)[:, None])
            boxes = jnp.stack(
                [locs[:, 0] - ltrb[:, 0] * strides, locs[:, 1] - ltrb[:, 1] * strides,
                 locs[:, 0] + ltrb[:, 2] * strides, locs[:, 1] + ltrb[:, 3] * strides], -1)
            boxes = clip_boxes_to_image(boxes, image_size)
            thr = jnp.where(scores > self.score_thresh, scores, 0.0)
            if level_sizes is None:
                flat = thr.reshape(-1)
                k = min(self.topk_candidates, flat.shape[0])
                top_s, top_i = jax.lax.top_k(flat, k)
            else:
                per_s, per_i = [], []
                for li, s in enumerate(level_sizes):
                    lflat = thr[offsets[li]: offsets[li + 1]].reshape(-1)
                    lk = min(self.topk_candidates, lflat.shape[0])
                    ts, ti = jax.lax.top_k(lflat, lk)
                    per_s.append(ts)
                    per_i.append(ti + offsets[li] * self.num_classes)
                top_s = jnp.concatenate(per_s)
                top_i = jnp.concatenate(per_i)
            p_idx = top_i // self.num_classes
            c_idx = top_i % self.num_classes
            keep = batched_nms(boxes[p_idx], top_s, c_idx, self.nms_thresh)
            final = jnp.where(keep, top_s, -1.0)
            k2 = min(self.max_detections, final.shape[0])
            sel_s, sel = jax.lax.top_k(final, k2)
            valid = sel_s > 0
            return {
                "boxes": boxes[p_idx][sel],
                "scores": jnp.where(valid, sel_s, 0.0),
                "labels": jnp.where(valid, c_idx[sel], -1),
                "valid": valid,
            }

        return jax.vmap(per_image)(cls_logits, reg, ctr)


@register_model("fcos_resnet50_fpn")
def fcos_resnet50_fpn(*, num_classes: int = 91, dtype=jnp.float32, **kwargs) -> FCOS:
    return FCOS(num_classes=num_classes, dtype=dtype, **kwargs)

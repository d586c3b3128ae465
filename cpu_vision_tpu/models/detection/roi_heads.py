"""RoI heads: box head + predictors + training/inference logic (reference
``torchvision/models/detection/roi_heads.py:492-850`` and
``faster_rcnn.py:TwoMLPHead/FastRCNNPredictor``).

Fixed shapes: training samples a static ``batch_size_per_image`` of
proposals per image (masked); inference emits padded ``max_detections``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import batched_nms, box_iou, clip_boxes_to_image
from ...ops.poolers import multiscale_roi_align
from ._utils import BalancedPositiveNegativeSampler, BoxCoder, Matcher
from .rpn import smooth_l1

__all__ = ["TwoMLPHead", "FastRCNNConvFCHead", "FastRCNNPredictor", "RoIHeads",
           "paste_masks_in_image"]


def paste_masks_in_image(masks: jnp.ndarray, boxes: jnp.ndarray,
                         image_size: Tuple[int, int],
                         padding: int = 1) -> jnp.ndarray:
    """Paste per-detection mask probabilities into full-image canvases.

    Reference semantics (``roi_heads.py:392-474``: ``expand_masks`` 1-px
    zero pad + box expansion by ``(M+2p)/M``, integer-truncated box, bilinear
    ``align_corners=False`` resize to the box, paste clipped to the image) —
    re-designed for TPU as a static-shape inverse map: every output pixel
    bilinearly samples the padded mask at its pre-image, so the whole op is
    one vectorised gather over a fixed (D, H, W) grid (no dynamic resize,
    no per-box python loop) and jit/vmap-compatible.

    masks: (D, M, M) float probabilities; boxes: (D, 4) xyxy float;
    returns (D, H, W) float, zero outside each box.
    """
    h_img, w_img = image_size
    m = masks.shape[-1]
    scale = float(m + 2 * padding) / m
    padded = jnp.pad(masks, ((0, 0), (padding, padding), (padding, padding)))
    mp = m + 2 * padding

    # expand about the center, then truncate toward zero like `.to(int64)`
    w_half = (boxes[:, 2] - boxes[:, 0]) * 0.5 * scale
    h_half = (boxes[:, 3] - boxes[:, 1]) * 0.5 * scale
    x_c = (boxes[:, 2] + boxes[:, 0]) * 0.5
    y_c = (boxes[:, 3] + boxes[:, 1]) * 0.5
    x0 = jnp.trunc(x_c - w_half).astype(jnp.int32)
    y0 = jnp.trunc(y_c - h_half).astype(jnp.int32)
    x1 = jnp.trunc(x_c + w_half).astype(jnp.int32)
    y1 = jnp.trunc(y_c + h_half).astype(jnp.int32)
    bw = jnp.maximum(x1 - x0 + 1, 1)
    bh = jnp.maximum(y1 - y0 + 1, 1)

    ys = jnp.arange(h_img, dtype=jnp.float32)
    xs = jnp.arange(w_img, dtype=jnp.float32)

    def one(mask, px0, py0, pbw, pbh, px1, py1):
        # interpolate's align_corners=False source coordinate, border-clamped
        sy = (ys - py0 + 0.5) * (mp / pbh) - 0.5
        sx = (xs - px0 + 0.5) * (mp / pbw) - 0.5
        sy = jnp.clip(sy, 0.0, mp - 1.0)
        sx = jnp.clip(sx, 0.0, mp - 1.0)
        y_lo = jnp.floor(sy).astype(jnp.int32)
        x_lo = jnp.floor(sx).astype(jnp.int32)
        y_hi = jnp.minimum(y_lo + 1, mp - 1)
        x_hi = jnp.minimum(x_lo + 1, mp - 1)
        wy = (sy - y_lo)[:, None]
        wx = (sx - x_lo)[None, :]
        v = (mask[y_lo][:, x_lo] * (1 - wy) * (1 - wx)
             + mask[y_lo][:, x_hi] * (1 - wy) * wx
             + mask[y_hi][:, x_lo] * wy * (1 - wx)
             + mask[y_hi][:, x_hi] * wy * wx)
        inside = ((ys >= py0) & (ys <= py1))[:, None] & ((xs >= px0) & (xs <= px1))[None, :]
        return jnp.where(inside, v, 0.0)

    return jax.vmap(one)(padded.astype(jnp.float32), x0, y0, bw, bh, x1, y1)


class TwoMLPHead(nn.Module):
    """Flatten + 2x FC (reference ``TwoMLPHead``, ``faster_rcnn.py:288``)."""

    representation_size: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype)(x))
        return x


class FastRCNNConvFCHead(nn.Module):
    """4x (3x3 conv + BN + relu) then flatten + FC — the v2-recipe box head
    (reference ``FastRCNNConvFCHead``, ``faster_rcnn.py:322``)."""

    channels: int = 256
    conv_layers: int = 4
    representation_size: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.conv_layers):
            x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.relu(nn.Dense(self.representation_size, dtype=self.dtype)(x))


class FastRCNNPredictor(nn.Module):
    """Class scores + per-class box deltas (reference ``FastRCNNPredictor``,
    ``faster_rcnn.py:308``)."""

    num_classes: int  # includes background at index 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scores = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype)(x)
        return scores, deltas


class RoIHeads(nn.Module):
    """(reference ``RoIHeads``, ``roi_heads.py:492``)."""

    num_classes: int = 91  # incl. background
    pooled_size: int = 7
    fg_iou_thresh: float = 0.5
    bg_iou_thresh: float = 0.5
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    max_detections: int = 100
    # static NMS candidate bound.  The reference NMS-es every candidate above
    # score_thresh (roi_heads.py:668-727, dynamic shape); with trained COCO
    # weights the >0.05 survivors are far below this bound, so the fixed-shape
    # top-k is mAP-neutral in practice.  Raise it if score_thresh is lowered.
    pre_nms_detections: int = 4096
    box_head_type: str = "mlp"  # "mlp" (v1) | "convfc" (v2 recipe)
    dtype: Any = jnp.float32

    def setup(self):
        if self.box_head_type == "convfc":
            self.box_head = FastRCNNConvFCHead(dtype=self.dtype)
        else:
            self.box_head = TwoMLPHead(dtype=self.dtype)
        self.predictor = FastRCNNPredictor(self.num_classes, dtype=self.dtype)

    @property
    def _coder(self) -> BoxCoder:
        return BoxCoder(weights=(10.0, 10.0, 5.0, 5.0))

    def _pool_and_predict(self, features, rois, image_size, train: bool = False):
        # feature strides are powers of two; shapes are static under jit
        scales = [2.0 ** _log2i(f.shape[1], image_size[0]) for f in features]
        pooled = multiscale_roi_align(
            features, rois, (self.pooled_size, self.pooled_size), scales=scales
        )
        x = self.box_head(pooled, train=train)
        return self.predictor(x)

    def __call__(self, features: Sequence[jnp.ndarray], proposals: jnp.ndarray,
                 image_size: Tuple[int, int], train: bool = False):
        """features: FPN levels (P2..P5); proposals (N, P, 4).
        Returns (class_logits (N, P, C), box_deltas (N, P, C, 4))."""
        n, p, _ = proposals.shape
        batch_idx = jnp.repeat(jnp.arange(n, dtype=proposals.dtype), p)
        rois = jnp.concatenate([batch_idx[:, None], proposals.reshape(-1, 4)], axis=1)
        scores, deltas = self._pool_and_predict(features, rois, image_size, train)
        return (
            scores.reshape(n, p, self.num_classes),
            deltas.reshape(n, p, self.num_classes, 4),
        )

    # ---------------------------------------------------------- training

    def select_training_samples(
        self,
        proposals: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_labels: jnp.ndarray,
        gt_valid: jnp.ndarray,
        key: jax.Array,
    ):
        """Match proposals (+gt appended) to targets and sample a fixed
        subset (reference ``select_training_samples``, ``roi_heads.py:551``).
        Returns (rois (N, S, 4), labels (N, S), reg_targets (N, S, 4),
        sampled_mask, pos_mask)."""
        matcher = Matcher(self.fg_iou_thresh, self.bg_iou_thresh)
        sampler = BalancedPositiveNegativeSampler(self.batch_size_per_image, self.positive_fraction)
        s = min(self.batch_size_per_image, proposals.shape[1] + gt_boxes.shape[1])

        def per_image(props, boxes, labels, valid, k):
            cand = jnp.concatenate([props, boxes], axis=0)  # add gt as proposals
            iou = box_iou(boxes, cand)
            matches = matcher(iou, valid)
            cls = jnp.where(matches >= 0, labels[jnp.maximum(matches, 0)], 0)
            smp_labels = jnp.where(matches >= 0, 1, jnp.where(matches == Matcher.BELOW_LOW_THRESHOLD, 0, -1))
            pos_mask, neg_mask = sampler(smp_labels, k)
            sampled = pos_mask | neg_mask
            # gather a fixed number of sampled rows (priority: sampled first)
            pri = sampled.astype(jnp.float32) + pos_mask.astype(jnp.float32)
            _, idx = jax.lax.top_k(pri + jax.random.uniform(k, pri.shape) * 0.1, s)
            rois = cand[idx]
            cls_s = cls[idx]
            pos_s = pos_mask[idx]
            smp_s = sampled[idx]
            matched_boxes = boxes[jnp.maximum(matches, 0)][idx]
            reg_tgt = self._coder.encode(matched_boxes, rois)
            return rois, cls_s, reg_tgt, smp_s, pos_s

        keys = jax.random.split(key, proposals.shape[0])
        return jax.vmap(per_image)(proposals, gt_boxes, gt_labels, gt_valid, keys)

    def compute_loss(self, class_logits, box_deltas, labels, reg_targets, sampled, pos):
        """CE + smooth-L1 on the class-specific deltas (reference
        ``fastrcnn_loss``, ``roi_heads.py:28-78``)."""
        logp = jax.nn.log_softmax(class_logits)
        ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        cls_loss = (ce * sampled).sum() / jnp.maximum(sampled.sum(), 1)
        # deltas for the target class
        idx = labels[..., None, None]
        d = jnp.take_along_axis(box_deltas, jnp.broadcast_to(idx, labels.shape + (1, 4)), axis=2)[..., 0, :]
        reg = smooth_l1(d - reg_targets).sum(-1)
        reg_loss = (reg * pos).sum() / jnp.maximum(sampled.sum(), 1)
        return {"loss_classifier": cls_loss, "loss_box_reg": reg_loss}

    # --------------------------------------------------------- inference

    def postprocess(self, class_logits, box_deltas, proposals, image_size):
        """Per-class decode + NMS -> fixed-size detections (reference
        ``postprocess_detections``, ``roi_heads.py:668``)."""
        num_fg = self.num_classes - 1

        def per_image(logits, deltas, props):
            scores = jax.nn.softmax(logits)[:, 1:]  # drop background
            boxes = self._coder.decode(deltas[:, 1:, :], props[:, None, :])  # (P, C-1, 4)
            boxes = clip_boxes_to_image(boxes, image_size)
            flat_scores = scores.reshape(-1)
            flat_boxes = boxes.reshape(-1, 4)
            cls_ids = jnp.tile(jnp.arange(num_fg), scores.shape[0])
            keep_score = flat_scores > self.score_thresh
            nms_scores = jnp.where(keep_score, flat_scores, 0.0)
            k = min(max(self.pre_nms_detections, 4 * self.max_detections),
                    flat_scores.shape[0])
            top_s, top_i = jax.lax.top_k(nms_scores, k)
            keep = batched_nms(flat_boxes[top_i], top_s, cls_ids[top_i], self.nms_thresh)
            final = jnp.where(keep, top_s, -1.0)
            k2 = min(self.max_detections, k)
            sel_s, sel = jax.lax.top_k(final, k2)
            valid = sel_s > 0
            return {
                "boxes": flat_boxes[top_i][sel],
                "scores": jnp.where(valid, sel_s, 0.0),
                "labels": jnp.where(valid, cls_ids[top_i][sel] + 1, -1),
                "valid": valid,
            }

        return jax.vmap(per_image)(class_logits, box_deltas, proposals)


def _log2i(f: int, i: int) -> float:
    import math

    return round(math.log2(f / i))

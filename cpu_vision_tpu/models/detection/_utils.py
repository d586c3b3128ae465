"""Detection building blocks: box coding, matching, sampling.

References: ``torchvision/models/detection/_utils.py`` — ``BoxCoder``
(:122), ``Matcher`` (:314), ``BalancedPositiveNegativeSampler`` (:14).
TPU-native: the Matcher returns fixed-shape index/label arrays (no dynamic
filtering); samplers return boolean masks.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["BoxCoder", "Matcher", "BalancedPositiveNegativeSampler"]


class BoxCoder:
    """Encode boxes as center/size deltas w.r.t. anchors (reference
    ``BoxCoder``, ``detection/_utils.py:122-219``)."""

    def __init__(self, weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
                 bbox_xform_clip: float = math.log(1000.0 / 16)):
        self.weights = weights
        self.bbox_xform_clip = bbox_xform_clip

    def encode(self, reference_boxes: jax.Array, proposals: jax.Array) -> jax.Array:
        """deltas such that decode(deltas, proposals) == reference_boxes.

        Departure from the reference's exact math (``detection/_utils.py:158``):
        widths/heights are clamped to a tiny epsilon. The reference only ever
        encodes gathered *positive* pairs (dynamic shapes), which cannot be
        degenerate; this fixed-shape design also encodes padded/unmatched rows
        whose loss is masked out later — but an inf/NaN produced here would
        poison gradients straight through the mask (0 * inf = NaN), so the
        garbage rows must stay finite. Real positives (IoU >= 0.5) always have
        w, h >> eps, where the clamp is the identity.
        """
        wx, wy, ww, wh = self.weights
        eps = 1e-6
        ex_w = jnp.maximum(proposals[..., 2] - proposals[..., 0], eps)
        ex_h = jnp.maximum(proposals[..., 3] - proposals[..., 1], eps)
        ex_cx = proposals[..., 0] + 0.5 * ex_w
        ex_cy = proposals[..., 1] + 0.5 * ex_h
        gt_w = jnp.maximum(reference_boxes[..., 2] - reference_boxes[..., 0], eps)
        gt_h = jnp.maximum(reference_boxes[..., 3] - reference_boxes[..., 1], eps)
        gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
        gt_cy = reference_boxes[..., 1] + 0.5 * gt_h
        dx = wx * (gt_cx - ex_cx) / ex_w
        dy = wy * (gt_cy - ex_cy) / ex_h
        dw = ww * jnp.log(gt_w / ex_w)
        dh = wh * jnp.log(gt_h / ex_h)
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def decode(self, deltas: jax.Array, boxes: jax.Array) -> jax.Array:
        """Apply deltas to anchor boxes -> xyxy."""
        wx, wy, ww, wh = self.weights
        widths = boxes[..., 2] - boxes[..., 0]
        heights = boxes[..., 3] - boxes[..., 1]
        cx = boxes[..., 0] + 0.5 * widths
        cy = boxes[..., 1] + 0.5 * heights
        dx = deltas[..., 0] / wx
        dy = deltas[..., 1] / wy
        dw = jnp.clip(deltas[..., 2] / ww, None, self.bbox_xform_clip)
        dh = jnp.clip(deltas[..., 3] / wh, None, self.bbox_xform_clip)
        pred_cx = dx * widths + cx
        pred_cy = dy * heights + cy
        pred_w = jnp.exp(dw) * widths
        pred_h = jnp.exp(dh) * heights
        return jnp.stack(
            [pred_cx - 0.5 * pred_w, pred_cy - 0.5 * pred_h,
             pred_cx + 0.5 * pred_w, pred_cy + 0.5 * pred_h],
            axis=-1,
        )


class Matcher:
    """Assign each anchor the best-IoU ground-truth index (reference
    ``Matcher``, ``detection/_utils.py:314-400``).

    Returns int32 matches (A,): gt index >= 0, BELOW_LOW = -1,
    BETWEEN = -2.  ``gt_valid`` masks padded gt rows.
    """

    BELOW_LOW_THRESHOLD = -1
    BETWEEN_THRESHOLDS = -2

    def __init__(self, high_threshold: float, low_threshold: float,
                 allow_low_quality_matches: bool = False):
        if low_threshold > high_threshold:
            raise ValueError("low_threshold must be <= high_threshold")
        self.high_threshold = high_threshold
        self.low_threshold = low_threshold
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(self, match_quality_matrix: jax.Array,
                 gt_valid: Optional[jax.Array] = None) -> jax.Array:
        """``match_quality_matrix`` (G, A) IoU; padded gt rows masked to -1."""
        m = match_quality_matrix
        if gt_valid is not None:
            m = jnp.where(gt_valid[:, None], m, -1.0)
        matched_vals = jnp.max(m, axis=0)
        matches = jnp.argmax(m, axis=0).astype(jnp.int32)
        below = matched_vals < self.low_threshold
        between = (matched_vals >= self.low_threshold) & (matched_vals < self.high_threshold)
        out = jnp.where(below, self.BELOW_LOW_THRESHOLD, matches)
        out = jnp.where(between, self.BETWEEN_THRESHOLDS, out)
        if self.allow_low_quality_matches:
            # for each gt, anchors sharing its max IoU are force-matched
            highest_per_gt = jnp.max(m, axis=1, keepdims=True)  # (G, 1)
            is_best = (m == highest_per_gt) & (m > 0)
            if gt_valid is not None:
                is_best = is_best & gt_valid[:, None]
            force = jnp.any(is_best, axis=0)
            out = jnp.where(force, matches, out)
        return out


class BalancedPositiveNegativeSampler:
    """Sample pos/neg anchors as boolean masks (reference
    ``BalancedPositiveNegativeSampler``, ``detection/_utils.py:14-111``)."""

    def __init__(self, batch_size_per_image: int, positive_fraction: float):
        self.batch_size_per_image = batch_size_per_image
        self.positive_fraction = positive_fraction

    def __call__(self, labels: jax.Array, key: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """``labels`` (A,): 1 positive, 0 negative, -1 ignore.  Returns
        (pos_mask, neg_mask) with at most the configured counts, selected by
        random priority (fixed shapes; counts are data-dependent but the
        masks are static-size)."""
        num_pos_max = int(self.batch_size_per_image * self.positive_fraction)
        pos = labels == 1
        neg = labels == 0
        kp, kn = jax.random.split(key)
        # random priority, invalid entries pushed to the bottom
        pr_pos = jnp.where(pos, jax.random.uniform(kp, labels.shape), -1.0)
        pr_neg = jnp.where(neg, jax.random.uniform(kn, labels.shape), -1.0)

        def topk_mask(priority, k):
            if k >= priority.shape[0]:
                return priority > 0
            thresh = jax.lax.top_k(priority, k)[0][-1]
            return (priority >= jnp.maximum(thresh, 0)) & (priority > 0)

        pos_mask = topk_mask(pr_pos, num_pos_max)
        num_neg_max = self.batch_size_per_image - num_pos_max
        neg_mask = topk_mask(pr_neg, num_neg_max)
        return pos_mask, neg_mask

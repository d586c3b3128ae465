"""Region Proposal Network (reference
``torchvision/models/detection/rpn.py``: ``RPNHead`` (:15),
``RegionProposalNetwork`` (:113-380)).

TPU-native: proposal filtering is fully fixed-shape — per-level top-k, NMS
over padded candidates, and a static ``post_nms_top_n`` proposal tensor with
validity scores (degenerate entries carry score 0 and never match in the
RoI heads).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import box_iou, clip_boxes_to_image
from ._utils import BalancedPositiveNegativeSampler, BoxCoder, Matcher
from .anchor_utils import AnchorGenerator

__all__ = ["RPNHead", "RegionProposalNetwork"]


def smooth_l1(x: jax.Array, beta: float = 1.0 / 9) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


class RPNHead(nn.Module):
    """3x3 tower + objectness/deltas (reference ``RPNHead``, ``rpn.py:15``;
    ``conv_depth=2`` is the v2-recipe head, ``faster_rcnn.py:fasterrcnn_
    resnet50_fpn_v2``)."""

    num_anchors: int
    channels: int = 256
    conv_depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        convs = [
            nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv" if i == 0 else f"conv{i}")
            for i in range(self.conv_depth)
        ]
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="bbox_pred")
        logits, deltas = [], []
        for f in features:
            t = f
            for conv in convs:
                t = nn.relu(conv(t))
            n, h, w, _ = t.shape
            logits.append(cls(t).reshape(n, h * w * self.num_anchors))
            deltas.append(reg(t).reshape(n, h * w * self.num_anchors, 4))
        return logits, deltas


class RegionProposalNetwork(nn.Module):
    """(reference ``RegionProposalNetwork``, ``rpn.py:113``)."""

    anchor_sizes: Sequence[Sequence[float]] = ((32,), (64,), (128,), (256,), (512,))
    aspect_ratios: Sequence[Sequence[float]] = ((0.5, 1.0, 2.0),) * 5
    pre_nms_top_n: int = 1000
    post_nms_top_n: int = 1000
    nms_thresh: float = 0.7
    fg_iou_thresh: float = 0.7
    bg_iou_thresh: float = 0.3
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    min_size: float = 1e-3
    conv_depth: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        num_anchors = len(self.anchor_sizes[0]) * len(self.aspect_ratios[0])
        self.head = RPNHead(num_anchors, conv_depth=self.conv_depth, dtype=self.dtype)

    @property
    def _coder(self) -> BoxCoder:
        return BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))

    def __call__(self, features: Sequence[jnp.ndarray], image_size: Tuple[int, int]):
        """Returns (proposals (N, post_nms_top_n, 4), scores, per-anchor raw
        outputs for the loss: objectness (N, A), deltas (N, A, 4), anchors (A, 4))."""
        logits, deltas = self.head(features)
        gen = AnchorGenerator(self.anchor_sizes[: len(features)], self.aspect_ratios[: len(features)])
        shapes = [(f.shape[1], f.shape[2]) for f in features]
        anchors_per_level = gen(image_size, shapes)

        # per-level top-k candidates (reference _get_top_n_idx, rpn.py:247)
        cand_boxes, cand_scores = [], []
        for lvl, (lg, dl, anc) in enumerate(zip(logits, deltas, anchors_per_level)):
            k = min(self.pre_nms_top_n, lg.shape[1])

            def per_image(lg_i, dl_i):
                top_s, top_i = jax.lax.top_k(lg_i, k)
                boxes = self._coder.decode(dl_i[top_i], anc[top_i])
                boxes = clip_boxes_to_image(boxes, image_size)
                ws = boxes[:, 2] - boxes[:, 0]
                hs = boxes[:, 3] - boxes[:, 1]
                ok = (ws >= self.min_size) & (hs >= self.min_size)
                scores = jnp.where(ok, jax.nn.sigmoid(top_s), 0.0)
                return boxes, scores

            b, s = jax.vmap(per_image)(lg, dl)
            cand_boxes.append(b)
            cand_scores.append(s)

        # Per-LEVEL NMS (reference semantics: ``batched_nms`` with level ids
        # never cross-suppresses, ``rpn.py:filter_proposals``), computed as
        # independent per-level problems instead of one coordinate-offset
        # NMS over the concatenated 5k candidates — the quadratic IoU/
        # suppression work factors 5x smaller, and same-k levels batch into
        # one vmapped program over (levels x images).
        from ...ops import nms as _nms_mask

        kept_scores = [None] * len(cand_boxes)
        by_k: Dict[int, list] = {}
        for i, (b, s) in enumerate(zip(cand_boxes, cand_scores)):
            by_k.setdefault(b.shape[1], []).append(i)
        for k_lvl, idxs in by_k.items():
            bs = jnp.stack([cand_boxes[i] for i in idxs])   # (L, N, k, 4)
            ss = jnp.stack([cand_scores[i] for i in idxs])
            L, N = bs.shape[:2]
            keep = jax.vmap(lambda bb, sc: _nms_mask(bb, sc, self.nms_thresh))(
                bs.reshape(L * N, k_lvl, 4), ss.reshape(L * N, k_lvl))
            keep = keep.reshape(L, N, k_lvl)
            for j, i in enumerate(idxs):
                kept_scores[i] = jnp.where(keep[j], cand_scores[i], 0.0)
        boxes = jnp.concatenate(cand_boxes, axis=1)  # (N, K_total, 4)
        scores2 = jnp.concatenate(kept_scores, axis=1)

        def top_per_image(b, s2):
            k2 = min(self.post_nms_top_n, s2.shape[0])
            top_s, top_i = jax.lax.top_k(s2, k2)
            return b[top_i], top_s

        proposals, prop_scores = jax.vmap(top_per_image)(boxes, scores2)
        objectness = jnp.concatenate(logits, axis=1)
        all_deltas = jnp.concatenate(deltas, axis=1)
        all_anchors = jnp.concatenate(anchors_per_level, axis=0)
        return proposals, prop_scores, (objectness, all_deltas, all_anchors)

    def compute_loss(
        self,
        objectness: jnp.ndarray,
        deltas: jnp.ndarray,
        anchors: jnp.ndarray,
        gt_boxes: jnp.ndarray,
        gt_valid: jnp.ndarray,
        key: jax.Array,
    ) -> Dict[str, jnp.ndarray]:
        """BCE objectness + smooth-L1 box loss on sampled anchors (reference
        ``rpn.py:compute_loss`` :289-340)."""
        matcher = Matcher(self.fg_iou_thresh, self.bg_iou_thresh, allow_low_quality_matches=True)
        sampler = BalancedPositiveNegativeSampler(self.batch_size_per_image, self.positive_fraction)

        def per_image(obj, dl, boxes, valid, k):
            iou = box_iou(boxes, anchors)
            matches = matcher(iou, valid)
            labels = jnp.where(matches >= 0, 1, jnp.where(matches == Matcher.BELOW_LOW_THRESHOLD, 0, -1))
            pos_mask, neg_mask = sampler(labels, k)
            sampled = pos_mask | neg_mask
            tgt = (labels == 1).astype(obj.dtype)
            bce = jnp.maximum(obj, 0) - obj * tgt + jnp.log1p(jnp.exp(-jnp.abs(obj)))
            obj_loss = (bce * sampled).sum() / jnp.maximum(sampled.sum(), 1)
            matched_boxes = boxes[jnp.maximum(matches, 0)]
            reg_tgt = self._coder.encode(matched_boxes, anchors)
            reg = smooth_l1(dl - reg_tgt).sum(-1)
            reg_loss = (reg * pos_mask).sum() / jnp.maximum(sampled.sum(), 1)
            return obj_loss, reg_loss

        keys = jax.random.split(key, objectness.shape[0])
        obj_l, reg_l = jax.vmap(per_image)(objectness, deltas, gt_boxes, gt_valid, keys)
        return {"loss_objectness": obj_l.mean(), "loss_rpn_box_reg": reg_l.mean()}

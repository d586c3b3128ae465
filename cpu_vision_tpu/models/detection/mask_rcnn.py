"""Mask R-CNN (reference ``torchvision/models/detection/mask_rcnn.py``):
Faster R-CNN + a mask head (4x conv256 + deconv + per-class mask logits)
pooled at 14x14.

Fixed shapes: masks are predicted for the fixed proposal/detection sets;
training targets are rasterised from gt masks by RoIAlign (the reference's
``project_masks_on_boxes``, ``roi_heads.py:83``).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.poolers import multiscale_roi_align
from ...ops.roi import roi_align
from .._api import register_model
from .faster_rcnn import FasterRCNN
from .roi_heads import _log2i, paste_masks_in_image

__all__ = ["MaskRCNN", "MaskRCNNHeads", "maskrcnn_resnet50_fpn",
           "maskrcnn_resnet50_fpn_v2"]


class MaskRCNNHeads(nn.Module):
    """4x 3x3 conv + 2x deconv + 1x1 per-class logits (reference
    ``MaskRCNNHeads``/``MaskRCNNPredictor``, ``mask_rcnn.py:270-310``).
    ``norm='batch'`` is the v2-recipe head (``maskrcnn_resnet50_fpn_v2``)."""

    num_classes: int
    channels: int = 256
    norm: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(4):
            x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=self.norm is None, dtype=self.dtype,
                        name=f"mask_fcn{i + 1}")(x)
            if self.norm == "batch":
                x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2), (2, 2),
                                     dtype=self.dtype, name="mask_deconv")(x))
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="mask_logits")(x)


class MaskRCNN(FasterRCNN):
    """(reference ``MaskRCNN``, ``mask_rcnn.py:32-269``)."""

    mask_pooled_size: int = 14

    def setup(self):
        super().setup()
        self.mask_head = MaskRCNNHeads(
            self.num_classes, norm="batch" if self.variant == "v2" else None,
            dtype=self.dtype)

    def predict_masks(self, features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                      image_size: Tuple[int, int], train: bool = False) -> jnp.ndarray:
        """Mask logits (N, D, 2*pooled, 2*pooled, C) for given boxes (N, D, 4)."""
        n, d, _ = boxes.shape
        batch_idx = jnp.repeat(jnp.arange(n, dtype=boxes.dtype), d)
        rois = jnp.concatenate([batch_idx[:, None], boxes.reshape(-1, 4)], axis=1)
        scales = [2.0 ** _log2i(f.shape[1], image_size[0]) for f in features]
        pooled = multiscale_roi_align(
            features, rois, (self.mask_pooled_size, self.mask_pooled_size), scales=scales
        )
        logits = self.mask_head(pooled, train=train)
        s = 2 * self.mask_pooled_size
        return logits.reshape(n, d, s, s, self.num_classes)

    def __call__(self, images, train: bool = False, paste_masks: bool = False):
        """Inference: detections dict + per-detection mask probabilities
        for the predicted class.

        ``paste_masks=True`` additionally returns full-image masks
        ``(N, D, H, W)`` via :func:`paste_masks_in_image` — the reference's
        output contract (``transform.postprocess`` pastes every mask,
        ``transform.py:263-270``).  Off by default because D full-resolution
        canvases per image is a large HBM allocation.
        """
        image_size = (images.shape[1], images.shape[2])
        features = self.backbone(images, train=train)
        proposals, _, _ = self.rpn(features, image_size)
        class_logits, box_deltas = self.roi_heads(features[:4], proposals, image_size,
                                                  train=train)
        dets = self.roi_heads.postprocess(class_logits, box_deltas, proposals, image_size)
        mask_logits = self.predict_masks(features[:4], dets["boxes"], image_size)
        labels = jnp.maximum(dets["labels"], 0)  # padded rows index class 0
        sel = jnp.take_along_axis(
            mask_logits, labels[:, :, None, None, None], axis=-1
        )[..., 0]
        dets["masks"] = jax.nn.sigmoid(sel)  # (N, D, 28, 28)
        if paste_masks:
            valid = dets["valid"][..., None, None]
            pasted = jax.vmap(
                lambda m, b: paste_masks_in_image(m, b, image_size)
            )(dets["masks"], dets["boxes"])
            dets["masks_full"] = pasted * valid  # (N, D, H, W)
        return dets

    def mask_loss(
        self,
        features: Sequence[jnp.ndarray],
        rois: jnp.ndarray,
        labels: jnp.ndarray,
        pos: jnp.ndarray,
        gt_masks: jnp.ndarray,
        matched_gt_idx: jnp.ndarray,
        image_size: Tuple[int, int],
    ) -> jnp.ndarray:
        """BCE on the positive-roi masks of the target class (reference
        ``maskrcnn_loss``, ``roi_heads.py:83-130``).

        ``gt_masks`` (N, G, H, W) {0,1}; ``matched_gt_idx`` (N, S) index of
        the matched gt per sampled roi.
        """
        n, s_count, _ = rois.shape
        logits = self.predict_masks(features, rois, image_size)  # (N,S,28,28,C)
        out_size = 2 * self.mask_pooled_size

        def per_image(masks, gt_idx, roi_boxes):
            # rasterise each roi's matched gt mask to 28x28 via roi_align
            m = masks[gt_idx].astype(jnp.float32)[..., None]  # (S,H,W,1)
            ridx = jnp.arange(s_count, dtype=roi_boxes.dtype)
            r = jnp.concatenate([ridx[:, None], roi_boxes], axis=1)
            tgt = roi_align(m, r, out_size, spatial_scale=1.0, sampling_ratio=2)
            return tgt[..., 0]

        targets = jax.vmap(per_image)(gt_masks, matched_gt_idx, rois)  # (N,S,28,28)
        sel = jnp.take_along_axis(
            logits, jnp.maximum(labels, 0)[:, :, None, None, None], axis=-1
        )[..., 0]
        bce = jnp.maximum(sel, 0) - sel * targets + jnp.log1p(jnp.exp(-jnp.abs(sel)))
        per_roi = bce.mean(axis=(2, 3))
        return (per_roi * pos).sum() / jnp.maximum(pos.sum(), 1)


@register_model("maskrcnn_resnet50_fpn")
def maskrcnn_resnet50_fpn(*, num_classes: int = 91, dtype=jnp.float32, **kwargs) -> MaskRCNN:
    return MaskRCNN(num_classes=num_classes, dtype=dtype, **kwargs)


@register_model("maskrcnn_resnet50_fpn_v2")
def maskrcnn_resnet50_fpn_v2(*, num_classes: int = 91, dtype=jnp.float32, **kwargs) -> MaskRCNN:
    """v2 recipe: 2-conv RPN head, conv-fc box head, BN mask head (reference
    ``maskrcnn_resnet50_fpn_v2``, ``mask_rcnn.py:480-550``; 47.4 box mAP)."""
    return MaskRCNN(num_classes=num_classes, variant="v2", dtype=dtype, **kwargs)

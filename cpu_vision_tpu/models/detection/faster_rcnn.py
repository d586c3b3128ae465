"""Faster R-CNN (reference ``torchvision/models/detection/faster_rcnn.py`` +
``generalized_rcnn.py:15``): ResNet-FPN backbone → RPN → RoIHeads.

The deepest pipeline in the reference (SURVEY §3.3); here every stage is
fixed-shape so the whole detector jits as one program.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from .._api import register_model
from ..resnet import Bottleneck, ResNet
from .backbone_utils import BackboneWithFPN
from .roi_heads import RoIHeads
from .rpn import RegionProposalNetwork

__all__ = ["FasterRCNN", "fasterrcnn_resnet50_fpn"]


class FasterRCNN(nn.Module):
    """(reference ``FasterRCNN``, ``faster_rcnn.py:31-287``)."""

    num_classes: int = 91  # incl. background
    rpn_pre_nms_top_n: int = 1000
    rpn_post_nms_top_n: int = 512
    max_detections: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = BackboneWithFPN(
            ResNet(Bottleneck, (3, 4, 6, 3), dtype=self.dtype),
            out_channels=256,
            extra_pool=True,
            returned_layers=("layer1", "layer2", "layer3", "layer4"),
            dtype=self.dtype,
        )
        self.rpn = RegionProposalNetwork(
            pre_nms_top_n=self.rpn_pre_nms_top_n,
            post_nms_top_n=self.rpn_post_nms_top_n,
            dtype=self.dtype,
        )
        self.roi_heads = RoIHeads(
            num_classes=self.num_classes,
            max_detections=self.max_detections,
            dtype=self.dtype,
        )

    def __call__(self, images, train: bool = False):
        """Inference graph: returns the fixed-size detection dict plus the
        RPN proposals (for inspection)."""
        image_size = (images.shape[1], images.shape[2])
        features = self.backbone(images, train=train)
        rpn_feats = features  # P2..P5 + pool (RPN runs on all levels)
        proposals, prop_scores, _ = self.rpn(rpn_feats, image_size)
        # RoI pooling uses P2..P5 only (reference featmap_names 0..3)
        class_logits, box_deltas = self.roi_heads(features[:4], proposals, image_size)
        dets = self.roi_heads.postprocess(class_logits, box_deltas, proposals, image_size)
        return dets

    def forward_train(
        self,
        images,
        gt_boxes: jnp.ndarray,
        gt_labels: jnp.ndarray,
        gt_valid: jnp.ndarray,
        key: jax.Array,
    ) -> Dict[str, jnp.ndarray]:
        """Training graph: returns the 4 losses (reference
        ``GeneralizedRCNN.forward``, ``generalized_rcnn.py:45``)."""
        image_size = (images.shape[1], images.shape[2])
        k_rpn, k_roi = jax.random.split(key)
        features = self.backbone(images, train=True)
        proposals, _, (objectness, deltas, anchors) = self.rpn(features, image_size)
        rpn_losses = self.rpn.compute_loss(objectness, deltas, anchors, gt_boxes, gt_valid, k_rpn)
        rois, labels, reg_tgt, sampled, pos = self.roi_heads.select_training_samples(
            proposals, gt_boxes, gt_labels, gt_valid, k_roi
        )
        class_logits, box_deltas = self.roi_heads(features[:4], rois, image_size)
        det_losses = self.roi_heads.compute_loss(class_logits, box_deltas, labels, reg_tgt, sampled, pos)
        return {**rpn_losses, **det_losses}


@register_model("fasterrcnn_resnet50_fpn")
def fasterrcnn_resnet50_fpn(*, num_classes: int = 91, dtype=jnp.float32, **kwargs) -> FasterRCNN:
    return FasterRCNN(num_classes=num_classes, dtype=dtype, **kwargs)

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

__all__ = [
    "FasterRCNN",
    "fasterrcnn_resnet50_fpn",
    "fasterrcnn_resnet50_fpn_v2",
    "fasterrcnn_mobilenet_v3_large_fpn",
    "fasterrcnn_mobilenet_v3_large_320_fpn",
]


class MobileNetV3DetFeatures(nn.Module):
    """MobileNetV3-Large feature dict for detection: ``layer3`` = C4 stage
    output (block 12, 160 ch), ``layer4`` = final 960-ch conv (C5)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, features_only: bool = True):
        from ..mobilenet import _V3_LARGE, ConvNormActivation, V3Block, hardswish

        y = ConvNormActivation(16, 3, 2, activation=hardswish, eps=1e-5, dtype=self.dtype)(x, train)
        c4 = None
        for i, (k, exp, out_c, se, hs, s) in enumerate(_V3_LARGE):
            y = V3Block(out_c, k, exp, se, hs, s, eps=1e-5, dtype=self.dtype)(y, train)
            if i == 12:  # C4 stage boundary (reference stage_indices[-2])
                c4 = y
        out = ConvNormActivation(6 * y.shape[-1], 1, activation=hardswish,
                                 eps=1e-5, dtype=self.dtype)(y, train)
        return {"layer3": c4, "layer4": out}


class FasterRCNN(nn.Module):
    """(reference ``FasterRCNN``, ``faster_rcnn.py:31-287``).

    ``variant='v2'`` selects the v2-recipe heads (2-conv RPN head + conv-fc
    box head, reference ``fasterrcnn_resnet50_fpn_v2``); ``backbone_name=
    'mobilenet_v3_large'`` the mobile backbone with a 3-level FPN."""

    num_classes: int = 91  # incl. background
    rpn_pre_nms_top_n: int = 1000
    rpn_post_nms_top_n: int = 512
    max_detections: int = 100
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    variant: str = "v1"  # "v1" | "v2"
    backbone_name: str = "resnet50"  # "resnet50" | "mobilenet_v3_large"
    dtype: Any = jnp.float32

    def setup(self):
        if self.backbone_name == "mobilenet_v3_large":
            self.backbone = BackboneWithFPN(
                MobileNetV3DetFeatures(dtype=self.dtype),
                out_channels=256,
                extra_pool=True,
                returned_layers=("layer3", "layer4"),
                dtype=self.dtype,
            )
            # reference anchor config for the mobilenet FPN variants
            # (faster_rcnn.py:_fasterrcnn_mobilenet_v3_large_fpn)
            anchor_sizes = ((32, 64, 128, 256, 512),) * 3
            aspect_ratios = ((0.5, 1.0, 2.0),) * 3
        else:
            self.backbone = BackboneWithFPN(
                ResNet(Bottleneck, (3, 4, 6, 3), dtype=self.dtype),
                out_channels=256,
                extra_pool=True,
                returned_layers=("layer1", "layer2", "layer3", "layer4"),
                # v2 recipe FPN carries BatchNorm (reference
                # _resnet_fpn_extractor(..., norm_layer=nn.BatchNorm2d))
                fpn_norm="batch" if self.variant == "v2" else None,
                dtype=self.dtype,
            )
            anchor_sizes = ((32,), (64,), (128,), (256,), (512,))
            aspect_ratios = ((0.5, 1.0, 2.0),) * 5
        self.rpn = RegionProposalNetwork(
            anchor_sizes=anchor_sizes,
            aspect_ratios=aspect_ratios,
            pre_nms_top_n=self.rpn_pre_nms_top_n,
            post_nms_top_n=self.rpn_post_nms_top_n,
            conv_depth=2 if self.variant == "v2" else 1,
            dtype=self.dtype,
        )
        self.roi_heads = RoIHeads(
            num_classes=self.num_classes,
            max_detections=self.max_detections,
            score_thresh=self.box_score_thresh,
            nms_thresh=self.box_nms_thresh,
            box_head_type="convfc" if self.variant == "v2" else "mlp",
            dtype=self.dtype,
        )

    def __call__(self, images, train: bool = False):
        """Inference graph: returns the fixed-size detection dict plus the
        RPN proposals (for inspection)."""
        image_size = (images.shape[1], images.shape[2])
        features = self.backbone(images, train=train)
        rpn_feats = features  # P2..P5 + pool (RPN runs on all levels)
        proposals, prop_scores, _ = self.rpn(rpn_feats, image_size)
        # RoI pooling uses all-but-pool levels (reference featmap_names 0..3)
        class_logits, box_deltas = self.roi_heads(features[:-1], proposals, image_size,
                                                  train=train)
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
        class_logits, box_deltas = self.roi_heads(features[:-1], rois, image_size,
                                                  train=True)
        det_losses = self.roi_heads.compute_loss(class_logits, box_deltas, labels, reg_tgt, sampled, pos)
        return {**rpn_losses, **det_losses}


@register_model("fasterrcnn_resnet50_fpn")
def fasterrcnn_resnet50_fpn(*, num_classes: int = 91, dtype=jnp.float32, **kwargs) -> FasterRCNN:
    return FasterRCNN(num_classes=num_classes, dtype=dtype, **kwargs)


@register_model("fasterrcnn_resnet50_fpn_v2")
def fasterrcnn_resnet50_fpn_v2(*, num_classes: int = 91, dtype=jnp.float32, **kwargs) -> FasterRCNN:
    """v2 recipe: 2-conv RPN head + conv-fc box head (reference
    ``fasterrcnn_resnet50_fpn_v2``, ``faster_rcnn.py:400-460``; 46.7 box mAP)."""
    return FasterRCNN(num_classes=num_classes, variant="v2", dtype=dtype, **kwargs)


@register_model("fasterrcnn_mobilenet_v3_large_fpn")
def fasterrcnn_mobilenet_v3_large_fpn(*, num_classes: int = 91, dtype=jnp.float32, **kwargs) -> FasterRCNN:
    """(reference ``fasterrcnn_mobilenet_v3_large_fpn``)."""
    return FasterRCNN(num_classes=num_classes, backbone_name="mobilenet_v3_large",
                      dtype=dtype, **kwargs)


@register_model("fasterrcnn_mobilenet_v3_large_320_fpn")
def fasterrcnn_mobilenet_v3_large_320_fpn(*, num_classes: int = 91, dtype=jnp.float32, **kwargs) -> FasterRCNN:
    """Low-resolution variant: fewer proposals, meant for 320px inputs
    (reference ``fasterrcnn_mobilenet_v3_large_320_fpn``: rpn_pre/post_nms
    150, rpn_score_thresh 0.05)."""
    kwargs.setdefault("rpn_pre_nms_top_n", 150)
    kwargs.setdefault("rpn_post_nms_top_n", 150)
    return FasterRCNN(num_classes=num_classes, backbone_name="mobilenet_v3_large",
                      dtype=dtype, **kwargs)

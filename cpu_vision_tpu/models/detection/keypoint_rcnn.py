"""Keypoint R-CNN (reference ``torchvision/models/detection/keypoint_rcnn.py``):
Faster R-CNN + keypoint head (8x conv512 + deconv + x2 interp) predicting
K keypoint heatmaps per detection at 56x56."""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.poolers import multiscale_roi_align
from .._api import register_model
from .faster_rcnn import FasterRCNN
from .roi_heads import _log2i

__all__ = ["KeypointRCNN", "KeypointRCNNHeads", "keypointrcnn_resnet50_fpn"]


class KeypointRCNNHeads(nn.Module):
    """(reference ``KeypointRCNNHeads``/``KeypointRCNNPredictor``,
    ``keypoint_rcnn.py:270-320``)."""

    num_keypoints: int = 17
    channels: int = 512
    layers: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                                dtype=self.dtype, name=f"kps_fcn{i + 1}")(x))
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), (2, 2),
                             dtype=self.dtype, name="kps_score_lowres")(x)
        # extra x2 bilinear upsample (reference interpolates scale_factor=2)
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear")
        return x


class KeypointRCNN(FasterRCNN):
    """(reference ``KeypointRCNN``, ``keypoint_rcnn.py:28-269``)."""

    num_keypoints: int = 17
    keypoint_pooled_size: int = 14

    def setup(self):
        super().setup()
        self.keypoint_head = KeypointRCNNHeads(self.num_keypoints, dtype=self.dtype)

    def predict_keypoints(self, features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                          image_size: Tuple[int, int]) -> jnp.ndarray:
        """Heatmap logits (N, D, 56, 56, K) for boxes (N, D, 4)."""
        n, d, _ = boxes.shape
        batch_idx = jnp.repeat(jnp.arange(n, dtype=boxes.dtype), d)
        rois = jnp.concatenate([batch_idx[:, None], boxes.reshape(-1, 4)], axis=1)
        scales = [2.0 ** _log2i(f.shape[1], image_size[0]) for f in features]
        pooled = multiscale_roi_align(
            features, rois, (self.keypoint_pooled_size, self.keypoint_pooled_size), scales=scales
        )
        heat = self.keypoint_head(pooled)
        s = 4 * self.keypoint_pooled_size
        return heat.reshape(n, d, s, s, self.num_keypoints)

    def __call__(self, images, train: bool = False):
        image_size = (images.shape[1], images.shape[2])
        features = self.backbone(images, train=train)
        proposals, _, _ = self.rpn(features, image_size)
        class_logits, box_deltas = self.roi_heads(features[:4], proposals, image_size)
        dets = self.roi_heads.postprocess(class_logits, box_deltas, proposals, image_size)
        heat = self.predict_keypoints(features[:4], dets["boxes"], image_size)
        n, d, s, _, k = heat.shape
        # heatmap argmax -> keypoint coordinates in box frame, mapped to image
        flat = heat.reshape(n, d, s * s, k)
        idx = jnp.argmax(flat, axis=2)  # (N, D, K)
        ky = (idx // s).astype(jnp.float32) + 0.5
        kx = (idx % s).astype(jnp.float32) + 0.5
        x1, y1, x2, y2 = jnp.moveaxis(dets["boxes"], -1, 0)
        w = jnp.maximum(x2 - x1, 1.0)[..., None]
        h = jnp.maximum(y2 - y1, 1.0)[..., None]
        px = x1[..., None] + kx / s * w
        py = y1[..., None] + ky / s * h
        scores = jnp.take_along_axis(flat, idx[:, :, None, :], axis=2)[:, :, 0, :]
        dets["keypoints"] = jnp.stack([px, py], axis=-1)  # (N, D, K, 2)
        dets["keypoints_scores"] = scores
        return dets


    def keypoint_loss(
        self,
        features: Sequence[jnp.ndarray],
        rois: jnp.ndarray,
        gt_keypoints: jnp.ndarray,
        kp_valid: jnp.ndarray,
        pos: jnp.ndarray,
        image_size: Tuple[int, int],
    ) -> jnp.ndarray:
        """Cross-entropy over heatmap positions (reference ``keypointrcnn_loss``
        / ``keypoints_to_heatmap``, ``roi_heads.py:137-200``).

        ``gt_keypoints`` (N, S, K, 2) xy in image coords; ``kp_valid``
        (N, S, K) visibility; ``pos`` (N, S) positive-roi mask.
        """
        logits = self.predict_keypoints(features, rois, image_size)  # (N,S,HM,HM,K)
        n, s_count, hm, _, k = logits.shape
        x1 = rois[..., 0:1]
        y1 = rois[..., 1:2]
        w = jnp.maximum(rois[..., 2:3] - x1, 1.0)
        h = jnp.maximum(rois[..., 3:4] - y1, 1.0)
        # keypoint -> heatmap cell (reference keypoints_to_heatmap)
        kx = jnp.floor((gt_keypoints[..., 0] - x1) / w * hm)
        ky = jnp.floor((gt_keypoints[..., 1] - y1) / h * hm)
        inside = (kx >= 0) & (kx < hm) & (ky >= 0) & (ky < hm)
        valid = kp_valid & inside & pos[..., None]
        tgt = (jnp.clip(ky, 0, hm - 1) * hm + jnp.clip(kx, 0, hm - 1)).astype(jnp.int32)
        flat = logits.reshape(n, s_count, hm * hm, k).transpose(0, 1, 3, 2)  # (N,S,K,HM²)
        logp = jax.nn.log_softmax(flat, axis=-1)
        ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return (ce * valid).sum() / jnp.maximum(valid.sum(), 1)


@register_model("keypointrcnn_resnet50_fpn")
def keypointrcnn_resnet50_fpn(*, num_classes: int = 2, num_keypoints: int = 17,
                              dtype=jnp.float32, **kwargs) -> KeypointRCNN:
    return KeypointRCNN(num_classes=num_classes, num_keypoints=num_keypoints,
                        dtype=dtype, **kwargs)

"""Detection losses (ports of the reference's ``torchvision/ops/*loss*.py``).

All losses take a ``reduction`` in {"none", "mean", "sum"} like the
reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "sigmoid_focal_loss",
    "generalized_box_iou_loss",
    "distance_box_iou_loss",
    "complete_box_iou_loss",
]


def _reduce(loss: jax.Array, reduction: str) -> jax.Array:
    if reduction == "none":
        return loss
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    raise ValueError(f"invalid reduction {reduction!r}")


def sigmoid_focal_loss(
    inputs: jax.Array,
    targets: jax.Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
    reduction: str = "none",
) -> jax.Array:
    """Focal loss for dense detection (reference ``ops/focal_loss.py:7-59``)."""
    p = jax.nn.sigmoid(inputs)
    # stable BCE-with-logits
    ce = jnp.maximum(inputs, 0) - inputs * targets + jnp.log1p(jnp.exp(-jnp.abs(inputs)))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return _reduce(loss, reduction)


def generalized_box_iou_loss(
    boxes1: jax.Array, boxes2: jax.Array, reduction: str = "none", eps: float = 1e-7
) -> jax.Array:
    """1 - GIoU, elementwise over aligned box pairs (reference
    ``ops/giou_loss.py``)."""
    x1, y1, x2, y2 = boxes1[..., 0], boxes1[..., 1], boxes1[..., 2], boxes1[..., 3]
    x1g, y1g, x2g, y2g = boxes2[..., 0], boxes2[..., 1], boxes2[..., 2], boxes2[..., 3]
    xkis1 = jnp.maximum(x1, x1g)
    ykis1 = jnp.maximum(y1, y1g)
    xkis2 = jnp.minimum(x2, x2g)
    ykis2 = jnp.minimum(y2, y2g)
    intsctk = jnp.clip(xkis2 - xkis1, 0) * jnp.clip(ykis2 - ykis1, 0)
    unionk = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - intsctk
    iouk = intsctk / (unionk + eps)
    xc1 = jnp.minimum(x1, x1g)
    yc1 = jnp.minimum(y1, y1g)
    xc2 = jnp.maximum(x2, x2g)
    yc2 = jnp.maximum(y2, y2g)
    area_c = (xc2 - xc1) * (yc2 - yc1)
    miouk = iouk - (area_c - unionk) / (area_c + eps)
    return _reduce(1.0 - miouk, reduction)


def distance_box_iou_loss(
    boxes1: jax.Array, boxes2: jax.Array, reduction: str = "none", eps: float = 1e-7
) -> jax.Array:
    """1 - DIoU elementwise (reference ``ops/diou_loss.py``)."""
    x1, y1, x2, y2 = boxes1[..., 0], boxes1[..., 1], boxes1[..., 2], boxes1[..., 3]
    x1g, y1g, x2g, y2g = boxes2[..., 0], boxes2[..., 1], boxes2[..., 2], boxes2[..., 3]
    xkis1 = jnp.maximum(x1, x1g)
    ykis1 = jnp.maximum(y1, y1g)
    xkis2 = jnp.minimum(x2, x2g)
    ykis2 = jnp.minimum(y2, y2g)
    intsct = jnp.clip(xkis2 - xkis1, 0) * jnp.clip(ykis2 - ykis1, 0)
    union = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - intsct
    iou = intsct / (union + eps)
    xc1 = jnp.minimum(x1, x1g)
    yc1 = jnp.minimum(y1, y1g)
    xc2 = jnp.maximum(x2, x2g)
    yc2 = jnp.maximum(y2, y2g)
    diag_sq = (xc2 - xc1) ** 2 + (yc2 - yc1) ** 2 + eps
    cx = (x1 + x2) * 0.5
    cy = (y1 + y2) * 0.5
    cxg = (x1g + x2g) * 0.5
    cyg = (y1g + y2g) * 0.5
    cdist = (cx - cxg) ** 2 + (cy - cyg) ** 2
    return _reduce(1.0 - iou + cdist / diag_sq, reduction)


def complete_box_iou_loss(
    boxes1: jax.Array, boxes2: jax.Array, reduction: str = "none", eps: float = 1e-7
) -> jax.Array:
    """1 - CIoU elementwise (reference ``ops/ciou_loss.py``)."""
    diou = distance_box_iou_loss(boxes1, boxes2, reduction="none", eps=eps)
    w_pred = boxes1[..., 2] - boxes1[..., 0]
    h_pred = boxes1[..., 3] - boxes1[..., 1]
    w_gt = boxes2[..., 2] - boxes2[..., 0]
    h_gt = boxes2[..., 3] - boxes2[..., 1]
    v = (4.0 / jnp.pi**2) * (jnp.arctan(w_gt / h_gt) - jnp.arctan(w_pred / h_pred)) ** 2
    # recompute iou for alpha
    x1, y1, x2, y2 = boxes1[..., 0], boxes1[..., 1], boxes1[..., 2], boxes1[..., 3]
    x1g, y1g, x2g, y2g = boxes2[..., 0], boxes2[..., 1], boxes2[..., 2], boxes2[..., 3]
    intsct = jnp.clip(jnp.minimum(x2, x2g) - jnp.maximum(x1, x1g), 0) * jnp.clip(
        jnp.minimum(y2, y2g) - jnp.maximum(y1, y1g), 0
    )
    union = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - intsct
    iou = intsct / (union + eps)
    alpha = jax.lax.stop_gradient(v / (1 - iou + v + eps))
    return _reduce(diou + alpha * v, reduction)

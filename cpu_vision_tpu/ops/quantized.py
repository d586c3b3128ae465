"""Quantised (int8/uint8) op variants.

Counterpart of the reference's QuantizedCPU kernels
(``csrc/ops/quantized/cpu/{qnms,qroi_align}_kernel.cpp``): ops on quantised
tensors carried as (values, scale, zero_point).  TPU note: int8 is a
first-class MXU dtype; these reference implementations dequantise on the fly
exactly like the C++ (arithmetic in f32, requantise at the end).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import nms as _nms
from .roi import roi_align as _roi_align

__all__ = ["quantize", "dequantize", "qnms", "qroi_align"]


def quantize(x: jax.Array, scale: float, zero_point: int, dtype=jnp.uint8) -> jax.Array:
    info = jnp.iinfo(dtype)
    q = jnp.round(x / scale) + zero_point
    return jnp.clip(q, info.min, info.max).astype(dtype)


def dequantize(q: jax.Array, scale: float, zero_point: int) -> jax.Array:
    return (q.astype(jnp.float32) - zero_point) * scale


def qnms(
    qboxes: jax.Array,
    qscores: jax.Array,
    iou_threshold: float,
    boxes_scale: float = 1.0,
    boxes_zero_point: int = 0,
) -> jax.Array:
    """NMS on quantised boxes (reference ``qnms_kernel.cpp``: IoU computed on
    dequantised coordinates; scores only order, so their scale is
    irrelevant).  Returns the keep mask."""
    boxes = dequantize(qboxes, boxes_scale, boxes_zero_point)
    scores = qscores.astype(jnp.float32)
    return _nms(boxes, scores, iou_threshold)


def qroi_align(
    qfeatures: jax.Array,
    rois: jax.Array,
    output_size,
    scale: float,
    zero_point: int,
    spatial_scale: float = 1.0,
    sampling_ratio: int = -1,
    aligned: bool = False,
) -> Tuple[jax.Array, float, int]:
    """RoIAlign on a quantised feature map (reference
    ``qroi_align_kernel.cpp``): dequantise-on-the-fly, pool in f32,
    requantise with the input's (scale, zero_point)."""
    feats = dequantize(qfeatures, scale, zero_point)
    out = _roi_align(feats, rois, output_size, spatial_scale, sampling_ratio, aligned)
    return quantize(out, scale, zero_point, qfeatures.dtype), scale, zero_point

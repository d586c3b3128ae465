"""End-to-end detection inference glue (reference
``torchvision/models/detection/generalized_rcnn.py:15`` +
``transform.py:257``): variable-size image list -> normalized fixed canvas
-> detector -> detections mapped back to original coordinates.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

from .transform import GeneralizedRCNNTransform

__all__ = ["detect"]


def detect(
    model,
    variables,
    images: Sequence[jax.Array],
    transform: GeneralizedRCNNTransform = None,
) -> List[Dict[str, Any]]:
    """Run a detector over a list of HWC float images of arbitrary sizes.

    Handles RetinaNet/FCOS/SSD-style models (returning raw head outputs with
    a ``postprocess`` method) and R-CNN-style models (returning the
    detections dict directly).  Returns one dict per image with boxes in the
    *original* image coordinates plus scores/labels/valid.
    """
    transform = transform or GeneralizedRCNNTransform(min_size=320, max_size=640)
    batch, _, scales = transform(list(images))
    image_size = (batch.shape[1], batch.shape[2])

    out = model.apply(variables, batch, train=False)
    if isinstance(out, dict):
        dets = out
    else:
        dets = model.postprocess(*out, image_size)

    results = []
    for i in range(batch.shape[0]):
        boxes = transform.postprocess_boxes(dets["boxes"][i], scales, i)
        entry = {k: v[i] for k, v in dets.items() if k != "boxes"}
        entry["boxes"] = boxes
        results.append(entry)
    return results

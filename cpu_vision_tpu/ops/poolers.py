"""Multi-scale RoI pooling over FPN levels.

Reference: ``torchvision/ops/poolers.py`` — ``LevelMapper`` FPN-level
assignment (:47), ``_multiscale_roi_align`` (:147), ``MultiScaleRoIAlign``
(:230).

TPU-native: instead of scattering rois to per-level lists (dynamic shapes),
every roi is pooled **at every level** and the per-roi level assignment
selects the right result — O(L) more pooling FLOPs on tiny 7x7 outputs in
exchange for fully static shapes (L is 4).
"""

from __future__ import annotations

import math
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .roi import roi_align

__all__ = ["LevelMapper", "multiscale_roi_align", "MultiScaleRoIAlign"]


class LevelMapper:
    """Map each roi to an FPN level by its scale (reference ``LevelMapper``,
    ``ops/poolers.py:47-85``: ``floor(lvl0 + log2(sqrt(area)/224))``)."""

    def __init__(self, k_min: int, k_max: int, canonical_scale: int = 224,
                 canonical_level: int = 4, eps: float = 1e-6):
        self.k_min = k_min
        self.k_max = k_max
        self.s0 = canonical_scale
        self.lvl0 = canonical_level
        self.eps = eps

    def __call__(self, boxes: jax.Array) -> jax.Array:
        """boxes (K, 4) xyxy -> int32 level index in [0, k_max - k_min]."""
        scales = jnp.sqrt(
            (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        )
        target = jnp.floor(self.lvl0 + jnp.log2(scales / self.s0 + self.eps))
        target = jnp.clip(target, self.k_min, self.k_max)
        return (target - self.k_min).astype(jnp.int32)


def multiscale_roi_align(
    features: Sequence[jax.Array],
    rois: jax.Array,
    output_size: Tuple[int, int],
    scales: Sequence[float],
    sampling_ratio: int = 2,
    canonical_scale: int = 224,
    canonical_level: int = 4,
) -> jax.Array:
    """Pool (K, 5) rois from the right FPN level -> (K, PH, PW, C).

    ``features``: list of (N, H_l, W_l, C) maps; ``scales``: feature stride
    reciprocals per level (e.g. 1/4, 1/8, 1/16, 1/32).
    """
    k_min = -int(math.log2(scales[0]))
    k_max = -int(math.log2(scales[-1]))
    mapper = LevelMapper(k_min, k_max, canonical_scale, canonical_level)
    levels = mapper(rois[:, 1:])  # (K,)
    if sampling_ratio > 0 and os.environ.get("CVT_ROI_ALLLEVEL", "0") != "1":
        # single gather at each roi's own level (4x less gather traffic
        # than pool-everywhere-and-select; traced at ~17% of the
        # FasterRCNN-640 step) — exact same per-level semantics
        from .roi import roi_align_pyramid

        return roi_align_pyramid(features, rois, levels, output_size,
                                 scales, sampling_ratio=sampling_ratio)
    pooled = [
        roi_align(f, rois, output_size, spatial_scale=s, sampling_ratio=sampling_ratio)
        for f, s in zip(features, scales)
    ]  # L x (K, PH, PW, C)
    stacked = jnp.stack(pooled, axis=0)  # (L, K, PH, PW, C)
    onehot = jax.nn.one_hot(levels, len(pooled), axis=0, dtype=stacked.dtype)  # (L, K)
    return jnp.sum(stacked * onehot[:, :, None, None, None], axis=0)


class MultiScaleRoIAlign:
    """Stateful wrapper mirroring the reference module
    (``MultiScaleRoIAlign``, ``ops/poolers.py:230``)."""

    def __init__(self, output_size, sampling_ratio: int = 2,
                 canonical_scale: int = 224, canonical_level: int = 4):
        self.output_size = (output_size, output_size) if isinstance(output_size, int) else tuple(output_size)
        self.sampling_ratio = sampling_ratio
        self.canonical_scale = canonical_scale
        self.canonical_level = canonical_level

    def __call__(self, features: Sequence[jax.Array], rois: jax.Array,
                 image_size: Tuple[int, int]) -> jax.Array:
        scales = [f.shape[1] / image_size[0] for f in features]
        # snap to powers of two like the reference's infer_scale
        scales = [2.0 ** round(math.log2(s)) for s in scales]
        return multiscale_roi_align(
            features, rois, self.output_size, scales, self.sampling_ratio,
            self.canonical_scale, self.canonical_level,
        )

"""Fused Pallas TPU kernels for the hot stencil pipelines.

These keep multi-stage pipelines (blur → gradient → magnitude → NMS →
threshold) resident in VMEM for one pass over HBM, replacing the reference's
separate per-stage passes (each of which re-reads HBM).  The XLA
implementations in ``cpu_vision_tpu.ops`` are the correctness oracles.
"""

from .conv_block import conv3x3_relu_pool, fused_conv3x3_relu_pool  # noqa: F401
from .stencil import (  # noqa: F401
    canny_stage1,
    fused_blur_sobel,
    fused_gaussian_blur,
    fused_canny,
    harris_response_fused,
)

"""Image and vision ops (XLA-reference implementations + Pallas fused kernels)."""

from .filters import (  # noqa: F401
    adjust_sharpness,
    box_blur,
    filter2d,
    gaussian_blur,
    get_gaussian_kernel1d,
    get_gaussian_kernel2d,
    laplacian,
    pad2d,
    scharr_kernels,
    separable_filter2d,
    sobel,
    sobel_gradients,
    sobel_kernels,
    spatial_gradient,
    unsharp_mask,
)

"""Reference-semantics oracles computed with torch (CPU).

The reference library's tensor kernels bottom out in ``torch.nn.functional``
calls (pad / conv2d / interpolate / grid_sample).  These oracles re-create the
reference's exact call sequences so our JAX kernels can be checked
bit-for-bit without importing the reference package itself.

Each oracle cites the reference code it mirrors (file:line in
/root/reference).  Oracles take/return NumPy arrays in the *reference's*
layout (CHW uint8/float32); tests convert to NHWC for our kernels.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np
import torch
import torch.nn.functional as F


def _to_torch_chw(img_hwc: np.ndarray) -> torch.Tensor:
    """HWC (or HW) numpy -> CHW torch."""
    if img_hwc.ndim == 2:
        img_hwc = img_hwc[:, :, None]
    return torch.from_numpy(np.ascontiguousarray(img_hwc.transpose(2, 0, 1)))


def _to_numpy_hwc(t: torch.Tensor) -> np.ndarray:
    return t.numpy().transpose(1, 2, 0)


def _cast_squeeze_in(img: torch.Tensor, req_dtypes):
    # torchvision transforms/_functional_tensor.py:516-529
    need_squeeze = False
    if img.ndim < 4:
        img = img.unsqueeze(0)
        need_squeeze = True
    out_dtype = img.dtype
    need_cast = False
    if out_dtype not in req_dtypes:
        need_cast = True
        img = img.to(req_dtypes[0])
    return img, need_cast, need_squeeze, out_dtype


def _cast_squeeze_out(img: torch.Tensor, need_cast, need_squeeze, out_dtype):
    # torchvision transforms/_functional_tensor.py:532-542
    if need_squeeze:
        img = img.squeeze(0)
    if need_cast:
        if out_dtype in (torch.uint8, torch.int8, torch.int16, torch.int32, torch.int64):
            img = torch.round(img)
        img = img.to(out_dtype)
    return img


def gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    # torchvision transforms/_functional_tensor.py:727-734
    half = (kernel_size - 1) * 0.5
    x = torch.linspace(-half, half, steps=kernel_size)
    pdf = torch.exp(-0.5 * (x / sigma).pow(2))
    return (pdf / pdf.sum()).numpy()


def gaussian_blur(img_hwc: np.ndarray, kernel_size: Sequence[int], sigma: Sequence[float]) -> np.ndarray:
    """torchvision transforms/_functional_tensor.py:746-764 (gaussian_blur)."""
    img = _to_torch_chw(img_hwc)
    dtype = img.dtype if torch.is_floating_point(img) else torch.float32
    kx = torch.from_numpy(gaussian_kernel1d(kernel_size[0], sigma[0])).to(dtype)
    ky = torch.from_numpy(gaussian_kernel1d(kernel_size[1], sigma[1])).to(dtype)
    kernel = torch.mm(ky[:, None], kx[None, :])
    kernel = kernel.expand(img.shape[-3], 1, kernel.shape[0], kernel.shape[1])
    img, need_cast, need_squeeze, out_dtype = _cast_squeeze_in(img, [kernel.dtype])
    padding = [kernel_size[0] // 2, kernel_size[0] // 2, kernel_size[1] // 2, kernel_size[1] // 2]
    img = F.pad(img, padding, mode="reflect")
    img = F.conv2d(img, kernel, groups=img.shape[-3])
    img = _cast_squeeze_out(img, need_cast, need_squeeze, out_dtype)
    return _to_numpy_hwc(img)


def depthwise_stencil(img_hwc: np.ndarray, kernel2d: np.ndarray, pad_mode: str = "reflect") -> np.ndarray:
    """Reference depthwise-stencil idiom: pad + conv2d(groups=C)
    (the pattern of transforms/_functional_tensor.py:758-761)."""
    img = _to_torch_chw(img_hwc)
    k = torch.from_numpy(kernel2d.astype(np.float32))
    kh, kw = k.shape
    kernel = k.expand(img.shape[-3], 1, kh, kw)
    img, need_cast, need_squeeze, out_dtype = _cast_squeeze_in(img, [kernel.dtype])
    img = F.pad(img, [(kw - 1) // 2, kw - 1 - (kw - 1) // 2, (kh - 1) // 2, kh - 1 - (kh - 1) // 2], mode=pad_mode)
    img = F.conv2d(img, kernel, groups=img.shape[-3])
    img = _cast_squeeze_out(img, need_cast, need_squeeze, out_dtype)
    return _to_numpy_hwc(img)


def adjust_sharpness(img_hwc: np.ndarray, factor: float) -> np.ndarray:
    """torchvision transforms/_functional_tensor.py:809-838."""
    img = _to_torch_chw(img_hwc)
    if img.shape[-1] <= 2 or img.shape[-2] <= 2:
        return _to_numpy_hwc(img)
    dtype = img.dtype if torch.is_floating_point(img) else torch.float32
    kernel = torch.ones((3, 3), dtype=dtype)
    kernel[1, 1] = 5.0
    kernel /= kernel.sum()
    kernel = kernel.expand(img.shape[-3], 1, 3, 3)
    result_tmp, need_cast, need_squeeze, out_dtype = _cast_squeeze_in(img, [kernel.dtype])
    result_tmp = F.conv2d(result_tmp, kernel, groups=result_tmp.shape[-3])
    result_tmp = _cast_squeeze_out(result_tmp, need_cast, need_squeeze, out_dtype)
    result = img.clone()
    result[..., 1:-1, 1:-1] = result_tmp
    # _blend (transforms/_functional_tensor.py: _blend)
    bound = 255.0 if img.dtype == torch.uint8 else 1.0
    fdtype = img.dtype if torch.is_floating_point(img) else torch.float32
    out = (factor * img.to(fdtype) + (1.0 - factor) * result.to(fdtype)).clamp(0, bound)
    return _to_numpy_hwc(out.to(img.dtype))


def resize(
    img_hwc: np.ndarray,
    size: Sequence[int],
    interpolation: str = "bilinear",
    antialias: bool = True,
) -> np.ndarray:
    """torchvision transforms/_functional_tensor.py:441-474 (resize)."""
    img = _to_torch_chw(img_hwc)
    align = False if interpolation in ("bilinear", "bicubic") else None
    aa = antialias and interpolation in ("bilinear", "bicubic")
    img, need_cast, need_squeeze, out_dtype = _cast_squeeze_in(img, [torch.float32, torch.float64])
    out = F.interpolate(img, size=list(size), mode=interpolation, align_corners=align, antialias=aa)
    if interpolation == "bicubic" and out_dtype == torch.uint8:
        out = out.clamp(min=0, max=255)
    out = _cast_squeeze_out(out, need_cast, need_squeeze, out_dtype)
    return _to_numpy_hwc(out)

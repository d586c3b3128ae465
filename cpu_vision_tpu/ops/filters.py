"""2-D image filtering: general stencils, separable/Gaussian blur, Sobel.

XLA-reference implementations (``lax.conv_general_dilated`` on NHWC, which
XLA tiles onto the MXU).  The fused Pallas versions in
``cpu_vision_tpu.ops.pallas`` are validated against these.

Semantics match the reference library:

* Gaussian kernel construction — torchvision
  ``transforms/_functional_tensor.py:727-743`` (``_get_gaussian_kernel1d/2d``).
* Blur = reflect-pad + depthwise cross-correlation —
  ``_functional_tensor.py:746-764`` (``gaussian_blur``).
* Sharpness 3x3 stencil — ``_functional_tensor.py:809-838``.
* Integer images are cast to float32, convolved, rounded and cast back —
  ``_functional_tensor.py:516-542``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from .._dtype import float_kernel
from .._layout import ensure_nhwc

__all__ = [
    "get_gaussian_kernel1d",
    "get_gaussian_kernel2d",
    "pad2d",
    "filter2d",
    "separable_filter2d",
    "gaussian_blur",
    "box_blur",
    "sobel_kernels",
    "scharr_kernels",
    "sobel_gradients",
    "sobel",
    "spatial_gradient",
    "laplacian",
    "adjust_sharpness",
    "unsharp_mask",
]

_PAD_MODES = {
    "reflect": "reflect",    # torch "reflect": edge pixel not repeated
    "replicate": "edge",     # torch "replicate"
    "edge": "edge",
    "constant": "constant",
    "circular": "wrap",
    "wrap": "wrap",
    "symmetric": "symmetric",
}


def _as_pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        if len(v) == 1:
            return (v[0], v[0])
        if len(v) != 2:
            raise ValueError(f"expected 1 or 2 values, got {v}")
        return (v[0], v[1])
    return (v, v)


def get_gaussian_kernel1d(kernel_size: int, sigma: float, dtype=jnp.float32) -> jax.Array:
    """Normalised 1-D Gaussian taps at integer offsets (reference
    ``_get_gaussian_kernel1d``, ``_functional_tensor.py:727-734``)."""
    half = (kernel_size - 1) * 0.5
    x = jnp.linspace(-half, half, kernel_size, dtype=dtype)
    pdf = jnp.exp(-0.5 * jnp.square(x / sigma))
    return pdf / jnp.sum(pdf)


def get_gaussian_kernel2d(
    kernel_size: Union[int, Sequence[int]],
    sigma: Union[float, Sequence[float]],
    dtype=jnp.float32,
) -> jax.Array:
    """2-D Gaussian as the outer product ``ky ⊗ kx``; shape ``(ky, kx)``
    (reference ``_get_gaussian_kernel2d``, ``_functional_tensor.py:737-743``;
    ``kernel_size``/``sigma`` are ``(x, y)`` pairs like the reference)."""
    kx, ky = _as_pair(kernel_size)
    sx, sy = _as_pair(sigma)
    k1x = get_gaussian_kernel1d(kx, sx, dtype)
    k1y = get_gaussian_kernel1d(ky, sy, dtype)
    return jnp.outer(k1y, k1x)


def pad2d(
    image: jax.Array,
    padding: Union[int, Sequence[int]],
    mode: str = "reflect",
    value: float = 0.0,
) -> jax.Array:
    """Pad the spatial dims of an NHWC/HWC/HW image.

    ``padding`` is ``(left, right, top, bottom)`` — the reference's
    ``torch.nn.functional.pad`` 2-D order — or a single int for all sides.
    """
    if isinstance(padding, int):
        l = r = t = b = padding
    else:
        l, r, t, b = padding
    nhwc, restore = ensure_nhwc(image)
    cfg = [(0, 0), (t, b), (l, r), (0, 0)]
    jmode = _PAD_MODES[mode]
    if jmode == "constant":
        out = jnp.pad(nhwc, cfg, mode="constant", constant_values=value)
    else:
        out = jnp.pad(nhwc, cfg, mode=jmode)
    return restore(out)


# Stencils with at most this many taps are lowered as shifted-slice
# accumulation instead of lax.conv (see _depthwise_conv_valid).
_MAX_UNROLLED_TAPS = 64


def _depthwise_conv_valid(nhwc: jax.Array, kernel2d: jax.Array) -> jax.Array:
    """VALID depthwise cross-correlation of every channel with one 2-D kernel.

    TPU-native lowering: small stencils are computed as a sum of shifted
    slices (``out = Σ k[i,j] * padded[:, i:i+H, j:j+W, :]``) — pure
    elementwise FMAs that XLA fuses into one bandwidth-bound pass.  Using
    ``lax.conv`` here is a trap on TPU: grouped/1-channel NHWC convs get the
    channel dim padded to the 128-wide lane unit, blowing HBM up 128x
    (observed: a 66 MB batch → 15.9 GB of conv scratch).

    Large kernels fall back to ``lax.conv`` at ``Precision.HIGHEST`` (full
    f32 accumulation is required for ≤1-LSB parity with the reference).
    """
    kh, kw = kernel2d.shape
    if kh * kw <= _MAX_UNROLLED_TAPS:
        n, ph, pw, c = nhwc.shape
        h, w = ph - kh + 1, pw - kw + 1
        k = kernel2d.astype(nhwc.dtype)
        out = None
        for i in range(kh):
            for j in range(kw):
                term = lax.slice(nhwc, (0, i, j, 0), (n, i + h, j + w, c)) * k[i, j]
                out = term if out is None else out + term
        return out
    c = nhwc.shape[-1]
    k = kernel2d.astype(nhwc.dtype)[:, :, None, None] * jnp.ones((1, 1, 1, c), nhwc.dtype)
    return lax.conv_general_dilated(
        nhwc,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )


@float_kernel
def filter2d(
    image: jax.Array,
    kernel: jax.Array,
    mode: str = "reflect",
    value: float = 0.0,
) -> jax.Array:
    """Same-size depthwise 2-D cross-correlation with one ``(kh, kw)`` kernel.

    Equivalent to the reference's pad + ``conv2d(groups=C)`` idiom
    (``_functional_tensor.py:758-761``), generalised to any kernel.
    """
    kernel = jnp.asarray(kernel)
    if kernel.ndim != 2:
        raise ValueError(f"kernel must be 2-D, got shape {kernel.shape}")
    kh, kw = kernel.shape
    nhwc, restore = ensure_nhwc(image)
    t, b = (kh - 1) // 2, kh - 1 - (kh - 1) // 2
    l, r = (kw - 1) // 2, kw - 1 - (kw - 1) // 2
    padded = pad2d(nhwc, (l, r, t, b), mode=mode, value=value)
    return restore(_depthwise_conv_valid(padded, kernel))


@float_kernel
def separable_filter2d(
    image: jax.Array,
    kernel_x: jax.Array,
    kernel_y: jax.Array,
    mode: str = "reflect",
    value: float = 0.0,
) -> jax.Array:
    """Same-size separable filter: 1-D pass along W with ``kernel_x`` then
    along H with ``kernel_y``.  Two cheap convs instead of one ``kh*kw`` one."""
    kernel_x = jnp.asarray(kernel_x).reshape(-1)
    kernel_y = jnp.asarray(kernel_y).reshape(-1)
    kw, kh = kernel_x.shape[0], kernel_y.shape[0]
    nhwc, restore = ensure_nhwc(image)
    t, b = (kh - 1) // 2, kh - 1 - (kh - 1) // 2
    l, r = (kw - 1) // 2, kw - 1 - (kw - 1) // 2
    padded = pad2d(nhwc, (l, r, t, b), mode=mode, value=value)
    out = _depthwise_conv_valid(padded, kernel_x[None, :])
    out = _depthwise_conv_valid(out, kernel_y[:, None])
    return restore(out)


def gaussian_blur(
    image: jax.Array,
    kernel_size: Union[int, Sequence[int]],
    sigma: Optional[Union[float, Sequence[float]]] = None,
    mode: str = "reflect",
    separable: bool = True,
) -> jax.Array:
    """Gaussian blur with reference semantics (``gaussian_blur``,
    ``_functional_tensor.py:746-764``): ``kernel_size``/``sigma`` are
    ``(x, y)``, reflect padding, depthwise conv, uint8 round-trip.

    ``sigma=None`` uses the reference transform default
    ``0.3 * ((ksize - 1) * 0.5 - 1) + 0.8`` (``transforms/transforms.py`` GaussianBlur).
    """
    kx, ky = _as_pair(kernel_size)
    if sigma is None:
        sx = 0.3 * ((kx - 1) * 0.5 - 1) + 0.8
        sy = 0.3 * ((ky - 1) * 0.5 - 1) + 0.8
    else:
        sx, sy = _as_pair(sigma)
    from .._dtype import is_integer_dtype

    # Integer images take the exact 2-D kernel path: the separable two-pass
    # version double-rounds and can drift 2 LSB from the reference's single
    # 2-D conv + round; the fused Pallas kernel restores the speed.
    if separable and not is_integer_dtype(jnp.asarray(image).dtype):
        k1x = get_gaussian_kernel1d(kx, sx)
        k1y = get_gaussian_kernel1d(ky, sy)
        return separable_filter2d(image, k1x, k1y, mode=mode)
    kernel = get_gaussian_kernel2d((kx, ky), (sx, sy))
    return filter2d(image, kernel, mode=mode)


def box_blur(image: jax.Array, kernel_size: Union[int, Sequence[int]], mode: str = "reflect") -> jax.Array:
    """Mean filter (separable)."""
    kx, ky = _as_pair(kernel_size)
    k1x = jnp.full((kx,), 1.0 / kx, jnp.float32)
    k1y = jnp.full((ky,), 1.0 / ky, jnp.float32)
    return separable_filter2d(image, k1x, k1y, mode=mode)


def sobel_kernels(dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """Classic 3x3 Sobel cross-correlation kernels ``(gx, gy)``.

    ``gx`` responds to left→right intensity increase, ``gy`` to top→bottom.
    """
    gx = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], dtype)
    gy = jnp.array([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]], dtype)
    return gx, gy


def scharr_kernels(dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    gx = jnp.array([[-3.0, 0.0, 3.0], [-10.0, 0.0, 10.0], [-3.0, 0.0, 3.0]], dtype)
    gy = jnp.array([[-3.0, -10.0, -3.0], [0.0, 0.0, 0.0], [3.0, 10.0, 3.0]], dtype)
    return gx, gy


def sobel_gradients(image: jax.Array, mode: str = "reflect") -> Tuple[jax.Array, jax.Array]:
    """Per-channel Sobel gradients ``(gx, gy)``, same spatial size.

    Gradient-domain output: always float (no uint8 round-trip — gradients are
    signed and can exceed the input dtype's range).
    """
    from .._dtype import cast_to_float

    fimg, _ = cast_to_float(jnp.asarray(image))
    gx_k, gy_k = sobel_kernels(fimg.dtype)
    nhwc, restore = ensure_nhwc(fimg)
    padded = pad2d(nhwc, 1, mode=mode)
    gx = _depthwise_conv_valid(padded, gx_k)
    gy = _depthwise_conv_valid(padded, gy_k)
    return restore(gx), restore(gy)


def sobel(image: jax.Array, mode: str = "reflect", eps: float = 0.0) -> jax.Array:
    """Sobel gradient magnitude ``sqrt(gx^2 + gy^2)`` (float output)."""
    gx, gy = sobel_gradients(image, mode=mode)
    return jnp.sqrt(gx * gx + gy * gy + eps)


def spatial_gradient(image: jax.Array, method: str = "sobel", mode: str = "reflect"):
    """``(gx, gy)`` via Sobel, Scharr, or central differences (float output)."""
    from .._dtype import cast_to_float

    fimg, _ = cast_to_float(jnp.asarray(image))
    if method == "sobel":
        return sobel_gradients(fimg, mode=mode)
    if method == "scharr":
        gx_k, gy_k = scharr_kernels()
    elif method == "diff":
        gx_k = jnp.array([[-0.5, 0.0, 0.5]], jnp.float32)
        gy_k = gx_k.T
    else:
        raise ValueError(f"unknown gradient method {method!r}")
    return filter2d(fimg, gx_k, mode=mode), filter2d(fimg, gy_k, mode=mode)


def laplacian(image: jax.Array, mode: str = "reflect") -> jax.Array:
    """4-neighbour Laplacian stencil."""
    k = jnp.array([[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], jnp.float32)
    return filter2d(image, k, mode=mode)


def _blend(img1: jax.Array, img2: jax.Array, ratio: float, bound: float) -> jax.Array:
    out = ratio * img1 + (1.0 - ratio) * img2
    return jnp.clip(out, 0.0, bound)


def adjust_sharpness(image: jax.Array, sharpness_factor: float) -> jax.Array:
    """Sharpness adjustment with the reference's 3x3 smoothing stencil and
    interior-only update (``adjust_sharpness`` / ``_blurred_degenerate_image``,
    ``_functional_tensor.py:809-838``)."""
    if sharpness_factor < 0:
        raise ValueError("sharpness_factor must be non-negative")
    image = jnp.asarray(image)
    h, w = (image.shape[-3], image.shape[-2]) if image.ndim >= 3 else image.shape
    if h <= 2 or w <= 2:
        return image

    from .._dtype import cast_back, cast_to_float, max_value

    fimg, orig = cast_to_float(image)
    k = jnp.ones((3, 3), fimg.dtype)
    k = k.at[1, 1].set(5.0)
    k = k / jnp.sum(k)

    nhwc, restore = ensure_nhwc(fimg)
    blurred_interior = _depthwise_conv_valid(nhwc, k)  # VALID: (H-2, W-2)
    # uint8 sources round the blurred intermediate before blending (the
    # reference's _cast_squeeze_out runs inside _blurred_degenerate_image).
    from .._dtype import is_integer_dtype

    if is_integer_dtype(orig):
        info = jnp.iinfo(orig)
        blurred_interior = jnp.clip(jnp.round(blurred_interior), info.min, info.max)
    degenerate = nhwc.at[:, 1:-1, 1:-1, :].set(blurred_interior)
    out = _blend(nhwc, degenerate, sharpness_factor, max_value(orig))
    return cast_back(restore(out), orig)


def unsharp_mask(
    image: jax.Array,
    kernel_size: Union[int, Sequence[int]] = 5,
    sigma: Optional[Union[float, Sequence[float]]] = None,
    amount: float = 1.0,
) -> jax.Array:
    """Classic unsharp masking: ``img + amount * (img - gaussian_blur(img))``."""
    from .._dtype import cast_back, cast_to_float, max_value

    fimg, orig = cast_to_float(jnp.asarray(image))
    blurred = gaussian_blur(fimg, kernel_size, sigma)
    out = jnp.clip(fimg + amount * (fimg - blurred), 0.0, max_value(orig))
    return cast_back(out, orig)

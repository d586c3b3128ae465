"""Edge and corner detectors: Canny, Harris.

These are the north-star multi-stage pipelines (BASELINE.json): the XLA
reference implementations here define the semantics; the fused Pallas
kernels in ``ops/pallas`` must match them.

Canny follows the classic OpenCV recipe: Gaussian smoothing → Sobel
gradients → gradient-direction non-maximum suppression (4 quantised
directions) → double threshold → hysteresis by iterated masked dilation
(a ``lax.while_loop`` fixpoint — the TPU-friendly formulation of the
reference-era flood fill; dynamic queues are not expressible under XLA).

Harris: structure tensor from Sobel gradients, Gaussian (or box) window,
response ``det(M) - k·tr(M)²``, then threshold + 3x3 local NMS.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .._dtype import cast_to_float
from .._layout import ensure_nhwc, num_channels
from .color import rgb_to_grayscale
from .filters import gaussian_blur, pad2d, sobel_gradients

__all__ = [
    "canny",
    "canny_nms",
    "hysteresis",
    "harris_response",
    "harris",
]


def _shift(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Shift an (N,H,W) map by (dy,dx), zero-filling (for neighbour access)."""
    n, h, w = x.shape
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    return lax.slice(padded, (0, 1 + dy, 1 + dx), (n, 1 + dy + h, 1 + dx + w))


def canny_nms(mag: jax.Array, gx: jax.Array, gy: jax.Array) -> jax.Array:
    """Directional non-maximum suppression of a gradient magnitude map.

    ``mag/gx/gy`` are (N,H,W).  The gradient angle is quantised to 4
    directions (0°, 45°, 90°, 135°); a pixel survives when its magnitude is
    >= both neighbours along its gradient direction (ties keep the pixel,
    matching OpenCV's `>` on one side and `>=` on the other).
    """
    # Direction bins without atan2 (not lowerable to the TPU vector unit):
    # the quantised gradient direction only needs |gy| vs tan(22.5°)·|gx|,
    # |gy| vs tan(67.5°)·|gx|, and sign(gx·gy).  Bit-identical logic in the
    # fused Pallas kernel.
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    t_lo = jnp.float32(0.41421356)  # tan 22.5°
    t_hi = jnp.float32(2.4142137)  # tan 67.5°
    d0 = ay < t_lo * ax
    d90 = ay >= t_hi * ax
    d45 = (~d0) & (~d90) & ((gx * gy) >= 0)
    # else 135°

    # neighbour magnitudes come from a reflect ring: for symmetric smoothing
    # kernels the gradient magnitude of the reflect-padded image IS the
    # reflect-pad of the magnitude, which is what the fused Pallas kernel
    # computes in its halo
    def _rshift(x, dy, dx):
        n, h, w = x.shape
        padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="reflect")
        return lax.slice(padded, (0, 1 + dy, 1 + dx), (n, 1 + dy + h, 1 + dx + w))

    n_e, n_w = _rshift(mag, 0, 1), _rshift(mag, 0, -1)          # 0°: horizontal
    n_ne, n_sw = _rshift(mag, -1, 1), _rshift(mag, 1, -1)       # 45°
    n_n, n_s = _rshift(mag, -1, 0), _rshift(mag, 1, 0)          # 90°
    n_nw, n_se = _rshift(mag, -1, -1), _rshift(mag, 1, 1)       # 135°

    nb1 = jnp.where(d0, n_e, jnp.where(d45, n_ne, jnp.where(d90, n_n, n_nw)))
    nb2 = jnp.where(d0, n_w, jnp.where(d45, n_sw, jnp.where(d90, n_s, n_se)))
    keep = (mag >= nb1) & (mag > nb2)
    return jnp.where(keep, mag, 0.0)


def hysteresis(
    strong: jax.Array,
    weak: jax.Array,
    max_iters: Optional[int] = None,
    steps_per_iter: int = 1,
) -> jax.Array:
    """Grow ``strong`` (N,H,W bool) through 8-connected ``weak`` pixels until
    fixpoint (bounded ``while_loop``).  Returns the final strong mask.

    ``steps_per_iter`` propagation steps run between convergence checks
    (growth is monotone so the result is identical).  Measured on v5e the
    per-iteration ``any`` check is cheap and extra tail dilations dominate,
    so the default stays 1.
    """

    def dilate(m: jax.Array) -> jax.Array:
        # separable 3x3 OR-dilation (max filter): 4 shifted ORs instead of
        # 8 — measured ~16% faster per sweep on v5e at 1080p batch 8
        v = m | _shift(m, -1, 0) | _shift(m, 1, 0)
        return v | _shift(v, 0, -1) | _shift(v, 0, 1)

    def cond(state):
        mask, changed, it = state
        bound = jnp.asarray(True) if max_iters is None else it < max_iters
        return changed & bound

    def body(state):
        mask, _, it = state
        grown = mask
        for _ in range(steps_per_iter):
            grown = dilate(grown) & weak | grown
        return grown, jnp.any(grown != mask), it + steps_per_iter

    mask, _, _ = lax.while_loop(cond, body, (strong, jnp.asarray(True), jnp.asarray(0)))
    return mask


def canny(
    image: jax.Array,
    low_threshold: float = 0.1,
    high_threshold: float = 0.2,
    kernel_size: int = 5,
    sigma: float = 1.4,
    use_hysteresis: bool = True,
    max_hysteresis_iters: Optional[int] = None,
    backend: Optional[str] = None,
) -> jax.Array:
    """Canny edge map.  Thresholds are on the Sobel gradient magnitude of the
    smoothed image (same value scale as the input: pass ~[0,1] thresholds for
    float images in [0,1], 0..255-scale thresholds for uint8 inputs).

    Returns a float32 edge mask of the input's spatial rank (values 0/1).

    ``backend``: "pallas" (fused VMEM kernel, default on TPU), "xla"
    (reference implementation), or None for auto.
    """
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas" and use_hysteresis:
        from .pallas import fused_canny

        return fused_canny(
            image, low_threshold, high_threshold, kernel_size, sigma, max_hysteresis_iters
        )
    image = jnp.asarray(image)
    fimg, _ = cast_to_float(image)
    if num_channels(fimg) > 1:
        fimg = rgb_to_grayscale(fimg)
    nhwc, restore = ensure_nhwc(fimg)

    blurred = gaussian_blur(nhwc, kernel_size, sigma)
    gx4, gy4 = sobel_gradients(blurred)
    gx, gy = gx4[..., 0], gy4[..., 0]  # (N,H,W)
    mag = jnp.sqrt(gx * gx + gy * gy)

    suppressed = canny_nms(mag, gx, gy)

    strong = suppressed >= high_threshold
    weak = suppressed >= low_threshold
    if use_hysteresis:
        edges = hysteresis(strong, weak, max_hysteresis_iters)
    else:
        edges = strong
    out = edges[..., None].astype(jnp.float32)
    return restore(out)


def harris_response(
    image: jax.Array,
    k: float = 0.04,
    window_size: int = 5,
    sigma: float = 1.0,
    window: str = "gaussian",
) -> jax.Array:
    """Harris corner response ``det(M) - k·tr(M)²`` with a smoothed structure
    tensor.  Returns a float map of the input's spatial rank."""
    from .filters import _depthwise_conv_valid, get_gaussian_kernel1d, sobel_kernels

    image = jnp.asarray(image)
    fimg, _ = cast_to_float(image)
    if num_channels(fimg) > 1:
        fimg = rgb_to_grayscale(fimg)
    nhwc, restore = ensure_nhwc(fimg)

    # single reflect of the *image* by the full halo (sobel + window); the
    # fused Pallas kernel computes the same way, so they match everywhere
    # including borders
    r = window_size // 2
    halo = 1 + r
    padded = pad2d(nhwc, halo, mode="reflect")
    gx_k, gy_k = sobel_kernels(padded.dtype)
    gx = _depthwise_conv_valid(padded, gx_k)  # (n, h+2r, w+2r, c)
    gy = _depthwise_conv_valid(padded, gy_k)
    ixx, iyy, ixy = gx * gx, gy * gy, gx * gy

    if window == "gaussian":
        k1 = get_gaussian_kernel1d(window_size, sigma)
        win = jnp.outer(k1, k1)
    elif window == "box":
        win = jnp.full((window_size, window_size), 1.0 / window_size**2, jnp.float32)
    else:
        raise ValueError(f"unknown window {window!r}")
    sxx = _depthwise_conv_valid(ixx, win)
    syy = _depthwise_conv_valid(iyy, win)
    sxy = _depthwise_conv_valid(ixy, win)

    det = sxx * syy - sxy * sxy
    trace = sxx + syy
    return restore(det - k * trace * trace)


def harris(
    image: jax.Array,
    max_corners: int = 100,
    k: float = 0.04,
    quality_level: float = 0.01,
    window_size: int = 5,
    sigma: float = 1.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Harris corner detection with 3x3 local NMS and top-k selection.

    Returns ``(coords, scores, valid)`` with fixed shapes: coords (K,2) as
    (row, col), scores (K,), valid (K,) bool — padded entries have
    valid=False (TPU-native fixed-size output instead of a dynamic list).
    Single image input (HW or HWC).
    """
    resp = harris_response(image, k=k, window_size=window_size, sigma=sigma)
    r = resp if resp.ndim == 2 else resp[..., 0]
    h, w = r.shape

    # 3x3 local NMS
    r3 = r[None]
    local_max = r3
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            local_max = jnp.maximum(local_max, _shift(r3, dy, dx))
    is_peak = (r3 >= local_max)[0] & (r > quality_level * jnp.max(r))

    scores = jnp.where(is_peak, r, -jnp.inf).reshape(-1)
    top_scores, top_idx = lax.top_k(scores, max_corners)
    coords = jnp.stack([top_idx // w, top_idx % w], axis=-1)
    valid = jnp.isfinite(top_scores)
    return coords, jnp.where(valid, top_scores, 0.0), valid

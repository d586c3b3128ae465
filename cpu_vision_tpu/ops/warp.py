"""Geometric warps: grid_sample, affine, rotate, perspective, elastic.

Matches the reference's grid-transform pipeline:

* grid sampling — semantics of ``torch.nn.functional.grid_sample`` with
  ``align_corners=False`` and ``padding_mode="zeros"`` (the only config the
  reference uses, ``_functional_tensor.py:560``).
* grid generation — ``_gen_affine_grid`` (``_functional_tensor.py:579-602``),
  ``_perspective_grid`` (``:672-698``).
* fill handling — the appended-mask trick of ``_apply_grid_transform``
  (``_functional_tensor.py:545-576``).

TPU-native: sampling is a vectorised 4-tap gather over a flattened H*W axis
(one ``jnp.take`` per tap), fused by XLA — no scalar loops.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from .._dtype import cast_back, cast_to_float
from .._layout import ensure_nhwc

__all__ = [
    "grid_sample",
    "affine_grid",
    "perspective_grid",
    "warp_affine",
    "affine",
    "rotate",
    "perspective",
    "elastic",
    "get_rotation_matrix",
    "get_inverse_affine_matrix",
]


def _unnormalize(coord: jax.Array, size: int) -> jax.Array:
    """[-1, 1] grid coord -> pixel coord, align_corners=False."""
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_2d(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """img (N,H,W,C), iy/ix (N,Ho,Wo) int32 in-range -> (N,Ho,Wo,C)."""
    n, h, w, c = img.shape
    flat = img.reshape(n, h * w, c)
    idx = iy * w + ix  # (N,Ho,Wo)
    out = jnp.take_along_axis(flat, idx.reshape(n, -1, 1), axis=1)
    return out.reshape(n, iy.shape[1], iy.shape[2], c)


def grid_sample(
    image: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jax.Array:
    """Sample ``image`` (N,H,W,C) at ``grid`` (N,Ho,Wo,2) of (x, y) in [-1,1].

    Out-of-range taps contribute 0 (``zeros``) or clamp to the border
    (``border``).  Float images only (cast around it for integers).
    """
    if mode not in ("bilinear", "nearest"):
        raise ValueError(f"unsupported mode {mode!r}")
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode {padding_mode!r}")
    n, h, w, c = image.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (w - 1)
        y = (gy + 1.0) * 0.5 * (h - 1)
    else:
        x = _unnormalize(gx, w)
        y = _unnormalize(gy, h)

    if mode == "nearest":
        # round-half-away-from-even matches torch's nearest (std::nearbyint
        # rounds half-to-even; torch grid_sampler uses std::nearbyint)
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        if padding_mode == "zeros":
            valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            out = _gather_2d(image, jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1))
            return out * valid[..., None].astype(image.dtype)
        return _gather_2d(image, jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1))

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = jnp.zeros((n, grid.shape[1], grid.shape[2], c), image.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            ix = x0i + dx
            iy = y0i + dy
            wgt = (tx if dx else (1.0 - tx)) * (ty if dy else (1.0 - ty))
            if padding_mode == "zeros":
                valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
                wgt = wgt * valid.astype(image.dtype)
            tap = _gather_2d(image, jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1))
            out = out + tap * wgt[..., None]
    return out


def affine_grid(matrix: Sequence[float], w: int, h: int, ow: int, oh: int) -> jax.Array:
    """Sampling grid (1,oh,ow,2) for a 2x3 inverse affine ``matrix``
    (reference ``_gen_affine_grid``, ``_functional_tensor.py:579-602``)."""
    theta = jnp.asarray(matrix, jnp.float32).reshape(2, 3)
    d = 0.5
    xg = jnp.linspace(-ow * 0.5 + d, ow * 0.5 + d - 1, ow, dtype=jnp.float32)
    yg = jnp.linspace(-oh * 0.5 + d, oh * 0.5 + d - 1, oh, dtype=jnp.float32)
    base = jnp.stack(
        [
            jnp.broadcast_to(xg[None, :], (oh, ow)),
            jnp.broadcast_to(yg[:, None], (oh, ow)),
            jnp.ones((oh, ow), jnp.float32),
        ],
        axis=-1,
    )  # (oh, ow, 3)
    rescaled = theta.T / jnp.asarray([0.5 * w, 0.5 * h], jnp.float32)
    return (base.reshape(-1, 3) @ rescaled).reshape(1, oh, ow, 2)


def perspective_grid(coeffs: Sequence[float], ow: int, oh: int) -> jax.Array:
    """Sampling grid for 8 perspective coefficients (reference
    ``_perspective_grid``, ``_functional_tensor.py:672-698``)."""
    c = [float(v) for v in coeffs]
    theta1 = jnp.asarray([[c[0], c[1], c[2]], [c[3], c[4], c[5]]], jnp.float32)
    theta2 = jnp.asarray([[c[6], c[7], 1.0], [c[6], c[7], 1.0]], jnp.float32)
    d = 0.5
    xg = jnp.linspace(d, ow * 1.0 + d - 1.0, ow, dtype=jnp.float32)
    yg = jnp.linspace(d, oh * 1.0 + d - 1.0, oh, dtype=jnp.float32)
    base = jnp.stack(
        [
            jnp.broadcast_to(xg[None, :], (oh, ow)),
            jnp.broadcast_to(yg[:, None], (oh, ow)),
            jnp.ones((oh, ow), jnp.float32),
        ],
        axis=-1,
    ).reshape(-1, 3)
    rescaled1 = theta1.T / jnp.asarray([0.5 * ow, 0.5 * oh], jnp.float32)
    g1 = base @ rescaled1
    g2 = base @ theta2.T
    return (g1 / g2 - 1.0).reshape(1, oh, ow, 2)


def _apply_grid_transform(
    image: jax.Array,
    grid: jax.Array,
    mode: str,
    fill: Optional[Union[int, float, Sequence[float]]],
) -> jax.Array:
    """Reference ``_apply_grid_transform`` (``_functional_tensor.py:545-576``):
    zero-pad sampling, then composite the fill colour through a warped mask."""
    image = jnp.asarray(image)
    fimg, orig = cast_to_float(image)
    nhwc, restore = ensure_nhwc(fimg)
    n = nhwc.shape[0]
    if grid.shape[0] == 1 and n > 1:
        grid = jnp.broadcast_to(grid, (n, *grid.shape[1:]))

    if fill is not None:
        mask = jnp.ones((n, nhwc.shape[1], nhwc.shape[2], 1), nhwc.dtype)
        nhwc = jnp.concatenate([nhwc, mask], axis=-1)

    out = grid_sample(nhwc, grid, mode=mode, padding_mode="zeros", align_corners=False)

    if fill is not None:
        mask = out[..., -1:]
        out = out[..., :-1]
        fill_list = list(fill) if isinstance(fill, (tuple, list)) else [float(fill)]
        fill_arr = jnp.asarray(fill_list, out.dtype).reshape(1, 1, 1, -1)
        fill_arr = jnp.broadcast_to(fill_arr if fill_arr.shape[-1] > 1 else jnp.repeat(fill_arr, out.shape[-1], -1), out.shape)
        if mode == "nearest":
            out = jnp.where(mask < 0.5, fill_arr, out)
        else:
            out = out * mask + (1.0 - mask) * fill_arr
    return cast_back(restore(out), orig)


def affine(
    image: jax.Array,
    matrix: Sequence[float],
    interpolation: str = "nearest",
    fill: Optional[Union[int, float, Sequence[float]]] = None,
) -> jax.Array:
    """Affine transform by a 2x3 *inverse* matrix (output->input), matching
    reference ``affine`` (``_functional_tensor.py:605-618``)."""
    nhwc, _ = ensure_nhwc(jnp.asarray(image))
    h, w = nhwc.shape[1], nhwc.shape[2]
    grid = affine_grid(matrix, w=w, h=h, ow=w, oh=h)
    return _apply_grid_transform(image, grid, interpolation, fill)


warp_affine = affine


def _compute_affine_output_size(matrix: Sequence[float], w: int, h: int) -> Tuple[int, int]:
    """Expanded canvas size (reference ``_compute_affine_output_size``,
    ``_functional_tensor.py:621-651``)."""
    import numpy as np

    # float32 on purpose: the reference computes this in float32 and the
    # rounding of near-zero rotation terms (cos 90° = 6e-17 ≈ 0 in f32) is
    # what keeps a 90° expand from growing the canvas by one pixel.
    pts = np.array(
        [
            [-0.5 * w, -0.5 * h, 1.0],
            [-0.5 * w, 0.5 * h, 1.0],
            [0.5 * w, 0.5 * h, 1.0],
            [0.5 * w, -0.5 * h, 1.0],
        ],
        np.float32,
    )
    theta = np.array(matrix, np.float32).reshape(2, 3)
    new_pts = pts @ theta.T
    min_vals = new_pts.min(axis=0) + np.array([w * 0.5, h * 0.5], np.float32)
    max_vals = new_pts.max(axis=0) + np.array([w * 0.5, h * 0.5], np.float32)
    tol = 1e-4
    cmax = np.ceil(np.trunc(max_vals / tol) * tol)
    cmin = np.floor(np.trunc(min_vals / tol) * tol)
    size = cmax - cmin
    return int(size[0]), int(size[1])  # (w, h)


def get_inverse_affine_matrix(
    center: Sequence[float],
    angle: float,
    translate: Sequence[float],
    scale: float,
    shear: Sequence[float],
) -> List[float]:
    """Inverse affine matrix for rotate/translate/scale/shear about ``center``
    (reference ``transforms/functional.py:_get_inverse_affine_matrix``)."""
    rot = math.radians(angle)
    sx = math.radians(shear[0])
    sy = math.radians(shear[1])
    cx, cy = center
    tx, ty = translate

    a = math.cos(rot - sy) / math.cos(sy)
    b = -math.cos(rot - sy) * math.tan(sx) / math.cos(sy) - math.sin(rot)
    c = math.sin(rot - sy) / math.cos(sy)
    d = -math.sin(rot - sy) * math.tan(sx) / math.cos(sy) + math.cos(rot)

    # inverse: scale then invert the 2x2, then translations
    matrix = [d, -b, 0.0, -c, a, 0.0]
    matrix = [x / scale for x in matrix]
    matrix[2] += matrix[0] * (-cx - tx) + matrix[1] * (-cy - ty)
    matrix[5] += matrix[3] * (-cx - tx) + matrix[4] * (-cy - ty)
    matrix[2] += cx
    matrix[5] += cy
    return matrix


def get_rotation_matrix(angle: float, center: Tuple[float, float] = (0.0, 0.0)) -> List[float]:
    return get_inverse_affine_matrix(center, angle, (0.0, 0.0), 1.0, (0.0, 0.0))


def rotate(
    image: jax.Array,
    angle: float,
    interpolation: str = "nearest",
    expand: bool = False,
    center: Optional[Tuple[float, float]] = None,
    fill: Optional[Union[int, float, Sequence[float]]] = None,
) -> jax.Array:
    """Rotate counter-clockwise by ``angle`` degrees about ``center``
    (defaults to the image centre), reference ``rotate``
    (``_functional_tensor.py:654-669``)."""
    nhwc, _ = ensure_nhwc(jnp.asarray(image))
    h, w = nhwc.shape[1], nhwc.shape[2]
    if center is None:
        ctr = (0.0, 0.0)
    else:
        # shift to the center-origin frame the matrix works in
        ctr = (center[0] - w * 0.5, center[1] - h * 0.5)
    matrix = get_inverse_affine_matrix(ctr, -angle, (0.0, 0.0), 1.0, (0.0, 0.0))
    ow, oh = _compute_affine_output_size(matrix, w, h) if expand else (w, h)
    grid = affine_grid(matrix, w=w, h=h, ow=ow, oh=oh)
    return _apply_grid_transform(image, grid, interpolation, fill)


def perspective(
    image: jax.Array,
    coeffs: Sequence[float],
    interpolation: str = "bilinear",
    fill: Optional[Union[int, float, Sequence[float]]] = None,
) -> jax.Array:
    """Perspective warp by 8 coefficients (reference ``perspective``,
    ``_functional_tensor.py:701-724``)."""
    nhwc, _ = ensure_nhwc(jnp.asarray(image))
    h, w = nhwc.shape[1], nhwc.shape[2]
    grid = perspective_grid(coeffs, ow=w, oh=h)
    return _apply_grid_transform(image, grid, interpolation, fill)


def elastic(
    image: jax.Array,
    displacement: jax.Array,
    interpolation: str = "bilinear",
    fill: Optional[Union[int, float, Sequence[float]]] = None,
) -> jax.Array:
    """Elastic warp: identity grid + ``displacement`` (1,H,W,2) in normalised
    units (reference ``elastic_transform``, ``_functional_tensor.py:947``)."""
    nhwc, _ = ensure_nhwc(jnp.asarray(image))
    h, w = nhwc.shape[1], nhwc.shape[2]
    # identity grid in [-1, 1], align_corners=False convention
    xg = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    yg = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0 - 1.0
    base = jnp.stack(
        [jnp.broadcast_to(xg[None, :], (h, w)), jnp.broadcast_to(yg[:, None], (h, w))],
        axis=-1,
    )[None]
    grid = base + jnp.asarray(displacement, jnp.float32)
    return _apply_grid_transform(image, grid, interpolation, fill)

"""Visualisation utilities (reference ``torchvision/utils.py``):
``make_grid`` (:25), ``draw_bounding_boxes`` (:155),
``draw_segmentation_masks`` (:264), ``draw_keypoints`` (:334),
``flow_to_image`` (:452).  Channels-last; pure array math (no PIL drawing)."""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "make_grid",
    "save_image",
    "draw_bounding_boxes",
    "draw_segmentation_masks",
    "draw_keypoints",
    "flow_to_image",
]

_PALETTE = np.array(
    [
        [244, 67, 54], [33, 150, 243], [76, 175, 80], [255, 193, 7],
        [156, 39, 176], [0, 188, 212], [255, 87, 34], [63, 81, 181],
        [139, 195, 74], [233, 30, 99], [0, 150, 136], [121, 85, 72],
    ],
    np.uint8,
)


def _color(spec, idx: int) -> np.ndarray:
    if spec is None:
        return _PALETTE[idx % len(_PALETTE)]
    if isinstance(spec, (list, tuple)) and spec and isinstance(spec[0], (list, tuple)):
        return np.asarray(spec[idx % len(spec)], np.uint8)
    return np.asarray(spec, np.uint8)


def make_grid(
    images: jax.Array,
    nrow: int = 8,
    padding: int = 2,
    pad_value: float = 0.0,
    normalize: bool = False,
    value_range: Optional[Tuple[float, float]] = None,
) -> jax.Array:
    """Tile NHWC images into one grid image (reference ``make_grid``,
    ``utils.py:25``)."""
    imgs = jnp.asarray(images)
    if imgs.ndim == 3:
        imgs = imgs[None]
    n, h, w, c = imgs.shape
    if normalize:
        lo, hi = value_range if value_range else (jnp.min(imgs), jnp.max(imgs))
        imgs = jnp.clip((imgs - lo) / jnp.maximum(hi - lo, 1e-5), 0, 1)
    ncol = min(nrow, n)
    nrows = math.ceil(n / ncol)
    gh = nrows * (h + padding) + padding
    gw = ncol * (w + padding) + padding
    grid = jnp.full((gh, gw, c), pad_value, imgs.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid = grid.at[y : y + h, x : x + w].set(imgs[i])
    return grid


def save_image(images, path: str, **grid_kwargs) -> None:
    """make_grid + PNG encode (reference ``save_image``, ``utils.py:128``)."""
    from .io import write_png
    from ._dtype import to_dtype

    grid = make_grid(images, **grid_kwargs)
    if grid.dtype != jnp.uint8:
        grid = to_dtype(jnp.clip(grid, 0, 1), jnp.uint8, scale=True)
    write_png(np.asarray(grid), path)


def draw_bounding_boxes(
    image: jax.Array,
    boxes: jax.Array,
    labels: Optional[Sequence[str]] = None,
    colors=None,
    width: int = 1,
) -> jax.Array:
    """Draw xyxy boxes on an HWC uint8 image (reference
    ``draw_bounding_boxes``, ``utils.py:155``; no text rendering)."""
    img = np.array(image)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, 2)
    h, w = img.shape[:2]
    bxs = np.asarray(boxes)
    for i, (x1, y1, x2, y2) in enumerate(bxs):
        color = _color(colors, i)
        x1i, y1i = max(int(round(x1)), 0), max(int(round(y1)), 0)
        x2i, y2i = min(int(round(x2)), w - 1), min(int(round(y2)), h - 1)
        for t in range(width):
            xa, ya = min(x1i + t, w - 1), min(y1i + t, h - 1)
            xb, yb = max(x2i - t, 0), max(y2i - t, 0)
            img[ya, xa : xb + 1] = color
            img[yb, xa : xb + 1] = color
            img[ya : yb + 1, xa] = color
            img[ya : yb + 1, xb] = color
    return jnp.asarray(img)


def draw_segmentation_masks(
    image: jax.Array,
    masks: jax.Array,
    alpha: float = 0.8,
    colors=None,
) -> jax.Array:
    """Alpha-blend boolean masks (K,H,W) or (H,W) onto an HWC uint8 image
    (reference ``draw_segmentation_masks``, ``utils.py:264``)."""
    img = np.array(image).astype(np.float32)
    m = np.asarray(masks)
    if m.ndim == 2:
        m = m[None]
    for i, mask in enumerate(m):
        color = _color(colors, i).astype(np.float32)
        mb = mask.astype(bool)
        img[mb] = (1 - alpha) * img[mb] + alpha * color
    return jnp.asarray(np.clip(np.round(img), 0, 255).astype(np.uint8))


def draw_keypoints(
    image: jax.Array,
    keypoints: jax.Array,
    connectivity: Optional[Sequence[Tuple[int, int]]] = None,
    colors=None,
    radius: int = 2,
) -> jax.Array:
    """Draw (K, P, 2) xy keypoints as discs (reference ``draw_keypoints``,
    ``utils.py:334``; line connectivity drawn with 1px Bresenham)."""
    img = np.array(image)
    if img.shape[2] == 1:
        img = np.repeat(img, 3, 2)
    h, w = img.shape[:2]
    kps = np.asarray(keypoints)
    if kps.ndim == 2:
        kps = kps[None]
    yy, xx = np.mgrid[0:h, 0:w]
    for ki, inst in enumerate(kps):
        color = _color(colors, ki)
        for x, y in inst:
            disc = (yy - y) ** 2 + (xx - x) ** 2 <= radius**2
            img[disc] = color
        if connectivity:
            for a, b in connectivity:
                x0, y0 = inst[a]
                x1, y1 = inst[b]
                steps = int(max(abs(x1 - x0), abs(y1 - y0), 1))
                for t in range(steps + 1):
                    xi = int(round(x0 + (x1 - x0) * t / steps))
                    yi = int(round(y0 + (y1 - y0) * t / steps))
                    if 0 <= yi < h and 0 <= xi < w:
                        img[yi, xi] = color
    return jnp.asarray(img)


def flow_to_image(flow: jax.Array) -> jax.Array:
    """Optical flow (..., H, W, 2) -> RGB uint8 via the Baker et al. color
    wheel (reference ``flow_to_image``/``_make_colorwheel``, ``utils.py:452-560``)."""
    f = np.asarray(flow, np.float32)
    single = f.ndim == 3
    if single:
        f = f[None]
    u, v = f[..., 0], f[..., 1]
    rad = np.sqrt(u * u + v * v)
    eps = 1e-5
    max_norm = rad.reshape(rad.shape[0], -1).max(axis=1).reshape(-1, 1, 1) + eps
    u = u / max_norm
    v = v / max_norm

    # color wheel (55 colors)
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    ncols = ry + yg + gc + cb + bm + mr
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:ry, 0] = 255
    wheel[0:ry, 1] = np.floor(255 * np.arange(ry) / ry)
    col += ry
    wheel[col : col + yg, 0] = 255 - np.floor(255 * np.arange(yg) / yg)
    wheel[col : col + yg, 1] = 255
    col += yg
    wheel[col : col + gc, 1] = 255
    wheel[col : col + gc, 2] = np.floor(255 * np.arange(gc) / gc)
    col += gc
    wheel[col : col + cb, 1] = 255 - np.floor(255 * np.arange(cb) / cb)
    wheel[col : col + cb, 2] = 255
    col += cb
    wheel[col : col + bm, 2] = 255
    wheel[col : col + bm, 0] = np.floor(255 * np.arange(bm) / bm)
    col += bm
    wheel[col : col + mr, 2] = 255 - np.floor(255 * np.arange(mr) / mr)
    wheel[col : col + mr, 0] = 255

    rad = np.sqrt(u * u + v * v)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    ff = fk - k0
    img = np.zeros(u.shape + (3,), np.uint8)
    for ch in range(3):
        c0 = wheel[k0, ch] / 255.0
        c1 = wheel[k1, ch] / 255.0
        c = (1 - ff) * c0 + ff * c1
        c = 1 - rad * (1 - c)
        img[..., ch] = np.floor(255 * c)
    out = jnp.asarray(img[0] if single else img)
    return out

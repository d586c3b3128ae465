"""RoI ops: roi_align, ps_roi_align, roi_pool, ps_roi_pool (NHWC).

Semantics follow the reference C++ kernels:

* ``roi_align`` — ``csrc/ops/cpu/roi_align_kernel.cpp:12-108`` (+ the
  bilinear tap rules of ``roi_align_common.h:35-78``), including the
  ``aligned`` −0.5 offset, the not-aligned min-size-1 rule, the
  outside-[-1, size] zero rule, and adaptive ``sampling_ratio=-1``.
* ``ps_roi_align`` — ``csrc/ops/cpu/ps_roi_align_kernel.cpp`` (position-
  sensitive channel mapping ``c = (c_out * PH + ph) * PW + pw``).
* ``roi_pool`` / ``ps_roi_pool`` — ``csrc/ops/cpu/roi_pool_kernel.cpp`` /
  ``ps_roi_pool_kernel.cpp`` (integer-cell max pooling), realised with a
  *bounded* per-bin cell grid (``max_cells``) so shapes stay static — bins
  larger than ``max_cells`` are subsampled (departure documented).

TPU-native formulation: everything is one vectorised gather + weighted
reduction (the reference's own ``torch.compile`` path,
``ops/roi_align.py:115-200``, validates this shape of implementation);
gradients flow through ``take`` automatically, giving the deterministic
backward the reference needed a custom autograd function for.

Layout: features are (N, H, W, C); ``rois`` are (K, 5) rows of
``(batch_index, x1, y1, x2, y2)`` in input coordinates.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["roi_align", "roi_align_pyramid", "ps_roi_align", "roi_pool",
           "ps_roi_pool"]


def _as_pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


def _roi_geometry(rois, spatial_scale, ph_out, pw_out, aligned):
    offset = 0.5 if aligned else 0.0
    batch_ind = rois[:, 0].astype(jnp.int32)
    start_w = rois[:, 1] * spatial_scale - offset
    start_h = rois[:, 2] * spatial_scale - offset
    end_w = rois[:, 3] * spatial_scale - offset
    end_h = rois[:, 4] * spatial_scale - offset
    roi_w = end_w - start_w
    roi_h = end_h - start_h
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_h = roi_h / ph_out
    bin_w = roi_w / pw_out
    return batch_ind, start_h, start_w, roi_h, roi_w, bin_h, bin_w


def _bilinear_gather(features, batch_ind, y, x, valid,
                     h_eff=None, w_eff=None, y_off=None):
    """Gather bilinear taps.

    features (N,H,W,C); y (K,PH,IY); x (K,PW,IX); valid (K,PH,PW,IY,IX)
    extra sample-validity mask.  Returns (K,PH,PW,IY,IX,C).

    ``h_eff``/``w_eff``/``y_off`` (K,) int32 generalise the map bounds per
    roi for the row-concatenated-pyramid path (``roi_align_pyramid``):
    clamping/outside rules use each roi's own level extent while index
    arithmetic uses the concatenated map, with ``y_off`` the level's row
    offset.
    """
    n, h, w, c = features.shape
    if h_eff is None:
        h3 = h5 = h
        w3 = w5 = w
        off3 = 0
    else:
        h3 = h_eff[:, None, None]
        h5 = h_eff[:, None, None, None, None]
        w3 = w_eff[:, None, None]
        w5 = w_eff[:, None, None, None, None]
        off3 = y_off[:, None, None]
    # outside-the-map rule of the C++ kernel (roi_align_common.h:41-47):
    # samples with y < -1 or y > H (resp. x) contribute exactly 0
    inside = (y[:, :, None, :, None] >= -1.0) & (y[:, :, None, :, None] <= h5) & \
             (x[:, None, :, None, :] >= -1.0) & (x[:, None, :, None, :] <= w5)
    valid = valid & inside

    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    y_low = y.astype(jnp.int32)
    x_low = x.astype(jnp.int32)
    y_high = jnp.where(y_low >= h3 - 1, h3 - 1, y_low + 1)
    y_low = jnp.where(y_low >= h3 - 1, h3 - 1, y_low)
    y = jnp.where(y_low >= h3 - 1, y_low.astype(y.dtype), y)
    x_high = jnp.where(x_low >= w3 - 1, w3 - 1, x_low + 1)
    x_low = jnp.where(x_low >= w3 - 1, w3 - 1, x_low)
    x = jnp.where(x_low >= w3 - 1, x_low.astype(x.dtype), x)

    # tap weights ride the FEATURE dtype: for bf16 models this keeps the
    # (K,PH,PW,IY,IX,C) tap products bf16 instead of materialising four
    # f32 copies (traced at ~7 ms/iter of the FasterRCNN-640 step); the
    # f32 path is bit-identical to before (parity tests run f32)
    wdt = features.dtype if jnp.issubdtype(features.dtype, jnp.floating) else jnp.float32
    ly = (y - y_low).astype(wdt)  # (K,PH,IY)
    lx = (x - x_low).astype(wdt)  # (K,PW,IX)
    hy = 1.0 - ly
    hx = 1.0 - lx

    flat = features.reshape(n * h * w, c)
    base = batch_ind[:, None, None, None, None] * (h * w)  # (K,1,1,1,1)

    def tap(yi, xi):
        idx = base + (yi + off3)[:, :, None, :, None] * w + xi[:, None, :, None, :]
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(*idx.shape, c)

    def wprod(wy, wx):
        return wy[:, :, None, :, None] * wx[:, None, :, None, :]

    out = (
        tap(y_low, x_low) * wprod(hy, hx)[..., None]
        + tap(y_low, x_high) * wprod(hy, lx)[..., None]
        + tap(y_high, x_low) * wprod(ly, hx)[..., None]
        + tap(y_high, x_high) * wprod(ly, lx)[..., None]
    )
    return out * valid[..., None].astype(out.dtype)


def _sample_coords(start, bin_sz, grid, n_out, n_samp):
    """y/x sample coordinates (K, n_out, n_samp): bin start + (i+0.5)/grid."""
    p = jnp.arange(n_out, dtype=jnp.float32)
    i = jnp.arange(n_samp, dtype=jnp.float32)
    return (
        start[:, None, None]
        + p[None, :, None] * bin_sz[:, None, None]
        + (i[None, None, :] + 0.5) * (bin_sz / grid)[:, None, None]
    )


def roi_align(
    features: jax.Array,
    rois: jax.Array,
    output_size: Union[int, Sequence[int]],
    spatial_scale: float = 1.0,
    sampling_ratio: int = -1,
    aligned: bool = False,
    adaptive_max_grid: int = 16,
) -> jax.Array:
    """RoIAlign average pooling -> (K, PH, PW, C).

    ``sampling_ratio > 0``: exactly that many samples per bin axis.
    ``sampling_ratio = -1``: adaptive ``ceil(roi_size / output_size)`` like
    the reference, realised with a static grid of ``adaptive_max_grid``
    masked samples (rois needing more are averaged over the first
    ``adaptive_max_grid`` samples per axis).
    """
    ph_out, pw_out = _as_pair(output_size)
    k = rois.shape[0]
    batch_ind, start_h, start_w, roi_h, roi_w, bin_h, bin_w = _roi_geometry(
        rois, spatial_scale, ph_out, pw_out, aligned
    )

    if sampling_ratio > 0:
        gh = jnp.full((k,), float(sampling_ratio), jnp.float32)
        gw = gh
        iy = ix = sampling_ratio
        count = jnp.full((k,), float(max(sampling_ratio * sampling_ratio, 1)), jnp.float32)
        valid = jnp.ones((k, ph_out, pw_out, iy, ix), bool)
    else:
        gh = jnp.ceil(roi_h / ph_out)
        gw = jnp.ceil(roi_w / pw_out)
        gh = jnp.clip(gh, 1.0, adaptive_max_grid)
        gw = jnp.clip(gw, 1.0, adaptive_max_grid)
        iy = ix = adaptive_max_grid
        ymask = jnp.arange(iy)[None, :] < gh[:, None]  # (K, IY)
        xmask = jnp.arange(ix)[None, :] < gw[:, None]
        valid = ymask[:, None, None, :, None] & xmask[:, None, None, None, :]
        valid = jnp.broadcast_to(valid, (k, ph_out, pw_out, iy, ix))
        count = jnp.maximum(gh * gw, 1.0)

    y = _sample_coords(start_h, bin_h, gh, ph_out, iy)
    x = _sample_coords(start_w, bin_w, gw, pw_out, ix)
    val = _bilinear_gather(features, batch_ind, y, x, valid)  # (K,PH,PW,IY,IX,C)
    acc = jnp.sum(val, axis=(3, 4), dtype=jnp.float32)  # f32 accumulate
    out = acc / count[:, None, None, None]
    return out.astype(val.dtype)


def roi_align_pyramid(
    features: Sequence[jax.Array],
    rois: jax.Array,
    levels: jax.Array,
    output_size: Union[int, Sequence[int]],
    scales: Sequence[float],
    sampling_ratio: int = 2,
    aligned: bool = False,
) -> jax.Array:
    """RoIAlign each roi ONCE at its assigned FPN level -> (K, PH, PW, C).

    Replaces pool-at-every-level-and-select (4x the gather traffic) with a
    single gather over a row-concatenated pyramid: levels stack along H
    (narrow levels zero-padded to the widest W — never read, since x is
    clamped to the level's own width), each roi's sample coordinates use
    its level's ``spatial_scale`` and row offset, and the per-level
    clamping/outside rules ride per-roi bounds (exact ``roi_align``
    semantics per level; reference ``ops/poolers.py:_multiscale_roi_align``
    scatters rois to per-level lists instead, which needs dynamic shapes).

    ``features``: per-level (N, H_l, W_l, C); ``levels``: (K,) int32;
    ``sampling_ratio`` must be > 0 (detection uses 2).
    """
    if sampling_ratio <= 0:
        raise ValueError("roi_align_pyramid requires a static sampling_ratio > 0")
    ph_out, pw_out = _as_pair(output_size)
    k = rois.shape[0]
    n, _, w0, c = features[0].shape
    hs = [int(f.shape[1]) for f in features]
    ws = [int(f.shape[2]) for f in features]
    offs = [0]
    for hh in hs[:-1]:
        offs.append(offs[-1] + hh)
    big = jnp.concatenate(
        [f if f.shape[2] == w0 else
         jnp.pad(f, ((0, 0), (0, 0), (0, w0 - f.shape[2]), (0, 0)))
         for f in features], axis=1)               # (N, sum(H_l), W0, C)

    scale_v = jnp.asarray(scales, jnp.float32)[levels]      # (K,)
    h_v = jnp.asarray(hs, jnp.int32)[levels]
    w_v = jnp.asarray(ws, jnp.int32)[levels]
    off_v = jnp.asarray(offs, jnp.int32)[levels]

    batch_ind, start_h, start_w, roi_h, roi_w, bin_h, bin_w = _roi_geometry(
        rois, scale_v, ph_out, pw_out, aligned)
    gh = jnp.full((k,), float(sampling_ratio), jnp.float32)
    iy = ix = sampling_ratio
    count = float(max(sampling_ratio * sampling_ratio, 1))
    valid = jnp.ones((k, ph_out, pw_out, iy, ix), bool)
    y = _sample_coords(start_h, bin_h, gh, ph_out, iy)
    x = _sample_coords(start_w, bin_w, gh, pw_out, ix)
    val = _bilinear_gather(big, batch_ind, y, x, valid,
                           h_eff=h_v, w_eff=w_v, y_off=off_v)
    acc = jnp.sum(val, axis=(3, 4), dtype=jnp.float32)  # f32 accumulate
    return (acc / count).astype(val.dtype)


def ps_roi_align(
    features: jax.Array,
    rois: jax.Array,
    output_size: Union[int, Sequence[int]],
    spatial_scale: float = 1.0,
    sampling_ratio: int = -1,
    adaptive_max_grid: int = 16,
) -> jax.Array:
    """Position-sensitive RoIAlign -> (K, PH, PW, C_out) where the input has
    ``C = C_out * PH * PW`` channels and output bin (ph, pw) reads channel
    block ``(c_out * PH + ph) * PW + pw`` (reference
    ``csrc/ops/cpu/ps_roi_align_kernel.cpp``; always ``aligned``-style with
    the -0.5 offset... the reference uses offset 0.5 unconditionally here)."""
    ph_out, pw_out = _as_pair(output_size)
    n, h, w, c = features.shape
    if c % (ph_out * pw_out) != 0:
        raise ValueError(f"channels {c} not divisible by {ph_out * pw_out}")
    c_out = c // (ph_out * pw_out)
    full = roi_align(
        features,
        rois,
        output_size,
        spatial_scale,
        sampling_ratio,
        aligned=True,
        adaptive_max_grid=adaptive_max_grid,
    )  # (K, PH, PW, C)
    # select channel block (c_out*PH + ph)*PW + pw per output position
    kk = full.shape[0]
    blocks = full.reshape(kk, ph_out, pw_out, c_out, ph_out, pw_out)
    ph_idx = jnp.arange(ph_out)
    pw_idx = jnp.arange(pw_out)
    sel = blocks[:, ph_idx[:, None], pw_idx[None, :], :, ph_idx[:, None], pw_idx[None, :]]
    # mixed advanced indexing moves the (PH, PW) dims to the front
    return jnp.moveaxis(sel, (0, 1), (1, 2))


def _exact_cell_bound(extent: int, bins: int) -> int:
    """Static upper bound on cells per pooling bin.

    Bin boundaries are ``floor(p*b)`` / ``ceil((p+1)*b)`` with cell size
    ``b <= extent / bins`` (coordinates clipped to ``[0, extent]``), so a bin
    spans at most ``ceil(b) + 1 <= ceil(extent / bins) + 1`` integer cells.
    """
    return -(-extent // bins) + 1


def roi_pool(
    features: jax.Array,
    rois: jax.Array,
    output_size: Union[int, Sequence[int]],
    spatial_scale: float = 1.0,
    max_cells: Optional[int] = None,
) -> jax.Array:
    """RoIPool max pooling -> (K, PH, PW, C).

    Reference semantics (``csrc/ops/cpu/roi_pool_kernel.cpp:20-80``): integer
    bin boundaries ``floor/ceil(p * roi_size / P)`` on the rounded roi, max
    over cells; empty bins yield 0.  The per-bin cell grid is statically
    sized at the exact worst case derived from the feature-map shape
    (``_exact_cell_bound``), so the result is exact for every RoI.  Passing
    ``max_cells`` smaller than that bound is a hard error (a silent cap
    could drop the true max for large RoIs).
    """
    ph_out, pw_out = _as_pair(output_size)
    n, h, w, c = features.shape
    need = max(_exact_cell_bound(h, ph_out), _exact_cell_bound(w, pw_out))
    if max_cells is None:
        max_cells = need
    elif max_cells < need:
        raise ValueError(
            f"roi_pool: max_cells={max_cells} cannot cover the worst-case bin "
            f"({need} cells for a {h}x{w} feature map with output_size "
            f"{(ph_out, pw_out)}); pass max_cells>={need} or None for exact"
        )
    k = rois.shape[0]
    batch_ind = rois[:, 0].astype(jnp.int32)
    start_w = jnp.round(rois[:, 1] * spatial_scale)
    start_h = jnp.round(rois[:, 2] * spatial_scale)
    end_w = jnp.round(rois[:, 3] * spatial_scale)
    end_h = jnp.round(rois[:, 4] * spatial_scale)
    roi_w = jnp.maximum(end_w - start_w + 1.0, 1.0)
    roi_h = jnp.maximum(end_h - start_h + 1.0, 1.0)
    bin_h = roi_h / ph_out
    bin_w = roi_w / pw_out

    p_h = jnp.arange(ph_out, dtype=jnp.float32)
    p_w = jnp.arange(pw_out, dtype=jnp.float32)
    # cell ranges per bin (K, P)
    h_lo = jnp.floor(p_h[None] * bin_h[:, None]) + start_h[:, None]
    h_hi = jnp.ceil((p_h[None] + 1.0) * bin_h[:, None]) + start_h[:, None]
    w_lo = jnp.floor(p_w[None] * bin_w[:, None]) + start_w[:, None]
    w_hi = jnp.ceil((p_w[None] + 1.0) * bin_w[:, None]) + start_w[:, None]
    h_lo = jnp.clip(h_lo, 0, h)
    h_hi = jnp.clip(h_hi, 0, h)
    w_lo = jnp.clip(w_lo, 0, w)
    w_hi = jnp.clip(w_hi, 0, w)

    cell = jnp.arange(max_cells, dtype=jnp.float32)
    # integer cell coordinates (K, P, CELLS); beyond-range cells masked
    ys = h_lo[:, :, None] + cell[None, None, :]
    xs = w_lo[:, :, None] + cell[None, None, :]
    ymask = ys < h_hi[:, :, None]
    xmask = xs < w_hi[:, :, None]
    ysc = jnp.clip(ys, 0, h - 1).astype(jnp.int32)
    xsc = jnp.clip(xs, 0, w - 1).astype(jnp.int32)

    flat = features.reshape(n * h * w, c)
    base = batch_ind[:, None, None, None, None, None] * (h * w)
    idx = base + ysc[:, :, None, :, None, None] * w + xsc[:, None, :, None, :, None]
    idx = jnp.broadcast_to(idx, (k, ph_out, pw_out, max_cells, max_cells, 1))
    vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(k, ph_out, pw_out, max_cells, max_cells, c)
    mask = (ymask[:, :, None, :, None] & xmask[:, None, :, None, :])[..., None]
    neg = jnp.asarray(-jnp.inf, vals.dtype)
    vals = jnp.where(mask, vals, neg)
    out = vals.max(axis=(3, 4))
    # empty bins -> 0 (reference initialises with 0 when is_empty)
    empty = ~jnp.any(mask, axis=(3, 4))
    return jnp.where(empty, 0.0, out)


def ps_roi_pool(
    features: jax.Array,
    rois: jax.Array,
    output_size: Union[int, Sequence[int]],
    spatial_scale: float = 1.0,
    max_cells: Optional[int] = None,
) -> jax.Array:
    """Position-sensitive RoIPool (average over cells, channel block per
    bin) -> (K, PH, PW, C_out).  Reference
    ``csrc/ops/cpu/ps_roi_pool_kernel.cpp`` (avg, not max).  Cell grid
    statically sized at the exact worst case (see :func:`roi_pool`)."""
    ph_out, pw_out = _as_pair(output_size)
    n, h, w, c = features.shape
    need = max(_exact_cell_bound(h, ph_out), _exact_cell_bound(w, pw_out))
    if max_cells is None:
        max_cells = need
    elif max_cells < need:
        raise ValueError(
            f"ps_roi_pool: max_cells={max_cells} cannot cover the worst-case "
            f"bin ({need} cells); pass max_cells>={need} or None for exact"
        )
    if c % (ph_out * pw_out) != 0:
        raise ValueError(f"channels {c} not divisible by {ph_out * pw_out}")
    c_out = c // (ph_out * pw_out)
    k = rois.shape[0]
    batch_ind = rois[:, 0].astype(jnp.int32)
    start_w = jnp.round(rois[:, 1] * spatial_scale)
    start_h = jnp.round(rois[:, 2] * spatial_scale)
    end_w = jnp.round(rois[:, 3] * spatial_scale)
    end_h = jnp.round(rois[:, 4] * spatial_scale)
    roi_w = jnp.maximum(end_w - start_w, 0.1)
    roi_h = jnp.maximum(end_h - start_h, 0.1)
    bin_h = roi_h / ph_out
    bin_w = roi_w / pw_out

    p_h = jnp.arange(ph_out, dtype=jnp.float32)
    p_w = jnp.arange(pw_out, dtype=jnp.float32)
    h_lo = jnp.clip(jnp.floor(p_h[None] * bin_h[:, None] + start_h[:, None]), 0, h - 1)
    h_hi = jnp.clip(jnp.ceil((p_h[None] + 1.0) * bin_h[:, None] + start_h[:, None]), 0, h)
    w_lo = jnp.clip(jnp.floor(p_w[None] * bin_w[:, None] + start_w[:, None]), 0, w - 1)
    w_hi = jnp.clip(jnp.ceil((p_w[None] + 1.0) * bin_w[:, None] + start_w[:, None]), 0, w)

    cell = jnp.arange(max_cells, dtype=jnp.float32)
    ys = h_lo[:, :, None] + cell[None, None, :]
    xs = w_lo[:, :, None] + cell[None, None, :]
    ymask = ys < h_hi[:, :, None]
    xmask = xs < w_hi[:, :, None]
    ysc = jnp.clip(ys, 0, h - 1).astype(jnp.int32)
    xsc = jnp.clip(xs, 0, w - 1).astype(jnp.int32)

    flat = features.reshape(n * h * w, c)
    base = batch_ind[:, None, None, None, None] * (h * w)
    idx = base + ysc[:, :, None, :, None] * w + xsc[:, None, :, None, :]
    vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(k, ph_out, pw_out, max_cells, max_cells, c)
    mask = (ymask[:, :, None, :, None] & xmask[:, None, :, None, :])[..., None]
    summed = jnp.where(mask, vals, 0.0).sum(axis=(3, 4))
    area = jnp.maximum(mask.sum(axis=(3, 4)).astype(summed.dtype), 1.0)
    avg = summed / area  # (K, PH, PW, C)
    # position-sensitive channel selection
    blocks = avg.reshape(k, ph_out, pw_out, c_out, ph_out, pw_out)
    ph_idx = jnp.arange(ph_out)
    pw_idx = jnp.arange(pw_out)
    sel = blocks[:, ph_idx[:, None], pw_idx[None, :], :, ph_idx[:, None], pw_idx[None, :]]
    return jnp.moveaxis(sel, (0, 1), (1, 2))

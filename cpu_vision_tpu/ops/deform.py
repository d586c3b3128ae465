"""Deformable convolution v2 (NHWC).

Semantics of the reference kernel (``csrc/ops/cpu/deform_conv2d_kernel.cpp``,
1,172 lines of ``deformable_im2col`` + grouped ``addmm``): each kernel tap is
sampled at ``base + dilation·tap + learned offset`` with bilinear
interpolation (zero outside), optionally modulated by a mask, then
contracted with the weights.

TPU-native: the offset-sampled column tensor is built with one vectorised
4-tap gather (``(N, Ho, Wo, KH·KW, C_in)``) and the contraction is a single
``dot_general`` on the MXU — no im2col loops, and autodiff provides the
three backward paths the reference hand-writes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["deform_conv2d"]


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def deform_conv2d(
    x: jax.Array,
    offset: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: Tuple[int, int] = (1, 1),
    padding: Tuple[int, int] = (0, 0),
    dilation: Tuple[int, int] = (1, 1),
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Deformable conv v2.

    * ``x``      (N, H, W, C_in)
    * ``offset`` (N, Ho, Wo, 2·G_off·KH·KW) — interleaved (dy, dx) per tap,
      matching the reference's channel order (offset_groups major, then tap,
      then y/x).
    * ``weight`` (KH, KW, C_in // groups, C_out)
    * ``mask``   (N, Ho, Wo, G_off·KH·KW) modulation (v2), optional.

    Returns (N, Ho, Wo, C_out).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    n, h, w, c_in = x.shape
    kh, kw, c_in_per_group, c_out = weight.shape
    groups = c_in // c_in_per_group
    n_taps = kh * kw

    n_offset_grps = offset.shape[-1] // (2 * n_taps)
    if offset.shape[-1] != 2 * n_offset_grps * n_taps:
        raise ValueError("offset channels must be 2 * offset_groups * kh * kw")
    c_per_off = c_in // n_offset_grps

    ho = (h + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    wo = (w + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1

    # base sampling positions per output pixel and tap
    oy = jnp.arange(ho) * sh - ph
    ox = jnp.arange(wo) * sw - pw
    ty, tx = jnp.meshgrid(jnp.arange(kh) * dh, jnp.arange(kw) * dw, indexing="ij")
    base_y = oy[:, None, None] + ty.reshape(-1)[None, None, :]  # (Ho, 1, T)
    base_x = ox[None, :, None] + tx.reshape(-1)[None, None, :]  # (1, Wo, T)

    off = offset.reshape(n, ho, wo, n_offset_grps, n_taps, 2)
    y = base_y[None, :, :, None, :] + off[..., 0]  # (N, Ho, Wo, G, T)
    x_pos = base_x[None, :, :, None, :] + off[..., 1]

    # bilinear sample with zero padding outside
    y0 = jnp.floor(y)
    x0 = jnp.floor(x_pos)
    wy1 = y - y0
    wx1 = x_pos - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    flat = x.reshape(n, h * w, c_in)
    out = jnp.zeros((n, ho, wo, n_offset_grps, n_taps, c_per_off), x.dtype)
    for dy_i, wy in ((0, 1.0 - wy1), (1, wy1)):
        for dx_i, wx in ((0, 1.0 - wx1), (1, wx1)):
            yy = y0i + dy_i
            xx = x0i + dx_i
            valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)  # (N,Ho,Wo,G,T)
            g = jnp.take_along_axis(
                flat[:, :, None, :].reshape(n, h * w, c_in),
                idx.reshape(n, -1, 1),
                axis=1,
            ).reshape(n, ho, wo, n_offset_grps, n_taps, c_in)
            # each offset group drives its own channel block
            g = g.reshape(n, ho, wo, n_offset_grps, n_taps, n_offset_grps, c_per_off)
            gi = jnp.arange(n_offset_grps)
            g = g[:, :, :, gi, :, gi, :] if n_offset_grps > 1 else g[:, :, :, :, :, 0, :]
            if n_offset_grps > 1:
                # advanced indexing moved the group axis to the front
                g = jnp.moveaxis(g, 0, 3)
            wgt = (wy * wx) * valid.astype(x.dtype)
            out = out + g * wgt[..., None]

    if mask is not None:
        m = mask.reshape(n, ho, wo, n_offset_grps, n_taps)
        out = out * m[..., None]

    # contract taps x channels with the weights, grouped
    cols = out.reshape(n, ho, wo, n_taps, c_in)  # groups interleave channels
    wmat = weight.reshape(kh * kw, c_in_per_group, groups, c_out // groups)
    cols_g = cols.reshape(n, ho, wo, n_taps, groups, c_in_per_group)
    res = jnp.einsum(
        "nhwtgc,tcgo->nhwgo", cols_g, wmat, precision=lax.Precision.HIGHEST
    )
    res = res.reshape(n, ho, wo, c_out)
    if bias is not None:
        res = res + bias
    return res

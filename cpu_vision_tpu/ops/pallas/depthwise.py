"""Pallas depthwise KxK conv (stride 1, SAME, NHWC, channels on lanes).

The TPU options for ``Conv2d(groups=C)`` (reference ConvNeXt's 7x7,
``torchvision/models/convnext.py:62-92``) both measured far off the
bandwidth floor on v5e at (256, 56, 56, 96):

* grouped ``lax.conv``: 5.6 ms (XLA's depthwise path)
* XLA shifted-slice accumulation: 13.7 ms (49 HBM re-reads — XLA does
  not fuse the taps into one pass)
* HBM floor (read + write): 0.38 ms

This kernel reads each (padded) image into VMEM ONCE (grid over N),
materialises the Kw column shifts once (sublane-shift copies), then runs
the K*K FMA taps over free row offsets with an f32 VPU accumulator —
HBM traffic is exactly one read + one write.

Backward is a ``custom_vjp``: dgrad is the same kernel with a flipped
kernel; wgrad is the per-channel tap correlation in plain XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["depthwise_conv2d", "fits_vmem"]


def fits_vmem(h: int, w: int, c: int, kh: int, kw: int, itemsize: int,
              budget: int = 6_000_000) -> bool:
    """Padded image + Kw shifted copies + f32 accumulator within VMEM."""
    hp, wp = h + kh - 1, w + kw - 1
    tile = hp * wp * c * itemsize
    return tile * (1 + kw) + h * w * c * 4 <= budget


def _kernel(x_ref, k_ref, b_ref, o_ref, *, kh: int, kw: int, h: int, w: int,
            use_bias: bool):
    # x_ref: (1, h+kh-1, w+kw-1, C) padded image in VMEM
    C = x_ref.shape[-1]
    xp = x_ref[0]
    # one sublane-shift copy per kernel column; row offsets are free
    cols = [xp[:, j:j + w, :] for j in range(kw)]
    k32 = k_ref[...].astype(jnp.float32)        # (kh*kw, C)
    acc = jnp.zeros((h, w, C), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            acc = acc + cols[j][i:i + h].astype(jnp.float32) * k32[i * kw + j]
    if use_bias:
        acc = acc + b_ref[...].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _fwd_pallas(x, kernel, bias, interpret):
    n, h, w, c = x.shape
    kh, kw = kernel.shape[:2]
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    use_bias = bias is not None
    b_in = bias if use_bias else jnp.zeros((c,), jnp.float32)
    return pl.pallas_call(
        partial(_kernel, kh=kh, kw=kw, h=h, w=w, use_bias=use_bias),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + kh - 1, w + kw - 1, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((kh * kw, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        interpret=interpret,
    )(xp, kernel.reshape(kh * kw, c), b_in.reshape(1, c))


def _ref_math(x, kernel, bias):
    """Shifted-slice oracle in f32 (the backward recompute)."""
    n, h, w, c = x.shape
    kh, kw = kernel.shape[:2]
    xp = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    k32 = kernel.astype(jnp.float32)
    acc = jnp.zeros((n, h, w, c), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            acc = acc + jax.lax.slice(
                xp, (0, i, j, 0), (n, i + h, j + w, c)
            ).astype(jnp.float32) * k32[i, j]
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def depthwise_conv2d(x, kernel, bias, use_bias: bool = True,
                     interpret: bool = False):
    """Depthwise conv, stride 1 SAME, odd KxK.  ``kernel``: (kh, kw, C)
    per-channel taps; ``bias``: (C,) (pass zeros + use_bias=False for
    none)."""
    return _fwd_pallas(x, kernel, bias if use_bias else None, interpret)


def _fwd(x, kernel, bias, use_bias, interpret):
    return depthwise_conv2d(x, kernel, bias, use_bias, interpret), (x, kernel)


def _bwd(use_bias, interpret, res, g):
    x, kernel = res
    n, h, w, c = x.shape
    kh, kw = kernel.shape[:2]
    g32 = g.astype(jnp.float32)
    # dgrad: depthwise conv of g with the spatially-flipped kernel
    dx = _ref_math(g, kernel[::-1, ::-1], None).astype(x.dtype)
    # wgrad: per-channel correlation of x with g at each tap offset
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    taps = []
    for i in range(kh):
        row = []
        for j in range(kw):
            sl = jax.lax.slice(xp, (0, i, j, 0), (n, i + h, j + w, c))
            row.append(jnp.sum(sl * g32, axis=(0, 1, 2)))
        taps.append(jnp.stack(row, 0))
    dk = jnp.stack(taps, 0).astype(kernel.dtype)               # (kh, kw, C)
    db = jnp.sum(g32, axis=(0, 1, 2)).astype(
        kernel.dtype) if use_bias else jnp.zeros((c,), kernel.dtype)
    return dx, dk, db


depthwise_conv2d.defvjp(_fwd, _bwd)

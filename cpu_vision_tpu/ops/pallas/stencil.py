"""Halo-tiled fused stencil kernels (Pallas TPU).

Design
------
Inputs are single-channel ``(N, H, W)`` float32 maps (vision stencils are
per-channel; channels fold into N).  The image is reflect-padded once in XLA
(cheap, one bandwidth pass) so the kernel body is pure interior math.  A
grid of ``(N, H/TILE_H)`` programs each DMAs a ``(TILE_H + 2*halo, Wp)`` row
band from HBM into VMEM scratch, runs the whole fused pipeline on registers,
and writes a ``(TILE_H, W)`` output tile.  All stage intermediates (blur,
gradients, magnitude, NMS) live in VMEM — one HBM read + one write for the
entire pipeline, vs one read+write *per stage* in the unfused XLA versions.

Replaces the reference's per-stage depthwise convolutions
(torchvision ``transforms/_functional_tensor.py:746-764`` et al.) on the hot
paths named by the north star (gaussian+sobel, canny, harris).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..._dtype import cast_to_float
from ..._layout import ensure_nhwc


def _gaussian_taps(kernel_size: int, sigma: float) -> np.ndarray:
    """f32 Gaussian taps as host constants (pure NumPy — safe under jit;
    bitwise identical to ``filters.get_gaussian_kernel1d``)."""
    half = (kernel_size - 1) * 0.5
    x = np.linspace(-half, half, kernel_size, dtype=np.float32)
    pdf = np.exp((-0.5 * np.square(x.astype(np.float32) / np.float32(sigma))).astype(np.float32))
    return (pdf / pdf.sum()).astype(np.float32)

__all__ = [
    "fused_gaussian_blur",
    "fused_blur_sobel",
    "canny_stage1",
    "fused_canny",
    "harris_response_fused",
]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tile_h(h: int, halo: int, wp: int, n_bufs: int = 14) -> int:
    """Pick a row-tile height: small enough that ~n_bufs tile-sized f32
    buffers fit comfortably in VMEM, large enough to amortise the halo.
    Multiple of 32 so uint8 outputs stay sublane-aligned."""
    budget = 10 * 1024 * 1024  # leave headroom out of ~16 MB VMEM
    max_rows = max(32, budget // (n_bufs * wp * 4) - 2 * halo)
    tile = min(_round_up(h, 32), _round_up(min(max_rows, 256), 32))
    return max(32, tile)


def _halo_stencil_call(
    maps_nhw: jax.Array,
    halo: int,
    compute: Callable[[jax.Array], Sequence[jax.Array]],
    out_dtypes: Sequence,
    tile_h: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Run ``compute`` over reflect-padded row bands of ``maps_nhw`` (N,H,W).

    ``compute`` receives a ``(tile_h + 2*halo, Wp)`` f32 tile and must return
    one ``(tile_h, >=W)`` array per entry of ``out_dtypes`` (extra columns are
    sliced off).
    """
    n, h, w = maps_nhw.shape
    # pad W so the lane dimension stays 128-aligned end to end
    wp = _round_up(w + 2 * halo, 128)
    th = tile_h or _pick_tile_h(h, halo, wp)
    ht = _round_up(h, th)
    # DMA row-band must be a multiple of the 8-row f32 sublane tile
    band = _round_up(th + 2 * halo, 8)

    # Fast path: build the row halo *inside* the kernel (reflected row copies
    # in VMEM) so XLA only pads columns — one bandwidth pass instead of two.
    # Needs 8-aligned DMA row slabs, hence h % 8 == 0 and a full slab per
    # tile.  halo < 8 so one extra 8-row slab covers the top/bottom halos.
    slab = _round_up(th + 2 * halo + 8, 8)
    n_tiles = ht // th
    # middle tiles assume an unclamped slab start of ti*th - 8; the deepest
    # middle tile must not hit the h - slab clamp or its static in-slab
    # offset would be wrong
    mid_ok = n_tiles <= 2 or (n_tiles - 2) * th - 8 <= h - slab
    # th % 8 == 0 is load-bearing: slab_start's pl.multiple_of(…, 8) assert
    # and the static off_mid arithmetic assume 8-aligned tile starts
    fuse_rows = (h % 8 == 0) and (th % 8 == 0) and (h >= slab) and (halo < 8) \
        and (n_tiles >= 2) and mid_ok
    if fuse_rows:
        return _halo_stencil_call_rowfused(
            maps_nhw, halo, compute, out_dtypes, th, wp, interpret)

    # reflect only the halo ring (reflect pads must be < dim size); the
    # tile-rounding / lane-alignment filler is zeros and never reaches the
    # sliced-off output columns/rows
    padded = jnp.pad(maps_nhw, ((0, 0), (halo, halo), (halo, halo)), mode="reflect")
    padded = jnp.pad(
        padded, ((0, 0), (0, (ht - th + band) - (h + 2 * halo)), (0, wp - w - 2 * halo))
    )

    grid = (n, ht // th)
    n_tiles = ht // th

    def kernel(in_hbm, *out_refs_and_scratch):
        out_refs = out_refs_and_scratch[: len(out_dtypes)]
        scratch, sem = out_refs_and_scratch[len(out_dtypes) :]
        ni = pl.program_id(0)
        ti = pl.program_id(1)
        step = ni * n_tiles + ti  # global sequential step (grid runs row-major)

        def dma(slot, n_i, t_i):
            return pltpu.make_async_copy(
                in_hbm.at[n_i, pl.ds(t_i * th, band), :],
                scratch.at[slot],
                sem.at[slot],
            )

        # double buffering: warm up on the first step, then prefetch the
        # next band while computing the current one
        @pl.when(step == 0)
        def _():
            dma(0, ni, ti).start()

        nxt = step + 1
        nxt_ni = nxt // n_tiles
        nxt_ti = nxt % n_tiles

        @pl.when(nxt < n * n_tiles)
        def _():
            dma(nxt % 2, nxt_ni, nxt_ti).start()

        dma(step % 2, ni, ti).wait()
        results = compute(scratch[step % 2], th, ti)
        for ref, res in zip(out_refs, results):
            ref[0] = res[:, :w].astype(ref.dtype)

    out_shapes = tuple(jax.ShapeDtypeStruct((n, ht, w), dt) for dt in out_dtypes)
    out_specs = tuple(
        pl.BlockSpec((1, th, w), lambda ni, ti: (ni, ti, 0), memory_space=pltpu.VMEM)
        for _ in out_dtypes
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, band, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(padded)
    outs = outs if isinstance(outs, (tuple, list)) else (outs,)
    return tuple(o[:, :h, :] for o in outs)


def _halo_stencil_call_rowfused(
    maps_nhw: jax.Array,
    halo: int,
    compute: Callable[[jax.Array], Sequence[jax.Array]],
    out_dtypes: Sequence,
    th: int,
    wp: int,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Row-halo-in-kernel variant of :func:`_halo_stencil_call`.

    XLA pads only the lane (W) dimension; the sublane (row) halo is built in
    VMEM by copying/reflecting rows out of an 8-row-aligned DMA slab —
    saving one full HBM pass over the image.  Same compute contract: tile
    row 0 = image row ``ti*th - halo``.
    """
    n, h, w = maps_nhw.shape
    ht = _round_up(h, th)
    n_tiles = ht // th
    slab = _round_up(th + 2 * halo + 8, 8)  # covers th + halo rows ±8 slack
    band2 = _round_up(th + 2 * halo, 8)

    # single column pad: reflect halo cols + zero lane filler, one pass
    left = maps_nhw[:, :, 1 : halo + 1][:, :, ::-1]
    right = maps_nhw[:, :, w - halo - 1 : w - 1][:, :, ::-1]
    zcols = jnp.zeros((n, h, wp - w - 2 * halo), maps_nhw.dtype)
    padded = jnp.concatenate([left, maps_nhw, right, zcols], axis=2)  # (N,H,wp)

    last = n_tiles - 1
    # static in-slab offsets of image row ti*th - halo, per tile class
    off_first = 0                                  # slab starts at image row 0
    off_mid = 8 - halo                             # slab starts at ti*th - 8
    off_last = last * th - halo - (h - slab) if n_tiles > 1 else 0

    def kernel(in_hbm, *out_refs_and_scratch):
        out_refs = out_refs_and_scratch[: len(out_dtypes)]
        scratch, tile_ref, sem = out_refs_and_scratch[len(out_dtypes) :]
        ni = pl.program_id(0)
        ti = pl.program_id(1)
        step = ni * n_tiles + ti

        def slab_start(t_i):
            # 8-aligned (th % 8 == 0, h % 8 == 0, slab % 8 == 0); Mosaic's
            # divisibility prover can't see through the max/min clamps, so
            # assert the alignment with pl.multiple_of
            s = t_i * th - 8
            s = jnp.maximum(s, 0)
            return pl.multiple_of(jnp.minimum(s, h - slab), 8)

        def dma(slot, n_i, t_i):
            return pltpu.make_async_copy(
                in_hbm.at[n_i, pl.ds(slab_start(t_i), slab), :],
                scratch.at[slot],
                sem.at[slot],
            )

        @pl.when(step == 0)
        def _():
            dma(0, ni, ti).start()

        nxt = step + 1

        @pl.when(nxt < n * n_tiles)
        def _():
            dma(nxt % 2, nxt // n_tiles, nxt % n_tiles).start()

        dma(step % 2, ni, ti).wait()
        raw = scratch.at[step % 2]
        rows = th + 2 * halo

        # assemble the (th + 2*halo) tile rows at their in-slab offset
        # (n_tiles >= 2 is guaranteed by the fast-path gate)
        @pl.when(ti == 0)
        def _():
            # image rows [0, th + halo) land at tile rows [halo, ...)
            tile_ref[pl.ds(halo, th + halo)] = raw[pl.ds(off_first, th + halo)]

        @pl.when((ti > 0) & (ti < last))
        def _():
            tile_ref[pl.ds(0, rows)] = raw[pl.ds(off_mid, rows)]

        @pl.when(ti == last)
        def _():
            # valid image rows end at h - 1
            avail = h - (last * th - halo)  # rows till image end
            take = min(rows, avail)
            tile_ref[pl.ds(0, take)] = raw[pl.ds(off_last, take)]

        # top reflection (image rows -1..-halo): tile[halo-1-k] = tile[halo+1+k]
        @pl.when(ti == 0)
        def _():
            for k in range(halo):
                tile_ref[halo - 1 - k] = tile_ref[halo + 1 + k]

        # bottom reflection (image rows h..h+halo-1)
        @pl.when(ti == last)
        def _():
            base = last * th - halo  # image row of tile row 0
            for k in range(halo):
                r_out = h + k - base          # tile row of image row h + k
                r_src = h - 2 - k - base      # tile row of image row h-2-k
                if 0 <= r_out < band2 and 0 <= r_src < band2:
                    tile_ref[r_out] = tile_ref[r_src]

        results = compute(tile_ref[...], th, ti)
        for ref, res in zip(out_refs, results):
            ref[0] = res[:, :w].astype(ref.dtype)

    out_shapes = tuple(jax.ShapeDtypeStruct((n, ht, w), dt) for dt in out_dtypes)
    out_specs = tuple(
        pl.BlockSpec((1, th, w), lambda ni, ti: (ni, ti, 0), memory_space=pltpu.VMEM)
        for _ in out_dtypes
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, slab, wp), jnp.float32),
            pltpu.VMEM((band2, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(padded)
    outs = outs if isinstance(outs, (tuple, list)) else (outs,)
    return tuple(o[:, :h, :] for o in outs)


# ---------------------------------------------------------------- pipelines


def _sep_blur(tile: jax.Array, kx: np.ndarray, ky: np.ndarray, out_h: int, out_w: int) -> jax.Array:
    """Separable blur of a tile: returns (out_h, out_w) from a tile whose top
    left is aligned so that output (0,0) uses taps starting at tile (0,0)."""
    rx = len(kx) // 2
    ry = len(ky) // 2
    acc = None
    for j, kv in enumerate(kx):
        t = tile[:, j : j + out_w]
        acc = t * kv if acc is None else acc + t * kv
    out = None
    for i, kv in enumerate(ky):
        t = acc[i : i + out_h, :]
        out = t * kv if out is None else out + t * kv
    return out


def _sobel_pair(x: jax.Array, out_h: int, out_w: int) -> Tuple[jax.Array, jax.Array]:
    """3x3 Sobel gx, gy of ``x``, top-left aligned.

    The accumulation order mirrors the XLA oracle's tap-by-tap
    slice-accumulate (``filters._depthwise_conv_valid``) bit-for-bit, so
    exact ties in the downstream NMS comparisons break identically.
    """
    s = lambda i, j: x[i : i + out_h, j : j + out_w]  # noqa: E731
    gx = s(0, 0) * -1.0
    gx = gx + s(0, 2)
    gx = gx + s(1, 0) * -2.0
    gx = gx + s(1, 2) * 2.0
    gx = gx + s(2, 0) * -1.0
    gx = gx + s(2, 2)
    gy = s(0, 0) * -1.0
    gy = gy + s(0, 1) * -2.0
    gy = gy + s(0, 2) * -1.0
    gy = gy + s(2, 0)
    gy = gy + s(2, 1) * 2.0
    gy = gy + s(2, 2)
    return gx, gy


def _as_nhw(image: jax.Array) -> Tuple[jax.Array, Callable[[jax.Array], jax.Array]]:
    """HW / HWC / NHWC image -> (N*C, H, W) f32 maps + restore fn."""
    fimg, _ = cast_to_float(jnp.asarray(image))
    nhwc, restore4 = ensure_nhwc(fimg)
    n, h, w, c = nhwc.shape
    maps = jnp.transpose(nhwc, (0, 3, 1, 2)).reshape(n * c, h, w)

    def restore(x_nhw: jax.Array) -> jax.Array:
        out = x_nhw.reshape(n, c, h, w).transpose(0, 2, 3, 1)
        return restore4(out)

    return maps, restore


def fused_gaussian_blur(
    image: jax.Array,
    kernel_size: int = 5,
    sigma: float = 1.5,
    interpret: bool = False,
) -> jax.Array:
    """Separable Gaussian blur in one fused VMEM pass (float path of
    ``ops.gaussian_blur``; reflect padding)."""
    k1 = _gaussian_taps(kernel_size, sigma)
    halo = kernel_size // 2
    maps, restore = _as_nhw(image)

    def compute(tile: jax.Array, th_eff: int, ti=0):
        wv = tile.shape[1] - 2 * halo
        return (_sep_blur(tile, k1, k1, th_eff, wv),)

    (out,) = _halo_stencil_call(maps, halo, compute, [jnp.float32], interpret=interpret)
    return restore(out)


def fused_blur_sobel(
    image: jax.Array,
    kernel_size: int = 5,
    sigma: float = 1.5,
    interpret: bool = False,
) -> jax.Array:
    """Gaussian blur + Sobel magnitude in ONE fused VMEM pass.

    Matches ``sobel(gaussian_blur(img, k, sigma))`` from the XLA ops.
    Returns float32, same spatial rank as input.
    """
    k1 = _gaussian_taps(kernel_size, sigma)
    r = kernel_size // 2
    halo = r + 1
    maps, restore = _as_nhw(image)

    def compute(tile: jax.Array, th_eff: int, ti=0):
        wv = tile.shape[1] - 2 * halo
        # blur on the (th+2, wv+2) region needed by sobel
        b = _sep_blur(tile, k1, k1, th_eff + 2, wv + 2)
        gx, gy = _sobel_pair(b, th_eff, wv)
        return (jnp.sqrt(gx * gx + gy * gy),)

    (out,) = _halo_stencil_call(maps, halo, compute, [jnp.float32], interpret=interpret)
    return restore(out)


def hysteresis_sweeps(
    cls_f32: jax.Array,
    sweeps: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """``sweeps`` hysteresis dilation steps in ONE HBM pass.

    ``cls_f32``: (N, H, W) float32 class map (0 = suppressed, 1 = weak,
    2 = strong).  Each step grows strong into 8-connected weak
    (``edges.hysteresis`` semantics).  Tiling with ``halo = sweeps`` makes
    the k-step composition exact across tiles; the outer fixpoint loop
    re-invokes until unchanged (XLA runs one HBM round-trip *per step*;
    this runs one per ``sweeps``).

    Reflect padding at image borders is growth-neutral: a chain through
    mirrored cells maps 1:1 onto its real mirror-image chain (reflection
    preserves 8-adjacency), so no spurious growth is introduced.  Shifts
    are ``pltpu.roll`` (circular): wrapped values only ever corrupt the
    outermost halo ring per step, which is exactly the ring that goes
    stale anyway.
    """
    halo = sweeps

    def compute(tile: jax.Array, th_eff: int, ti=0):
        wv = tile.shape[1] - 2 * halo
        rows, cols = tile.shape
        t = tile

        def roll(x, sh, axis):
            return pltpu.roll(x, sh % (rows if axis == 0 else cols), axis)

        for _ in range(sweeps):
            v = jnp.maximum(t, jnp.maximum(roll(t, -1, 0), roll(t, 1, 0)))
            n = jnp.maximum(v, jnp.maximum(roll(v, -1, 1), roll(v, 1, 1)))
            t = jnp.where((t == 1.0) & (n == 2.0), 2.0, t)
        return (t[halo : halo + th_eff, halo : halo + wv],)

    (out,) = _halo_stencil_call(cls_f32, halo, compute, [jnp.float32],
                                interpret=interpret)
    return out


def canny_stage1(
    maps: jax.Array,
    low_threshold: float,
    high_threshold: float,
    kernel_size: int = 5,
    sigma: float = 1.4,
    interpret: bool = False,
    in_tile_hysteresis: bool = False,
) -> jax.Array:
    """Fused Canny front half: blur → sobel → magnitude → directional NMS →
    double threshold, one VMEM pass.  ``maps`` is (N, H, W) float32 grayscale.
    Returns a (N,H,W) uint8 class map: 2 = strong, 1 = weak, 0 = suppressed.

    ``in_tile_hysteresis``: additionally grow strong through weak to an
    in-tile fixpoint inside VMEM (the global hysteresis then converges in a
    few cross-tile sweeps; the combined fixpoint is identical).
    """
    if maps.ndim != 3:
        raise ValueError(f"canny_stage1 expects (N, H, W) maps, got {maps.shape}")
    k1 = _gaussian_taps(kernel_size, sigma)
    r = kernel_size // 2
    halo = r + 2  # +1 sobel, +1 NMS neighbourhood
    h_real, w_real = maps.shape[1], maps.shape[2]

    def compute(tile: jax.Array, th_eff: int, ti=0):
        wv = tile.shape[1] - 2 * halo
        # magnitude on a +1 halo ring for the NMS neighbour comparisons
        mh, mw = th_eff + 2, wv + 2
        b = _sep_blur(tile, k1, k1, mh + 2, mw + 2)
        gx, gy = _sobel_pair(b, mh, mw)
        mag = jnp.sqrt(gx * gx + gy * gy)

        c = lambda a, i, j: a[1 + i : 1 + i + th_eff, 1 + j : 1 + j + wv]  # noqa: E731
        m0 = c(mag, 0, 0)
        gx0 = c(gx, 0, 0)
        gy0 = c(gy, 0, 0)

        # ratio-comparison direction bins (identical to ops.edges.canny_nms)
        ax, ay = jnp.abs(gx0), jnp.abs(gy0)
        t_lo = jnp.float32(0.41421356)  # tan 22.5°
        t_hi = jnp.float32(2.4142137)  # tan 67.5°
        d0 = ay < t_lo * ax
        d90 = ay >= t_hi * ax
        d45 = (~d0) & (~d90) & ((gx0 * gy0) >= 0)

        nb1 = jnp.where(d0, c(mag, 0, 1), jnp.where(d45, c(mag, -1, 1), jnp.where(d90, c(mag, -1, 0), c(mag, -1, -1))))
        nb2 = jnp.where(d0, c(mag, 0, -1), jnp.where(d45, c(mag, 1, -1), jnp.where(d90, c(mag, 1, 0), c(mag, 1, 1))))
        keep = (m0 >= nb1) & (m0 > nb2)
        sup = jnp.where(keep, m0, 0.0)

        strong = sup >= high_threshold
        weak = sup >= low_threshold

        if in_tile_hysteresis:
            # resolve hysteresis chains *within* the tile while everything is
            # in VMEM: grow strong through weak to an in-tile fixpoint.  The
            # global fixpoint over tiles then only propagates cross-tile
            # chains (a handful of sweeps instead of hundreds).  Shifts are
            # pltpu.roll + boundary masks (Mosaic can't do misaligned slices).
            sh, sw = strong.shape
            rows = jax.lax.broadcasted_iota(jnp.int32, (sh, sw), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (sh, sw), 1)
            # confine growth to the REAL image region: the lane/tile filler
            # columns/rows contain artificial reflect->zero edges that must
            # not seed or carry chains into real pixels
            real = (cols < w_real) & (rows + ti * th_eff < h_real)
            strong = strong & real
            weak_i = (weak & real).astype(jnp.int32)

            def shift_max(acc, m, dy, dx):
                # pltpu.roll: circular, non-negative shifts, 32-bit data only
                r = pltpu.roll(pltpu.roll(m, dy % sh, 0), dx % sw, 1)
                valid = (rows - dy >= 0) & (rows - dy < sh) & (cols - dx >= 0) & (cols - dx < sw)
                return jnp.maximum(acc, r * valid.astype(jnp.int32))

            def dilate(m):
                out = m
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dy == 0 and dx == 0:
                            continue
                        out = shift_max(out, m, dy, dx)
                return out

            def body(state):
                grown, _ = state
                new = jnp.maximum(dilate(grown) * weak_i, grown)
                return new, jnp.any(new != grown)

            strong_i, _ = jax.lax.while_loop(
                lambda s: s[1], body, (strong.astype(jnp.int32), jnp.asarray(True))
            )
            strong = strong_i > 0

        cls = jnp.where(strong, 2, jnp.where(weak, 1, 0))
        return (cls.astype(jnp.uint8),)

    # the in-tile fixpoint holds several extra int32 tile temporaries; use a
    # shorter row band to stay inside VMEM
    tile_h = 64 if in_tile_hysteresis else None
    (out,) = _halo_stencil_call(maps, halo, compute, [jnp.uint8], tile_h=tile_h, interpret=interpret)
    return out


def fused_canny(
    image: jax.Array,
    low_threshold: float = 0.1,
    high_threshold: float = 0.2,
    kernel_size: int = 5,
    sigma: float = 1.4,
    max_hysteresis_iters: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Full Canny: fused Pallas front half + XLA hysteresis fixpoint.

    Semantics identical to :func:`cpu_vision_tpu.ops.canny` (the XLA oracle).
    """
    from ..color import rgb_to_grayscale
    from ..edges import hysteresis
    from ..._layout import num_channels

    img = jnp.asarray(image)
    fimg, _ = cast_to_float(img)
    if num_channels(fimg) > 1:
        fimg = rgb_to_grayscale(fimg)
    nhwc, restore4 = ensure_nhwc(fimg)
    maps = nhwc[..., 0]  # (N,H,W)

    # NOTE: in_tile_hysteresis=True is correct (bit-equal) but measured
    # SLOWER on v5e: the per-tile fixpoints serialise through the grid while
    # the global XLA dilation runs the whole (N,H,W) map in parallel per
    # sweep (noise 1080p: 13.2ms vs 6.2ms).  Kept as an option.
    # NOTE: a k-sweep Pallas fixpoint (``hysteresis_sweeps``) was measured
    # SLOWER here (4.8 vs 7.5 GPix/s at 1080p batch 8): one 4-sweep pass
    # costs ~1.5 ms device time — the pltpu.roll lane/sublane relayouts
    # dominate the light compare/select compute, while the XLA sweeps fuse
    # their shifted ORs into cheap elementwise passes.  Kept as an option
    # for direct use; the XLA dilation fixpoint below is the fast path.
    cls = canny_stage1(maps, low_threshold, high_threshold, kernel_size, sigma, interpret=interpret)
    strong = cls == 2
    weak = cls >= 1
    edges = hysteresis(strong, weak, max_hysteresis_iters)
    return restore4(edges[..., None].astype(jnp.float32))


def harris_response_fused(
    image: jax.Array,
    k: float = 0.04,
    window_size: int = 5,
    sigma: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Fused Harris response: sobel grads → structure tensor → gaussian
    window → det - k·tr² in one VMEM pass.  Matches
    :func:`cpu_vision_tpu.ops.harris_response` (gaussian window)."""
    from ..color import rgb_to_grayscale
    from ..._layout import num_channels

    img = jnp.asarray(image)
    fimg, _ = cast_to_float(img)
    if num_channels(fimg) > 1:
        fimg = rgb_to_grayscale(fimg)
    nhwc, restore4 = ensure_nhwc(fimg)
    maps = nhwc[..., 0]

    k1 = _gaussian_taps(window_size, sigma)
    r = window_size // 2
    halo = 1 + r  # sobel then window blur

    def compute(tile: jax.Array, th_eff: int, ti=0):
        wv = tile.shape[1] - 2 * halo
        gh, gw = th_eff + 2 * r, wv + 2 * r
        gx, gy = _sobel_pair(tile, gh, gw)
        sxx = _sep_blur(gx * gx, k1, k1, th_eff, wv)
        syy = _sep_blur(gy * gy, k1, k1, th_eff, wv)
        sxy = _sep_blur(gx * gy, k1, k1, th_eff, wv)
        det = sxx * syy - sxy * sxy
        tr = sxx + syy
        return (det - k * tr * tr,)

    (out,) = _halo_stencil_call(maps, halo, compute, [jnp.float32], interpret=interpret)
    return restore4(out[..., None])

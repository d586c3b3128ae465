"""Fused conv3x3 → bias → ReLU → maxpool2x2 kernel.

The north star's CNN pipeline ("im2col-conv → ReLU → pool ... become single
fused kernels", BASELINE.json): one VMEM pass accumulates the 9 per-tap
(TH·W, Cin)x(Cin, Cout) matmuls on the MXU, applies bias+ReLU on the VPU,
and max-pools 2x2 — the conv activations never round-trip to HBM.

Status on current Mosaic: the kernel is validated in interpret mode, but
compiled TPU execution rejects few-channel NHWC inputs (manual DMA requires
the lane dim — here Cin=3..32 — to be 128-aligned: "Slice shape along
dimension 3 must be aligned to tiling (128)").  Measured against it, XLA's
*automatic* fusion of conv+relu+pool is already a single HBM pass at
36.8k img/s (224², batch 256, f32) — so :func:`conv3x3_relu_pool` uses the
XLA path on TPU and keeps this kernel as the explicit-fusion reference.
The XLA oracle is ``ops.cnn.cnn_forward``'s conv→relu→pool stage.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_conv3x3_relu_pool", "conv3x3_relu_pool"]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def fused_conv3x3_relu_pool(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    tile_h: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """x (N,H,W,Cin) f32 → SAME conv3x3 + bias + ReLU + maxpool2 → (N,H/2,W/2,Cout).

    H and W must be even (pad first otherwise).
    """
    n, h, wdt, cin = x.shape
    kh, kw, wcin, cout = w.shape
    if (kh, kw) != (3, 3) or wcin != cin:
        raise ValueError("expects 3x3 kernels matching the input channels")
    if h % 2 or wdt % 2:
        raise ValueError("H and W must be even for the fused 2x2 pool")

    th = tile_h or min(_round_up(h, 8), 64)
    if th % 2:
        th += 1
    ht = _round_up(h, th)
    # zero 'same' padding + rounding filler
    padded = jnp.pad(x, ((0, 0), (1, 1 + (ht - h)), (1, 1), (0, 0)))
    wp = wdt + 2

    wmat = w.reshape(9 * cin, cout)
    grid = (n, ht // th)
    n_tiles = ht // th

    def kernel(in_hbm, w_ref, b_ref, out_ref, scratch, sem):
        ni = pl.program_id(0)
        ti = pl.program_id(1)
        copy = pltpu.make_async_copy(
            in_hbm.at[ni, pl.ds(ti * th, th + 2), :, :], scratch, sem
        )
        copy.start()
        copy.wait()
        t = scratch[:]
        # per-tap matmul accumulation (Mosaic can't concat misaligned
        # slices; 9 accumulated (TH·W, Cin)x(Cin, Cout) dots fuse fine)
        acts = None
        for dy in range(3):
            for dx in range(3):
                sl = t[dy : dy + th, dx : dx + wdt, :].reshape(th * wdt, cin)
                tap_w = w_ref[(dy * 3 + dx) * cin : (dy * 3 + dx + 1) * cin, :]
                term = jnp.dot(sl, tap_w, preferred_element_type=jnp.float32)
                acts = term if acts is None else acts + term
        acts = jnp.maximum(acts + b_ref[:], 0.0)
        acts = acts.reshape(th // 2, 2, wdt // 2, 2, cout)
        out_ref[0] = jnp.max(acts, axis=(1, 3))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n, ht // 2, wdt // 2, cout), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th // 2, wdt // 2, cout), lambda ni, ti: (ni, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, cin), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded, wmat, b)
    return out[:, : h // 2, :, :]


def conv3x3_relu_pool(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    backend: Optional[str] = None,
) -> jax.Array:
    """Fused conv3x3(SAME) + bias + ReLU + maxpool2x2.

    ``backend``: "pallas" (explicit fusion; interpret-validated, see module
    docstring), "xla" (XLA's automatic fusion — the production TPU path), or
    None for auto.
    """
    if backend is None:
        backend = "xla"  # XLA's auto-fusion wins on current Mosaic (see module docstring)
    if backend == "pallas":
        return fused_conv3x3_relu_pool(x, w, b, interpret=jax.default_backend() != "tpu")
    from jax import lax

    out = lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    out = jax.nn.relu(out)
    return lax.reduce_window(out, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

"""Blocked greedy-NMS Pallas kernel: the whole fixpoint lives in VMEM.

The XLA formulation (``ops/boxes.py:nms``) materialises the (N, N) IoU and
suppression matrices in HBM and re-reads them every Jacobi iteration — for
the detection heads (N = 4096 candidates x 8 images) that is gigabytes of
HBM traffic per step (traced at ~10% of the FasterRCNN-640 step).  Here
boxes stay in VMEM (N x 4 f32 = 64 KB at N=4096) and suppression is
recomputed on the fly in (BLK, N) tiles — FLOPs are ~free on the VPU, HBM
traffic drops to the O(N) inputs/outputs.

Algorithm (exact greedy semantics, reference
``csrc/ops/cpu/nms_kernel.cpp:48-75``): boxes arrive sorted by descending
score; process in sequential blocks of BLK.  A block first receives
suppression from all KEPT boxes in earlier blocks (one (BLK, N) IoU tile
against the running keep mask), then resolves its in-block chains with a
Jacobi fixpoint on its (BLK, BLK) IoU tile (exact after <= BLK sweeps;
strictly-lower-triangular dependency).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["nms_sorted_pallas"]


def _iou_tile(qx1, qy1, qx2, qy2, x1, y1, x2, y2):
    """IoU of a (B, 1)-shaped query block vs (1, N)-shaped all-boxes."""
    lt_x = jnp.maximum(qx1, x1)
    lt_y = jnp.maximum(qy1, y1)
    rb_x = jnp.minimum(qx2, x2)
    rb_y = jnp.minimum(qy2, y2)
    inter = jnp.maximum(rb_x - lt_x, 0.0) * jnp.maximum(rb_y - lt_y, 0.0)
    area_q = (qx2 - qx1) * (qy2 - qy1)
    area_a = (x2 - x1) * (y2 - y1)
    return inter / jnp.maximum(area_q + area_a - inter, 1e-12)


def _nms_kernel(xs_ref, keep_ref, *, n, blk, thr, sweeps):
    # xs_ref: (1, 8, N) — rows 0-3: x1,y1,x2,y2; rows 4-7 are the same
    # coordinates TRANSPOSE-free column source (unused lanes); we slice the
    # row layout and build column layouts with an in-kernel transpose.
    x1 = xs_ref[0, 0:1, :]
    y1 = xs_ref[0, 1:2, :]
    x2 = xs_ref[0, 2:3, :]
    y2 = xs_ref[0, 3:4, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    row_i = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
    col_j = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
    keep = jnp.ones((1, n), jnp.float32)
    # Unrolled over blocks: Mosaic has no traced dynamic_slice, and static
    # offsets let every slice stay tile-aligned (n // blk <= 32 blocks).
    for bi in range(n // blk):
        s = bi * blk
        qx1 = x1[:, s:s + blk].T  # (blk, 1)
        qy1 = y1[:, s:s + blk].T
        qx2 = x2[:, s:s + blk].T
        qy2 = y2[:, s:s + blk].T
        iou = _iou_tile(qx1, qy1, qx2, qy2, x1, y1, x2, y2)  # (blk, N)
        sup = (iou > thr).astype(jnp.float32)
        # suppression from KEPT earlier boxes (global index < s)
        earlier = (col < s).astype(jnp.float32) * keep        # (1, N)
        ext = jnp.max(sup * earlier, axis=1, keepdims=True)   # (blk, 1)
        # in-block tile: strictly-lower-triangular dependency j < i
        sup_in = jnp.where(col_j < row_i, sup[:, s:s + blk], 0.0)  # (blk, blk)
        kb0 = 1.0 - ext.reshape(1, blk)                       # (1, blk)

        def sweep(kb, sup_in=sup_in, kb0=kb0):
            # kb (1, blk); box i survives iff no kept j<i suppresses it:
            # dead[i] = max_j sup_in[i, j] * kb[j]  (j rides the columns)
            dead = jnp.max(sup_in * kb, axis=1, keepdims=True)  # (blk, 1)
            return jnp.minimum(kb0, 1.0 - dead.reshape(1, blk))

        # Fixed-depth fixpoint (exact: acyclic j<i dependency, <= blk
        # sweeps).  A convergence-checked lax.while_loop would cut typical
        # sweep counts ~30x, but Mosaic ICEs on it (internal error, jax
        # 2026-08 — see BENCH_NOTES NMS-kernel entry); with the fixed depth
        # the kernel measured 93 ms vs XLA's 6.6 ms at N=4096 x 8, so the
        # kernel ships OPT-IN (CVT_NMS_PALLAS=1) as a recorded negative.
        kb = jax.lax.fori_loop(
            0, sweeps, lambda _, kb, sweep=sweep: sweep(kb), kb0)
        kbp = jnp.pad(kb, ((0, 0), (s, n - s - blk)))
        keep = jnp.where((col >= s) & (col < s + blk), kbp, keep)
    keep_ref[...] = keep.reshape(keep_ref.shape)


@partial(jax.jit, static_argnames=("iou_threshold", "blk", "interpret"))
def nms_sorted_pallas(boxes, iou_threshold: float, blk: int = 128,
                      interpret: bool = False):
    """Keep mask (..., N) bool for boxes (..., N, 4) PRE-SORTED by
    descending score.  Batched over leading dims (independent problems).
    N is padded to a block multiple internally; padded entries come back
    ``True`` (zero-area pad boxes never suppress — mask scores outside)."""
    lead = boxes.shape[:-2]
    n0 = boxes.shape[-2]
    p = 1
    for d in lead:
        p *= d
    b3 = boxes.reshape(p, n0, 4)
    n = -(-n0 // blk) * blk
    if n != n0:
        b3 = jnp.pad(b3, ((0, 0), (0, n - n0), (0, 0)))
    # (P, 8, N): coordinate rows (4 used + 4 pad to the sublane tile)
    xs = jnp.transpose(b3, (0, 2, 1))                 # (P, 4, N)
    xs = jnp.pad(xs, ((0, 0), (0, 4), (0, 0))).astype(jnp.float32)
    keep = pl.pallas_call(
        partial(_nms_kernel, n=n, blk=blk, thr=float(iou_threshold),
                sweeps=blk),
        grid=(p,),
        in_specs=[pl.BlockSpec((1, 8, n), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((p, 1, n), jnp.float32),
        interpret=interpret,
    )(xs)
    return (keep[:, 0, :n0] > 0.5).reshape(*lead, n0)

"""Fused Swin window-attention Pallas kernel.

``x + Proj(WindowMSA(LN(x)))`` over a batch of windows — the whole
attention sub-block of a Swin block (reference
``torchvision/models/swin_transformer.py:shifted_window_attention``) as
one VMEM-resident kernel.

Why: the einsum formulation of window attention is layout hell on TPU.
With S=49-token windows XLA materialises full-tensor layout copies of the
QKV product (token dim forced into lanes), runs the 49x49 score matmuls
through batch-in-lanes emitters, and round-trips f32 scores through HBM
for the softmax — traced at ~60% of swin_t b256 device time (qkv-reshape
copies 23%, QK/AV fusions + separate reduce_max/reduce_sum softmax the
rest).  Here each grid program holds the QKV/out weights, the relative
position bias and the shift mask in VMEM, walks G windows with static
slicing (no transpose exists in any memory space), scores stay in VMEM
f32, softmax on the VPU, matmuls on the MXU.

Supports both attention flavours:
  * v1 — pre-LN outside residual, scaled dot product, learned
    relative-position-bias table (gathered to (heads, S, S) outside).
  * v2 — cosine attention with per-head learned logit scale, continuous
    position bias (computed outside), post-norm on the branch output.

Backward: custom_vjp recomputing from x with plain XLA einsums
(flash-style rematerialisation), like transformer_block.attention_block.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["window_attention_block"]


def _ln_f32(x, g, b, eps, count=0):
    if not count:
        m = jnp.mean(x, axis=-1, keepdims=True)
        c = x - m
        v = jnp.mean(c * c, axis=-1, keepdims=True)
        return c * jax.lax.rsqrt(v + eps) * g + b
    # masked stats over the first `count` REAL channels of a zero-padded
    # lane layout (channel-padded swin variant): pad channels hold zeros,
    # so sums over all channels equal sums over real ones, and
    # sum((x-m)^2 * real_mask) == sum(x^2) - count*m^2 exactly
    m = jnp.sum(x, axis=-1, keepdims=True) / count
    d = x - m
    v = jnp.sum(x * x, axis=-1, keepdims=True) / count - m * m
    return d * jax.lax.rsqrt(v + eps) * g + b


def _softmax_f32(s):
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
            bias_ref, mask_ref, ls_ref, o_ref, *, heads: int, scale: float,
            eps: float, dtype, v2: bool, masked: bool, ln_count: int = 0):
    # S is padded to a sublane multiple (8) by the caller, so every
    # per-window row slice below is tile-aligned and the LN/QKV/proj
    # matmuls batch over ALL G windows at once: (G*S, C) rows fill the
    # MXU's 128-row tiles, where the old per-window (49, C) matmuls left
    # the array >60% idle.  Only the (S, S) score/AV matmuls stay
    # per-window/per-head — a minor FLOP share (<=15% past stage 1).
    G, S, C = x_ref.shape
    hd = C // heads
    g32 = g_ref[...].astype(jnp.float32)
    b32 = b_ref[...].astype(jnp.float32)
    mask_p = mask_ref.shape[0] if masked else 1
    x32 = x_ref[...].astype(jnp.float32).reshape(G * S, C)
    h = x32.astype(dtype) if v2 else _ln_f32(x32, g32, b32, eps, ln_count).astype(dtype)
    qkv_all = jax.lax.dot_general(h, wqkv_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    qkv_all = qkv_all + bqkv_ref[...].astype(jnp.float32)        # (G*S, 3C)
    outs_w = []
    for w in range(G):
        qkv = qkv_all[w * S:(w + 1) * S]
        outs = []
        for i in range(heads):
            q = qkv[:, i * hd:(i + 1) * hd]
            k = qkv[:, C + i * hd:C + (i + 1) * hd]
            v = qkv[:, 2 * C + i * hd:2 * C + (i + 1) * hd].astype(dtype)
            if v2:
                q = q * jax.lax.rsqrt(
                    jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-12))
                k = k * jax.lax.rsqrt(
                    jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-12))
                s = jax.lax.dot_general(
                    q.astype(dtype), k.astype(dtype), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = s * jnp.exp(jnp.minimum(ls_ref[0, i], np.log(100.0)))
            else:
                s = jax.lax.dot_general(
                    (q * scale).astype(dtype), k.astype(dtype),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            s = s + bias_ref[i].astype(jnp.float32)
            if masked:
                s = s + mask_ref[w % mask_p].astype(jnp.float32)
            p = _softmax_f32(s).astype(dtype)
            outs.append(jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        outs_w.append(jnp.concatenate(outs, axis=-1).astype(dtype))  # (S, C)
    o_all = jnp.concatenate(outs_w, axis=0)                      # (G*S, C)
    o = jax.lax.dot_general(o_all, wo_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + bo_ref[...].astype(jnp.float32)
    if v2:
        o = _ln_f32(o, g32, b32, eps, ln_count)
    o_ref[...] = (x32 + o).astype(o_ref.dtype).reshape(G, S, C)


def _kernel_packed(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                   biasp_ref, maskp_ref, m1_ref, m2_ref, lsp_ref, o_ref, *,
                   heads: int, scale: float, eps: float, dtype, v2: bool,
                   masked: bool, ln_count: int = 0):
    """Head-PACKED window attention for small head counts (swin stages 1-2).

    The per-(window, head) loop of ``_kernel`` issues ~6 tiny matmuls and
    ~6 cross-lane reductions per window; on v5e that granularity measured
    2.4% of MXU peak at stage-1 shapes (15.4 ms vs a 0.38 ms FLOP floor,
    G-sweep flat — per-op overhead, not per-program).  Here every head is
    computed in ONE matmul chain per window via a constant block
    channel-mask M1 (heads*S, C), M1[h*S+j, c] = [c in head h]:

      scores:  Q (S, C) x (tile_rows(K, heads) * M1)^T      -> (S, heads*S)
      softmax: global-row-max subtract, exp; denominator D = E @ M1
               gives the PER-HEAD key-sum broadcast to that head's
               channels (one matmul instead of per-head lane reductions)
      AV:      E @ (tile_rows(V, heads) * M1)               -> (S, C)
               cross-head terms vanish because M1 zeroes them
      out:     AV / D

    All contractions are C- or heads*S-wide (96-336 lanes at stages 1-2)
    instead of hd=32, trading ~heads-x redundant score FLOPs (minor at
    these stages) for full-width MXU ops.

    v2 (cosine attention): per-head q/k norms come from a second constant
    M2 (C, C) = block-diag ones — ``(q*q) @ M2`` broadcasts each head's
    squared norm to its own channels (again a matmul instead of per-head
    lane reductions); the per-head logit scale rides the packed key axis
    as a (1, HS) vector; post-norm LN applies to the branch output.
    """
    G, S, C = x_ref.shape
    HS = heads * S
    g32 = g_ref[...].astype(jnp.float32)
    b32 = b_ref[...].astype(jnp.float32)
    m1 = m1_ref[...].astype(dtype)                           # (HS, C)
    x32 = x_ref[...].astype(jnp.float32).reshape(G * S, C)
    if v2:
        h = x32.astype(dtype)
    else:
        h = _ln_f32(x32, g32, b32, eps, ln_count).astype(dtype)
    qkv_all = jax.lax.dot_general(h, wqkv_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    qkv_all = qkv_all + bqkv_ref[...].astype(jnp.float32)    # (G*S, 3C)
    if v2:
        # cosine attention: normalise q and k per head before packing
        m2 = m2_ref[...].astype(dtype)                       # (C, C)
        qf = qkv_all[:, :C]
        kf = qkv_all[:, C:2 * C]
        q2 = jax.lax.dot_general((qf * qf).astype(dtype), m2,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        k2 = jax.lax.dot_general((kf * kf).astype(dtype), m2,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        qn = qf * jax.lax.rsqrt(jnp.maximum(q2, 1e-12))
        kn = kf * jax.lax.rsqrt(jnp.maximum(k2, 1e-12))
        qkv_all = jnp.concatenate([qn, kn, qkv_all[:, 2 * C:]], axis=1)
    qkv_all = qkv_all.reshape(G, S, 3 * C)
    q_scale = 1.0 if v2 else scale
    q = (qkv_all[..., :C] * q_scale).astype(dtype)
    k = qkv_all[..., C:2 * C].astype(dtype)
    v = qkv_all[..., 2 * C:].astype(dtype)
    k_aug = jnp.concatenate([k] * heads, axis=1) * m1[None]  # (G, HS, C)
    s_full = jax.lax.dot_general(q, k_aug, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    if v2:
        s_full = s_full * lsp_ref[...][None]                 # (1, HS) bcast
    s_full = s_full + biasp_ref[...][None]                   # (G, S, HS)
    if masked:
        s_full = s_full + maskp_ref[...]                     # (G, S, HS)
    # Per-HEAD row max (not global across the packed axis): with a global
    # max, a head whose logits sit ~88+ below another head's max underflows
    # exp() to all-zeros and the denominator clamp silently outputs ~0 for
    # that head (reachable in the v2 cosine path where exp(logit_scale)
    # spreads per-head logits by up to ~±100).  heads<=6 here, so a short
    # unrolled mask-select chain keeps the reduction full-width on the VPU.
    col_head = jax.lax.broadcasted_iota(jnp.int32, (1, 1, HS), 2) // S
    row_max = jnp.zeros_like(s_full)
    for h_i in range(heads):
        sel = col_head == h_i
        m_h = jnp.max(jnp.where(sel, s_full, -1e30), axis=-1, keepdims=True)
        row_max = row_max + jnp.where(sel, m_h, 0.0)
    e = jnp.exp(s_full - row_max).astype(dtype)
    v_aug = jnp.concatenate([v] * heads, axis=1) * m1[None]  # (G, HS, C)
    av = jax.lax.dot_general(e, v_aug, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    d = jax.lax.dot_general(e.reshape(G * S, HS), m1,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_all = (av.reshape(G * S, C) / jnp.maximum(d, 1e-30)).astype(dtype)
    o = jax.lax.dot_general(o_all, wo_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + bo_ref[...].astype(jnp.float32)
    if v2:
        o = _ln_f32(o, g32, b32, eps, ln_count)
    o_ref[...] = (x32 + o).astype(o_ref.dtype).reshape(G, S, C)


def pick_group(nw_total: int, nw_img: int, heads: int, masked: bool) -> int:
    """Largest G <= 32 dividing the window count with G*heads bounded (the
    kernel unrolls windows x heads), and compatible with the mask period
    (G | nw_img, or nw_img | G so in-kernel ``w % nw_img`` is exact)."""
    for g in range(min(32, max(96 // heads, 1)), 0, -1):
        if nw_total % g:
            continue
        if masked and not (nw_img % g == 0 or g % nw_img == 0):
            continue
        return g
    return 1


def _fwd_pallas(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, rel_bias, mask,
                logit_scale, heads, scale, eps, v2, nw_img, interpret,
                ln_count: int = 0):
    nw, s0, c = x.shape
    masked = mask is not None
    # pad the token dim to a sublane multiple so the kernel's per-window
    # row slices are tile-aligned and the group-batched QKV/proj matmuls
    # need no relayout; padded KEYS get -1e9 in the bias (softmax-killed),
    # padded query rows are computed and discarded below
    s = -(-s0 // 8) * 8
    if s != s0:
        x = jnp.pad(x, ((0, 0), (0, s - s0), (0, 0)))
        rel_bias = jnp.pad(rel_bias, ((0, 0), (0, s - s0), (0, 0)))
        rel_bias = jnp.pad(rel_bias, ((0, 0), (0, 0), (0, s - s0)),
                           constant_values=-1e9)
        if masked:
            mask = jnp.pad(mask, ((0, 0), (0, s - s0), (0, s - s0)))
    g = pick_group(nw, nw_img, heads, masked)
    # head-packed path: one matmul chain per window across all heads —
    # see _kernel_packed.  The heads*S bound keeps the redundant-score-
    # FLOP factor (= heads) profitable: on-chip A/B (swin_t b256) —
    # cap 512 (stages 1-2 packed) 3428 img/s, cap 700 (+stage 3) 3688,
    # cap 1400 (+stage 4) 3662 (stage-4 pair regressed 5.7 -> 6.9 ms),
    # so 700 is the default.
    hs_cap = int(os.environ.get("CVT_SWIN_PACKED_HS", "700"))
    if heads * s <= hs_cap and c % heads == 0:
        # VMEM cap: k_aug/v_aug are (g, heads*s, c) each
        it = jnp.dtype(w_qkv.dtype).itemsize
        while g > 1 and 2 * g * heads * s * c * it > 5_000_000:
            gp = g - 1
            while gp > 1 and (nw % gp or (masked and not
                              (nw_img % gp == 0 or gp % nw_img == 0))):
                gp -= 1
            g = gp
        return _fwd_pallas_packed(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o,
                                  rel_bias, mask, logit_scale, heads, scale,
                                  eps, v2, nw_img, g, s0, s, interpret,
                                  ln_count)
    if masked:
        p = min(g, nw_img)
        mask_spec = pl.BlockSpec(
            (p, s, s), lambda i, p=p, n=nw_img, g=g: ((i * g % n) // p, 0, 0))
        mask_in = mask
    else:
        mask_in = jnp.zeros((1, s, s), jnp.float32)
        mask_spec = pl.BlockSpec((1, s, s), lambda i: (0, 0, 0))
    if logit_scale is None:
        logit_scale = jnp.zeros((heads,), jnp.float32)
    out = pl.pallas_call(
        partial(_kernel, ln_count=ln_count, heads=heads, scale=scale, eps=eps, dtype=w_qkv.dtype,
                v2=v2, masked=masked),
        grid=(nw // g,),
        in_specs=[
            pl.BlockSpec((g, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((heads, s, s), lambda i: (0, 0, 0)),
            mask_spec,
            pl.BlockSpec((1, heads), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nw, s, c), x.dtype),
        interpret=interpret,
    )(x, ln_g.reshape(1, c), ln_b.reshape(1, c), w_qkv,
      b_qkv.reshape(1, 3 * c), w_o, b_o.reshape(1, c),
      rel_bias.astype(jnp.float32), mask_in.astype(jnp.float32),
      logit_scale.reshape(1, heads).astype(jnp.float32))
    return out[:, :s0, :] if s != s0 else out


def _fwd_pallas_packed(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, rel_bias, mask,
                       logit_scale, heads, scale, eps, v2, nw_img, g, s0, s,
                       interpret, ln_count: int = 0):
    nw, _, c = x.shape
    masked = mask is not None
    hs = heads * s
    hd = c // heads
    # M1[h*S+j, ch] = 1 iff ch belongs to head h
    m1 = np.zeros((hs, c), np.float32)
    for h in range(heads):
        m1[h * s:(h + 1) * s, h * hd:(h + 1) * hd] = 1.0
    # M2: block-diag ones (C, C) — broadcasts per-head squared norms (v2)
    m2 = np.zeros((c, c), np.float32)
    for h in range(heads):
        m2[h * hd:(h + 1) * hd, h * hd:(h + 1) * hd] = 1.0
    if v2 and logit_scale is not None:
        lsv = jnp.exp(jnp.minimum(logit_scale.reshape(heads),
                                  np.log(100.0))).astype(jnp.float32)
        ls_packed = jnp.repeat(lsv, s).reshape(1, hs)
    else:
        ls_packed = jnp.ones((1, hs), jnp.float32)
    # (heads, S, S) -> (S, heads*S): bias_packed[i, h*S+j] = bias[h, i, j]
    bias_packed = rel_bias.astype(jnp.float32).transpose(1, 0, 2).reshape(s, hs)
    if masked:
        # (nw_img, S, heads*S); the kernel adds a (g, S, heads*S) block
        # aligned with its windows, so tile up when g spans whole images
        mask_packed = jnp.tile(mask.astype(jnp.float32), (1, 1, heads))
        if g > nw_img:  # nw_img | g (pick_group invariant)
            mask_packed = jnp.tile(mask_packed, (g // nw_img, 1, 1))
            mask_spec = pl.BlockSpec((g, s, hs), lambda i: (0, 0, 0))
        else:           # g | nw_img
            mask_spec = pl.BlockSpec(
                (g, s, hs), lambda i, n=nw_img, g=g: ((i * g % n) // g, 0, 0))
    else:
        mask_packed = jnp.zeros((1, s, hs), jnp.float32)
        mask_spec = pl.BlockSpec((1, s, hs), lambda i: (0, 0, 0))
    out = pl.pallas_call(
        partial(_kernel_packed, ln_count=ln_count, heads=heads, scale=scale, eps=eps,
                dtype=w_qkv.dtype, v2=v2, masked=masked),
        grid=(nw // g,),
        in_specs=[
            pl.BlockSpec((g, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((s, hs), lambda i: (0, 0)),
            mask_spec,
            pl.BlockSpec((hs, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, hs), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g, s, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nw, s, c), x.dtype),
        interpret=interpret,
    )(x, ln_g.reshape(1, c), ln_b.reshape(1, c), w_qkv,
      b_qkv.reshape(1, 3 * c), w_o, b_o.reshape(1, c), bias_packed,
      mask_packed, jnp.asarray(m1), jnp.asarray(m2), ls_packed)
    return out[:, :s0, :] if s != s0 else out


def _ref_math(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, rel_bias, mask,
              logit_scale, heads, scale, eps, v2, nw_img, dtype,
              ln_count: int = 0):
    """Same math in plain XLA ops (backward recompute + test oracle)."""
    nw, s, c = x.shape
    hd = c // heads
    x32 = x.astype(jnp.float32)
    g32, bb32 = ln_g.astype(jnp.float32), ln_b.astype(jnp.float32)
    h = x32.astype(dtype) if v2 else _ln_f32(x32, g32, bb32, eps, ln_count).astype(dtype)
    qkv = (jnp.dot(h, w_qkv, preferred_element_type=jnp.float32)
           + b_qkv.astype(jnp.float32))
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    q = q.reshape(nw, s, heads, hd)
    k = k.reshape(nw, s, heads, hd)
    v = v.reshape(nw, s, heads, hd).astype(dtype)
    if v2:
        q = q * jax.lax.rsqrt(jnp.maximum(jnp.sum(q * q, -1, keepdims=True), 1e-12))
        k = k * jax.lax.rsqrt(jnp.maximum(jnp.sum(k * k, -1, keepdims=True), 1e-12))
        sc = jnp.einsum("bnhd,bmhd->bhnm", q.astype(dtype), k.astype(dtype),
                        preferred_element_type=jnp.float32)
        sc = sc * jnp.exp(jnp.minimum(logit_scale, np.log(100.0))).reshape(1, heads, 1, 1)
    else:
        sc = jnp.einsum("bnhd,bmhd->bhnm", (q * scale).astype(dtype),
                        k.astype(dtype), preferred_element_type=jnp.float32)
    sc = sc + rel_bias.astype(jnp.float32)[None]
    if mask is not None:
        m = mask.astype(jnp.float32)
        sc = sc.reshape(nw // nw_img, nw_img, heads, s, s) + m[None, :, None]
        sc = sc.reshape(nw, heads, s, s)
    p = _softmax_f32(sc).astype(dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v,
                   preferred_element_type=jnp.float32)
    o = o.reshape(nw, s, c).astype(dtype)
    o = jnp.dot(o, w_o, preferred_element_type=jnp.float32) + b_o.astype(jnp.float32)
    if v2:
        o = _ln_f32(o, g32, bb32, eps, ln_count)
    return (x32 + o).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15, 16))
def window_attention_block(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, rel_bias,
                           mask, logit_scale, heads: int, scale: float,
                           eps: float, v2: bool, nw_img: int,
                           interpret: bool = False, ln_count: int = 0):
    """Fused Swin attention sub-block over ``x`` (num_windows, S, C).

    ``rel_bias`` is the (heads, S, S) position bias (v1: gathered table;
    v2: 16*sigmoid(CPB MLP)); ``mask`` is the (nW_img, S, S) shift mask or
    None; ``logit_scale`` is the v2 per-head (heads,) log scale or None;
    ``nw_img`` = windows per image (the mask period in the window batch).
    """
    return _fwd_pallas(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, rel_bias,
                       mask, logit_scale, heads, scale, eps, v2, nw_img,
                       interpret, ln_count)


def _fwd(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, rel_bias, mask, logit_scale,
         heads, scale, eps, v2, nw_img, interpret, ln_count=0):
    out = _fwd_pallas(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, rel_bias, mask,
                      logit_scale, heads, scale, eps, v2, nw_img, interpret,
                      ln_count)
    return out, (x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, rel_bias, mask,
                 logit_scale)


def _bwd(heads, scale, eps, v2, nw_img, interpret, ln_count, res, g):
    x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, rel_bias, mask, logit_scale = res
    has_mask = mask is not None
    has_ls = logit_scale is not None
    diff = (x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, rel_bias)
    if has_ls:
        diff = diff + (logit_scale,)

    def loss(*a):
        xx, lg, lb, wq, bq, wo, bo, rb = a[:8]
        ls = a[8] if has_ls else None
        out = _ref_math(xx, lg, lb, wq, bq, wo, bo, rb, mask, ls, heads,
                        scale, eps, v2, nw_img, w_qkv.dtype, ln_count)
        return jnp.sum(out.astype(jnp.float32) * g.astype(jnp.float32))

    grads = jax.grad(loss, argnums=tuple(range(len(diff))))(*diff)
    gx, glg, glb, gwq, gbq, gwo, gbo, grb = grads[:8]
    gls = grads[8] if has_ls else None
    gmask = jnp.zeros_like(mask) if has_mask else None
    return (gx, glg, glb, gwq, gbq, gwo, gbo, grb, gmask, gls)


window_attention_block.defvjp(_fwd, _bwd)

"""Fused transformer-MLP Pallas kernel: LN -> Dense -> gelu -> Dense -> +x.

Why: at ViT-B b256 XLA builds one loop fusion per encoder layer holding
Dense_0 + gelu + Dense_1 + the next LayerNorm's reduce, and its iteration
over the output feature dim recomputes the Dense_0 matmul — the fusion
runs at ~88% MXU duty cycle but does ~1.5x the necessary FLOPs (measured
with tools/trace_report.py: 12 such fusions = 43% of ViT-B/16 inference).
Breaking the fusion with an optimization_barrier trades the recompute for
a (tokens, mlp_dim) HBM round trip and measures slower still.

This kernel does the whole pre-LN MLP sub-block in one pass: both weight
matrices stay VMEM-resident across the grid (ViT-B: 2 x 768x3072 bf16 =
9.4 MB), token tiles stream through, and the LayerNorm statistics, gelu
and residual add ride the VPU between the two MXU contractions.  HBM
traffic per layer is exactly x in + out out — no intermediate, no
recompute.

Matmul shapes per tile are (Tm,768)@(768,3072) and (Tm,3072)@(3072,768):
every dimension a multiple of 128 — perfect MXU tiling.

Backward: custom_vjp recomputing from x with plain XLA einsums
(flash-style rematerialisation; nothing saved but x and the params).

Numerics match the unfused flax path: LN statistics and gelu in f32,
matmul accumulation f32, weights applied in the compute dtype.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# A/B switch for the in-kernel multi-head formulation (see _mha_core)
_BATCHED_HEADS = os.environ.get("CVT_ATTN_BATCHED", "0") == "1"

__all__ = ["mlp_block", "attention_block", "cn_mlp_block"]


def _erf_f32(x):
    """Abramowitz-Stegun 7.1.26 rational approximation (|err| < 1.5e-7);
    Mosaic has no erf lowering."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_f32(h):
    # exact-erf gelu, matching nn.gelu(approximate=False) to ~1e-7
    return 0.5 * h * (1.0 + _erf_f32(h * (1.0 / jnp.sqrt(2.0))))


def _ln_f32(x, g, b, eps, count=0):
    if not count:
        m = jnp.mean(x, axis=-1, keepdims=True)
        c = x - m
        v = jnp.mean(c * c, axis=-1, keepdims=True)
        return c * jax.lax.rsqrt(v + eps) * g + b
    # masked stats over the first `count` real channels of a zero-padded
    # lane layout (channel-padded swin variant; see swin_attention._ln_f32)
    m = jnp.sum(x, axis=-1, keepdims=True) / count
    d = x - m
    v = jnp.sum(x * x, axis=-1, keepdims=True) / count - m * m
    return d * jax.lax.rsqrt(v + eps) * g + b


def _kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
            acc_ref, *, eps: float, dtype, post_norm: bool, ln_count: int = 0):
    # grid is (m_tiles, dh_tiles) with the hidden dim innermost: each j
    # computes a partial down-projection into the f32 VMEM accumulator, so
    # models whose full (d, dh) weights exceed VMEM (ViT-L/H) stream the
    # hidden dim in blocks while x/out ride HBM exactly once.
    # post_norm (Swin v2): LN moves from the input to the branch output.
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    x32 = x_ref[...].astype(jnp.float32)
    g32 = g_ref[...].astype(jnp.float32)
    b32 = b_ref[...].astype(jnp.float32)
    if post_norm:
        h = x32.astype(dtype)
    else:
        h = _ln_f32(x32, g32, b32, eps, ln_count).astype(dtype)
    hj = jax.lax.dot_general(h, w1_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    hj = _gelu_f32(hj + b1_ref[...].astype(jnp.float32)).astype(dtype)
    pj = jax.lax.dot_general(hj, w2_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = pj + b2_ref[...].astype(jnp.float32)

    @pl.when(j > 0)
    def _():
        acc_ref[...] = acc_ref[...] + pj

    @pl.when(j == nj - 1)
    def _():
        branch = acc_ref[...]
        if post_norm:
            branch = _ln_f32(branch, g32, b32, eps, ln_count)
        o_ref[...] = (x32 + branch).astype(o_ref.dtype)


def _pick_block_dh(d, dh, itemsize):
    """Hidden-dim block: the whole dh when both weights fit VMEM as
    resident (constant index_map — single-buffered); otherwise the largest
    256-multiple divisor whose revisited (hence DOUBLE-buffered) w1/w2
    block pairs fit."""
    if 2 * d * dh * itemsize <= 10_000_000:
        return dh
    cap = max(256, 10_000_000 // (4 * d * itemsize) // 256 * 256)
    b = min(dh, cap)
    while dh % b:
        b -= 256
    return max(b, 256)


def _fwd_pallas(x, ln_g, ln_b, w1, b1, w2, b2, eps, block_m, interpret,
                post_norm=False, ln_count=0):
    from jax.experimental.pallas import tpu as pltpu

    m, d = x.shape
    dh = w1.shape[1]
    bdh = _pick_block_dh(d, dh, jnp.dtype(w1.dtype).itemsize)
    mp = -(-m // block_m) * block_m
    xp = jnp.pad(x, ((0, mp - m), (0, 0))) if mp != m else x
    out = pl.pallas_call(
        partial(_kernel, eps=eps, dtype=w1.dtype, post_norm=post_norm,
                ln_count=ln_count),
        grid=(mp // block_m, dh // bdh),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((d, bdh), lambda i, j: (0, j)),
            pl.BlockSpec((1, bdh), lambda i, j: (0, j)),
            pl.BlockSpec((bdh, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, d), jnp.float32)],
        interpret=interpret,
    )(xp, ln_g.reshape(1, d), ln_b.reshape(1, d), w1, b1.reshape(1, dh),
      w2, b2.reshape(1, d))
    return out[:m]


def _ref_math(x, ln_g, ln_b, w1, b1, w2, b2, eps, dtype, post_norm=False,
              ln_count=0):
    """The same math in plain XLA ops (used for the backward recompute)."""
    x32 = x.astype(jnp.float32)
    g32, bb32 = ln_g.astype(jnp.float32), ln_b.astype(jnp.float32)
    h = x32.astype(dtype) if post_norm else _ln_f32(x32, g32, bb32, eps,
                                                    ln_count).astype(dtype)
    h = jnp.dot(h, w1, preferred_element_type=jnp.float32)
    h = _gelu_f32(h + b1.astype(jnp.float32)).astype(dtype)
    h = jnp.dot(h, w2, preferred_element_type=jnp.float32)
    h = h + b2.astype(jnp.float32)
    if post_norm:
        h = _ln_f32(h, g32, bb32, eps, ln_count)
    return (x32 + h).astype(x.dtype)


# --------------------------------------------------------------------------
# attention sub-block: LN -> QKV matmul -> per-head attention -> out -> +x
# --------------------------------------------------------------------------
#
# Why one kernel: feeding a separate attention kernel requires
# (N, S, H, hd) -> (N, H, S, hd) layout copies of q/k/v and back for the
# output — traced at 24 ms/iter (23%) of ViT-B b256 inference.  Here the
# grid runs over images, each program holds one image's tokens plus the
# QKV/out weights in VMEM, and heads are walked by static lane-slicing of
# the (S, 3D) QKV product, so no transpose ever exists in any memory
# space.  Scores stay in VMEM f32 (the flash property), softmax on the
# VPU, all matmuls on the MXU.


def _mha_core(qkv, d: int, heads: int, scale: float, dtype):
    """Multi-head scores/softmax/AV inside a kernel, (S, 3D) -> (S, D) f32.

    Two formulations (CVT_ATTN_BATCHED=1 switches):
    - unrolled per-head loop (2*heads small K=hd matmuls) — the default
    - one batched ``dot_general`` over the head axis.  RECORDED NEGATIVE:
      correct under interpret, but compiled Mosaic rejects the
      (S, heads, hd) -> (heads, S, hd) transpose ("infer-vector-layout:
      unsupported shape cast", jax 2026-08), so the batched path is
      interpret-only until Mosaic grows that relayout.
    """
    s_len = qkv.shape[0]
    hd = d // heads
    if _BATCHED_HEADS:
        q = qkv[:, :d].reshape(s_len, heads, hd).transpose(1, 0, 2)
        k = qkv[:, d:2 * d].reshape(s_len, heads, hd).transpose(1, 0, 2)
        v = qkv[:, 2 * d:].reshape(s_len, heads, hd).transpose(1, 0, 2)
        sc = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(sc, axis=-1).astype(dtype)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        return o.transpose(1, 0, 2).reshape(s_len, d)
    outs = []
    for i in range(heads):
        q = qkv[:, i * hd:(i + 1) * hd]
        k = qkv[:, d + i * hd:d + (i + 1) * hd]
        v = qkv[:, 2 * d + i * hd:2 * d + (i + 1) * hd]
        sc = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(sc, axis=-1).astype(dtype)
        outs.append(jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32))
    return jnp.concatenate(outs, axis=-1)


def _attn_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                 o_ref, *, eps: float, heads: int, scale: float, dtype):
    x32 = x_ref[0].astype(jnp.float32)            # (S, D)
    h = _ln_f32(x32, g_ref[...].astype(jnp.float32),
                b_ref[...].astype(jnp.float32), eps).astype(dtype)
    qkv = jax.lax.dot_general(h, wqkv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(dtype)  # (S, 3D)
    d = x_ref.shape[2]
    o = _mha_core(qkv, d, heads, scale, dtype).astype(dtype)  # (S, D)
    o = jax.lax.dot_general(o, wo_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (x32 + o + bo_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _attn_fwd_pallas(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, heads, scale,
                     eps, interpret):
    n, s, d = x.shape
    return pl.pallas_call(
        partial(_attn_kernel, eps=eps, heads=heads, scale=scale,
                dtype=w_qkv.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0)),
            pl.BlockSpec((d, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s, d), x.dtype),
        interpret=interpret,
    )(x, ln_g.reshape(1, d), ln_b.reshape(1, d), w_qkv,
      b_qkv.reshape(1, 3 * d), w_o, b_o.reshape(1, d))


def _attn_ref_math(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, heads, scale, eps,
                   dtype):
    """Same math in plain XLA ops (backward recompute + test oracle)."""
    n, s, d = x.shape
    hd = d // heads
    x32 = x.astype(jnp.float32)
    h = _ln_f32(x32, ln_g.astype(jnp.float32), ln_b.astype(jnp.float32),
                eps).astype(dtype)
    qkv = (jnp.dot(h, w_qkv, preferred_element_type=jnp.float32)
           + b_qkv.astype(jnp.float32)).astype(dtype)
    q, k, v = [a.reshape(n, s, heads, hd) for a in jnp.split(qkv, 3, axis=-1)]
    sc = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                    preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(sc, axis=-1).astype(dtype)
    o = jnp.einsum("nhqk,nkhd->nqhd", p, v,
                   preferred_element_type=jnp.float32)
    o = o.reshape(n, s, d).astype(dtype)
    o = jnp.dot(o, w_o, preferred_element_type=jnp.float32)
    return (x32 + o + b_o.astype(jnp.float32)).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def attention_block(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, heads: int,
                    scale: float, eps: float = 1e-6,
                    interpret: bool = False):
    """``x + Out(MHA(LN(x)))`` for 3-D ``x`` (N, S, D), one VMEM-resident
    kernel per image; ``w_qkv`` is (D, 3D) laid out [q | k | v] with each
    section head-major, ``w_o`` is (D, D)."""
    return _attn_fwd_pallas(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, heads,
                            scale, eps, interpret)


def _attn_fwd(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, heads, scale, eps,
              interpret):
    out = _attn_fwd_pallas(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o, heads,
                           scale, eps, interpret)
    return out, (x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o)


def _attn_bwd(heads, scale, eps, interpret, res, g):
    x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o = res
    grads = jax.grad(
        lambda *a: jnp.sum(
            _attn_ref_math(*a, heads, scale, eps, w_qkv.dtype)
            .astype(jnp.float32) * g.astype(jnp.float32)),
        argnums=tuple(range(7)),
    )(x, ln_g, ln_b, w_qkv, b_qkv, w_o, b_o)
    return grads


attention_block.defvjp(_attn_fwd, _attn_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def mlp_block(x, ln_g, ln_b, w1, b1, w2, b2, eps: float = 1e-6,
              block_m: int = 512, interpret: bool = False,
              post_norm: bool = False, ln_count: int = 0):
    """``x + Dense2(gelu(Dense1(LN(x))))`` for 2-D ``x`` (tokens, d) —
    or, with ``post_norm=True`` (Swin v2), ``x + LN(Dense2(gelu(Dense1(x))))``.

    ``w1``/``w2`` are the compute-dtype kernels ((d, dh) / (dh, d)); LN
    params and biases may be f32.  ``eps``/``block_m``/``interpret``/
    ``post_norm`` are static.
    """
    return _fwd_pallas(x, ln_g, ln_b, w1, b1, w2, b2, eps, block_m,
                       interpret, post_norm, ln_count)


def _fwd(x, ln_g, ln_b, w1, b1, w2, b2, eps, block_m, interpret, post_norm,
         ln_count):
    out = _fwd_pallas(x, ln_g, ln_b, w1, b1, w2, b2, eps, block_m,
                      interpret, post_norm, ln_count)
    return out, (x, ln_g, ln_b, w1, b1, w2, b2)


def _bwd(eps, block_m, interpret, post_norm, ln_count, res, g):
    x, ln_g, ln_b, w1, b1, w2, b2 = res
    grads = jax.grad(
        lambda *a: jnp.sum(
            _ref_math(*a, eps, w1.dtype, post_norm, ln_count).astype(jnp.float32) *
            g.astype(jnp.float32)),
        argnums=tuple(range(7)),
    )(x, ln_g, ln_b, w1, b1, w2, b2)
    return grads


mlp_block.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# ConvNeXt CNBlock tail: res + layer_scale * Dense2(gelu(Dense1(LN(y))))
# --------------------------------------------------------------------------
#
# Why: traced convnext_tiny b256 inference spends ~36% of device time in
# LayerNorm convert/reduce + normalize fusions (the convs fuse fine).
# Fusing the whole post-depthwise tail keeps LN statistics, the hidden
# activations and the layer-scale multiply in VMEM — the feature map
# crosses HBM once in, once out.  Reference semantics:
# ``torchvision/models/convnext.py:62-92`` (CNBlock).  The residual is a
# SEPARATE tensor (the depthwise conv's input), unlike mlp_block.


def _cn_kernel(y_ref, r_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
               ls_ref, o_ref, acc_ref, *, eps: float, dtype):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    y32 = y_ref[...].astype(jnp.float32)
    g32 = g_ref[...].astype(jnp.float32)
    b32 = b_ref[...].astype(jnp.float32)
    h = _ln_f32(y32, g32, b32, eps).astype(dtype)
    hj = jax.lax.dot_general(h, w1_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    hj = _gelu_f32(hj + b1_ref[...].astype(jnp.float32)).astype(dtype)
    pj = jax.lax.dot_general(hj, w2_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = pj + b2_ref[...].astype(jnp.float32)

    @pl.when(j > 0)
    def _():
        acc_ref[...] = acc_ref[...] + pj

    @pl.when(j == nj - 1)
    def _():
        res32 = r_ref[...].astype(jnp.float32)
        o_ref[...] = (res32 + acc_ref[...] * ls_ref[...].astype(jnp.float32)
                      ).astype(o_ref.dtype)


def _cn_fwd_pallas(y, res, ln_g, ln_b, w1, b1, w2, b2, layer_scale, eps,
                   block_m, interpret):
    from jax.experimental.pallas import tpu as pltpu

    m, d = y.shape
    dh = w1.shape[1]
    bdh = _pick_block_dh(d, dh, jnp.dtype(w1.dtype).itemsize)
    mp = -(-m // block_m) * block_m
    if mp != m:
        y = jnp.pad(y, ((0, mp - m), (0, 0)))
        res = jnp.pad(res, ((0, mp - m), (0, 0)))
    out = pl.pallas_call(
        partial(_cn_kernel, eps=eps, dtype=w1.dtype),
        grid=(mp // block_m, dh // bdh),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((d, bdh), lambda i, j: (0, j)),
            pl.BlockSpec((1, bdh), lambda i, j: (0, j)),
            pl.BlockSpec((bdh, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, d), res.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, d), jnp.float32)],
        interpret=interpret,
    )(y, res, ln_g.reshape(1, d), ln_b.reshape(1, d), w1,
      b1.reshape(1, dh), w2, b2.reshape(1, d), layer_scale.reshape(1, d))
    return out[:m]


def _cn_ref_math(y, res, ln_g, ln_b, w1, b1, w2, b2, layer_scale, eps, dtype):
    y32 = y.astype(jnp.float32)
    h = _ln_f32(y32, ln_g.astype(jnp.float32), ln_b.astype(jnp.float32),
                eps).astype(dtype)
    h = jnp.dot(h, w1, preferred_element_type=jnp.float32)
    h = _gelu_f32(h + b1.astype(jnp.float32)).astype(dtype)
    h = jnp.dot(h, w2, preferred_element_type=jnp.float32)
    h = (h + b2.astype(jnp.float32)) * layer_scale.astype(jnp.float32)
    return (res.astype(jnp.float32) + h).astype(res.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def cn_mlp_block(y, res, ln_g, ln_b, w1, b1, w2, b2, layer_scale,
                 eps: float = 1e-6, block_m: int = 512,
                 interpret: bool = False):
    """``res + layer_scale * Dense2(gelu(Dense1(LN(y))))`` for 2-D ``y``/
    ``res`` (tokens, d) — the ConvNeXt CNBlock tail."""
    return _cn_fwd_pallas(y, res, ln_g, ln_b, w1, b1, w2, b2, layer_scale,
                          eps, block_m, interpret)


def _cn_fwd(y, res, ln_g, ln_b, w1, b1, w2, b2, layer_scale, eps, block_m,
            interpret):
    out = _cn_fwd_pallas(y, res, ln_g, ln_b, w1, b1, w2, b2, layer_scale,
                         eps, block_m, interpret)
    return out, (y, res, ln_g, ln_b, w1, b1, w2, b2, layer_scale)


def _cn_bwd(eps, block_m, interpret, saved, g):
    y, res, ln_g, ln_b, w1, b1, w2, b2, layer_scale = saved
    grads = jax.grad(
        lambda *a: jnp.sum(
            _cn_ref_math(*a, eps, w1.dtype).astype(jnp.float32) *
            g.astype(jnp.float32)),
        argnums=tuple(range(9)),
    )(y, res, ln_g, ln_b, w1, b1, w2, b2, layer_scale)
    return grads


cn_mlp_block.defvjp(_cn_fwd, _cn_bwd)

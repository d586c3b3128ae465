"""int8 fused transformer sub-block kernels (PTQ inference).

The bf16 fused kernels (``transformer_block.py``) already hold weights
VMEM-resident and run ViT-B at ~68% MFU — at which point the MXU's int8
path (2x the bf16 MAC rate on v5e) is the remaining throughput lever.
These are the int8 twins: weights are per-output-channel symmetric int8,
activations are quantised **inside** the kernel to static per-tensor
scales (post-LN and post-gelu sites, calibrated by
``models/quantization_vit.Int8ViT``), so the int8 tensors never exist in
HBM — the kernel I/O stays bf16 and only the MXU contraction runs int8.

LayerNorm statistics, softmax, gelu and all rescales stay f32 on the VPU,
exactly like the bf16 kernels.

Counterpart: the reference ships no quantized ViT (its
``models/quantization/`` is CNN-only) — this is a beyond-parity extension
in the same design language as its fused QuantizableResNet.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .transformer_block import _gelu_f32, _ln_f32, _mha_core, _pick_block_dh

__all__ = ["mlp_block_int8", "attention_block_int8", "quantize_weight"]


def quantize_weight(w: jax.Array):
    """Per-output-channel (last axis) symmetric int8."""
    scale = jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quant(f32, inv_scale):
    return jnp.clip(jnp.round(f32 * inv_scale), -127, 127).astype(jnp.int8)


# --------------------------------------------------------------------------
# MLP: x + W2 gelu(W1 LN(x) + b1) + b2, both matmuls int8
# --------------------------------------------------------------------------


def _mlp_kernel(x_ref, g_ref, b_ref, qw1_ref, s1_ref, b1_ref, qw2_ref,
                s2_ref, b2_ref, inv1_ref, inv2_ref, o_ref, acc_ref, *,
                eps: float):
    # grid (m_tiles, dh_tiles), hidden dim innermost (same scheme as the
    # bf16 kernel: partial down-projections accumulate in f32 VMEM).
    # inv1/inv2 are PER-CHANNEL activation inverse scales ((1, d)/(1, bdh));
    # the matching act scale is folded into the quantized weight's rows, so
    # s1/s2 are the complete dequant scales.  Per-channel act quant costs
    # nothing extra on the VPU and removes the cross-channel range waste of
    # per-tensor scales (ViT e2e logit rel-err 3.69% -> per-channel).
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    x32 = x_ref[...].astype(jnp.float32)
    h32 = _ln_f32(x32, g_ref[...].astype(jnp.float32),
                  b_ref[...].astype(jnp.float32), eps)
    q1 = _quant(h32, inv1_ref[...])
    hj = jax.lax.dot_general(q1, qw1_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    f = _gelu_f32(hj.astype(jnp.float32) * s1_ref[...]
                  + b1_ref[...].astype(jnp.float32))
    q2 = _quant(f, inv2_ref[...])
    pj = jax.lax.dot_general(q2, qw2_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    pj = pj.astype(jnp.float32) * s2_ref[...]

    @pl.when(j == 0)
    def _():
        acc_ref[...] = pj + b2_ref[...].astype(jnp.float32)

    @pl.when(j > 0)
    def _():
        acc_ref[...] = acc_ref[...] + pj

    @pl.when(j == nj - 1)
    def _():
        o_ref[...] = (x32 + acc_ref[...]).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("eps", "block_m", "interpret"))
def mlp_block_int8(x, ln_g, ln_b, qw1, s1, b1, qw2, s2, b2,
                   a1: jax.Array, a2: jax.Array, eps: float = 1e-6,
                   block_m: int = 256, interpret: bool = False):
    """``x + W2 gelu(W1 LN(x))`` with int8 MXU contractions.

    ``qw1`` (d, dh) / ``qw2`` (dh, d) int8 quantized from the act-scale-
    FOLDED float weights (``quantize_weight(w * a[:, None])``); ``s1``
    (dh,) / ``s2`` (d,) are therefore the complete dequant scales.
    ``a1``/``a2``: static activation scales (scalar or per-channel (d,) /
    (dh,)) for the post-LN and post-gelu sites.  2-D ``x`` (tokens, d).
    """
    from jax.experimental.pallas import tpu as pltpu

    m, d = x.shape
    dh = qw1.shape[1]
    bdh = _pick_block_dh(d, dh, 1)
    mp = -(-m // block_m) * block_m
    xp = jnp.pad(x, ((0, mp - m), (0, 0))) if mp != m else x
    s1f = jnp.asarray(s1, jnp.float32).reshape(1, dh)
    s2f = jnp.asarray(s2, jnp.float32).reshape(1, d)
    a1v = jnp.broadcast_to(jnp.asarray(a1, jnp.float32).reshape(-1), (d,))
    a2v = jnp.broadcast_to(jnp.asarray(a2, jnp.float32).reshape(-1), (dh,))
    inv1 = (1.0 / a1v).reshape(1, d)
    inv2 = (1.0 / a2v).reshape(1, dh)
    out = pl.pallas_call(
        partial(_mlp_kernel, eps=eps),
        grid=(mp // block_m, dh // bdh),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((d, bdh), lambda i, j: (0, j)),
            pl.BlockSpec((1, bdh), lambda i, j: (0, j)),
            pl.BlockSpec((1, bdh), lambda i, j: (0, j)),
            pl.BlockSpec((bdh, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, d), lambda i, j: (0, 0)),
            pl.BlockSpec((1, bdh), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((mp, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, d), jnp.float32)],
        interpret=interpret,
    )(xp, ln_g.reshape(1, d), ln_b.reshape(1, d), qw1, s1f,
      b1.reshape(1, dh), qw2, s2f, b2.reshape(1, d), inv1, inv2)
    return out[:m]


# --------------------------------------------------------------------------
# attention: x + Out(MHA(LN(x))), QKV + out projections int8
# --------------------------------------------------------------------------


def _attn_kernel(x_ref, g_ref, b_ref, qwqkv_ref, sqkv_ref, bqkv_ref,
                 qwo_ref, so_ref, bo_ref, inv1_ref, inv2_ref, o_ref, *,
                 eps: float, heads: int, scale: float, dtype):
    x32 = x_ref[0].astype(jnp.float32)            # (S, D)
    h32 = _ln_f32(x32, g_ref[...].astype(jnp.float32),
                  b_ref[...].astype(jnp.float32), eps)
    q1 = _quant(h32, inv1_ref[...])
    qkv = jax.lax.dot_general(q1, qwqkv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    qkv = (qkv.astype(jnp.float32) * sqkv_ref[...]
           + bqkv_ref[...].astype(jnp.float32)).astype(dtype)  # (S, 3D)
    d = x_ref.shape[2]
    o = _mha_core(qkv, d, heads, scale, dtype)    # (S, D) f32
    qo = _quant(o, inv2_ref[...])
    proj = jax.lax.dot_general(qo, qwo_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    o_ref[0] = (x32 + proj.astype(jnp.float32) * so_ref[...]
                + bo_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("heads", "scale", "eps", "interpret"))
def attention_block_int8(x, ln_g, ln_b, qw_qkv, s_qkv, b_qkv, qw_o, s_o,
                         b_o, a1: jax.Array, ao: jax.Array, heads: int,
                         scale: float, eps: float = 1e-6,
                         interpret: bool = False):
    """``x + Out(MHA(LN(x)))`` with int8 QKV and out projections.

    3-D ``x`` (N, S, D); ``qw_qkv`` (D, 3D) int8 [q|k|v] head-major and
    ``qw_o`` (D, D) int8, both quantized from act-scale-FOLDED float
    weights (``quantize_weight(w * a[:, None])``) so ``s_qkv``/``s_o``
    are complete dequant scales; ``a1``/``ao``: static activation scales
    (scalar or per-channel (D,)) for the post-LN and pre-out-projection
    sites — per-channel ``ao`` gives each attention head its own range.
    """
    n, s, d = x.shape
    sqkv = jnp.asarray(s_qkv, jnp.float32).reshape(1, 3 * d)
    so = jnp.asarray(s_o, jnp.float32).reshape(1, d)
    a1v = jnp.broadcast_to(jnp.asarray(a1, jnp.float32).reshape(-1), (d,))
    aov = jnp.broadcast_to(jnp.asarray(ao, jnp.float32).reshape(-1), (d,))
    inv1 = (1.0 / a1v).reshape(1, d)
    inv2 = (1.0 / aov).reshape(1, d)
    return pl.pallas_call(
        partial(_attn_kernel, eps=eps, heads=heads, scale=scale,
                dtype=jnp.bfloat16 if x.dtype == jnp.bfloat16 else x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0)),
            pl.BlockSpec((d, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, s, d), x.dtype),
        interpret=interpret,
    )(x, ln_g.reshape(1, d), ln_b.reshape(1, d), qw_qkv, sqkv,
      b_qkv.reshape(1, 3 * d), qw_o, so, b_o.reshape(1, d), inv1, inv2)

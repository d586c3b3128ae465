"""Fused multi-head attention (flash-style): QK^T -> softmax -> AV in VMEM.

Why: the ViT encoder's attention scores are (N, H, S, S) — at ViT-B/16
b256 that is 119M elements, and the f32 softmax over them round-trips HBM
every layer.  This kernel keeps the scores resident in VMEM: one grid
step per batch element computes all heads' QK^T (head-batched
dot_general on the MXU), the f32 softmax (VPU), and the AV contraction,
so the only HBM traffic is q/k/v in and o out.

Layout: q/k/v arrive exactly as the QKV projection produces them —
(N, S, H, hd), no transposes — and the output is (N, H, S, hd) (the
natural batch-dims-first result of the contraction; the caller folds it
back with one cheap transpose+reshape).

Counterpart: the reference routes attention through
``torch.nn.functional.scaled_dot_product_attention``
(``torchvision/models/vision_transformer.py`` -> torch MHA), whose CUDA
fast path is FlashAttention — this is the TPU analog.

Backward: ``jax.custom_vjp`` recomputing scores from q/k/v with plain XLA
einsums (flash-style rematerialisation — nothing saved but q/k/v).

Numerics match the unfused path in ``models/vision_transformer.FusedMHA``:
scores accumulate f32, softmax in f32, probabilities cast to the compute
dtype for the AV matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["flash_mha"]


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (H, S, hd) — Mosaic needs dot batch dims at position 0
    k = k_ref[0]
    v = v_ref[0]
    # (H, S, hd) x (H, S, hd), contract hd, batch H -> (H, S, S) f32 on MXU
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(s, axis=-1)
    # (H, S, S) x (H, S, hd), contract key-S, batch H -> (H, S, hd)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _fwd_pallas(q, k, v, scale, interpret):
    n, s, h, hd = q.shape
    qt, kt, vt = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
    return pl.pallas_call(
        partial(_kernel, scale=scale),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, s, hd), lambda i: (i, 0, 0, 0))] * 3,
        out_specs=pl.BlockSpec((1, h, s, hd), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, s, hd), q.dtype),
        interpret=interpret,
    )(qt, kt, vt)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_mha(q, k, v, scale: float, interpret: bool = False):
    """``softmax(q k^T * scale) v`` per head, scores VMEM-resident.

    Args are (N, S, H, hd); returns (N, H, S, hd) in q's dtype.  ``scale``
    is static (typically ``1/sqrt(hd)``).  Set ``interpret=True`` off-TPU.
    """
    return _fwd_pallas(q, k, v, scale, interpret)


def _fwd(q, k, v, scale, interpret):
    return _fwd_pallas(q, k, v, scale, interpret), (q, k, v)


def _bwd(scale, interpret, res, g):
    q, k, v = res  # (n, s, h, d); g is (n, h, s, d)
    dt = q.dtype
    s = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    pc = p.astype(dt)
    dv = jnp.einsum("nhqk,nhqd->nkhd", pc, g)
    dp = jnp.einsum("nhqd,nkhd->nhqk", g, v,
                    preferred_element_type=jnp.float32)
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale).astype(dt)
    dq = jnp.einsum("nhqk,nkhd->nqhd", ds, k)
    dk = jnp.einsum("nhqk,nqhd->nkhd", ds, q)
    return dq, dk, dv


flash_mha.defvjp(_fwd, _bwd)

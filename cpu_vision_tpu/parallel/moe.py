"""Expert parallelism: Switch-style top-1 mixture-of-experts FFN with the
experts sharded over a mesh axis and token exchange via ``all_to_all``.

Beyond-reference (SURVEY §2c): included so the parallelism layer covers the
full tp/pp/dp/sp/ep matrix.  Layout: tokens are sharded over the ``expert``
axis (each device holds T/S tokens) and each device owns exactly one
expert's weights.  Per step:

1. route: softmax gate, top-1 expert per token, capacity-bounded dispatch
   tensor built from cumsum positions (Mesh-TensorFlow one-hot recipe);
2. ``all_to_all`` the (E, C, F) dispatch buffer so device e receives every
   source shard's tokens for expert e — the collective rides ICI;
3. apply the local expert FFN;
4. reverse ``all_to_all`` and combine with the gate probabilities
   (dropped-token rows combine to zero, the standard Switch behavior).

Everything is dense one-hot algebra — static shapes, MXU-friendly, and
differentiable end-to-end (the router learns through the combine weights).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["moe_ffn", "init_moe_params"]


def _shard_map():
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    return shard_map


def init_moe_params(key, num_experts: int, features: int, hidden: int) -> Dict:
    """Gate + per-expert FFN weights (leading axis = expert, shard it)."""
    k1, k2, k3 = jax.random.split(key, 3)
    scale = 1.0 / math.sqrt(features)
    return {
        "gate": jax.random.normal(k1, (features, num_experts)) * scale,
        "w1": jax.random.normal(k2, (num_experts, features, hidden)) * scale,
        "w2": jax.random.normal(k3, (num_experts, hidden, features)) / math.sqrt(hidden),
    }


def moe_ffn(params: Dict, x: jax.Array, mesh: Mesh, axis: str = "expert",
            capacity_factor: float = 1.25) -> jax.Array:
    """Apply the expert-parallel MoE FFN.

    ``x``: (T, F) tokens, sharded over ``axis`` on T.  ``params["w1"/"w2"]``
    have leading expert axis S == mesh axis size, sharded over ``axis``;
    the gate is replicated.  Returns (T, F), sharded like ``x``.
    """

    def local(gate_w, w1, w2, xs):
        s = lax.axis_size(axis)
        tl, f = xs.shape
        cap = max(1, int(math.ceil(capacity_factor * tl / s)))
        scores = jax.nn.softmax(xs @ gate_w)              # (Tl, E)
        gate = jnp.max(scores, axis=-1)                   # (Tl,)
        onehot = jax.nn.one_hot(jnp.argmax(scores, -1), s)  # (Tl, E)
        pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0   # slot within expert
        keep = (pos >= 0) & (pos < cap)
        dispatch = jax.nn.one_hot(pos.astype(jnp.int32), cap) * keep[..., None]  # (Tl, E, C)
        combine = dispatch * gate[:, None, None]
        xe = jnp.einsum("tf,tec->ecf", xs, dispatch)      # (E, C, F)
        # device e receives every shard's expert-e buffer: (S, C, F)
        xe = lax.all_to_all(xe, axis, split_axis=0, concat_axis=0, tiled=True)
        w1l, w2l = w1[0], w2[0]                           # my expert
        ye = jax.nn.relu(xe.reshape(s * cap, f) @ w1l) @ w2l
        ye = lax.all_to_all(ye.reshape(s, cap, f), axis, split_axis=0,
                            concat_axis=0, tiled=True)    # back to sources
        return jnp.einsum("ecf,tec->tf", ye, combine)

    return _shard_map()(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )(params["gate"], params["w1"], params["w2"], x)

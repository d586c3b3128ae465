"""Spatial sharding with halo exchange — the CV analog of sequence/context
parallelism (absent from the reference, see SURVEY §2c: its only strategy is
DP).  Large images are sharded along H across mesh devices; stencils exchange
``halo`` boundary rows with neighbours via ``lax.ppermute`` over ICI, then run
locally.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["halo_exchange", "spatial_map"]


def halo_exchange(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Pad a height-sharded (..., H_local, W, C) block with ``halo`` rows from
    the neighbouring shards (edge-replicate at the global boundary).

    Runs inside ``shard_map``; communication is two ``ppermute`` rings.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    top_rows = lax.slice_in_dim(x, 0, halo, axis=-3)
    bot_rows = lax.slice_in_dim(x, x.shape[-3] - halo, x.shape[-3], axis=-3)
    # send my top rows up (to i-1) -> they arrive as neighbour's bottom halo
    from_below = lax.ppermute(top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)])
    from_above = lax.ppermute(bot_rows, axis_name, [(i, (i + 1) % n) for i in range(n)])
    # global edges: replicate own boundary rows instead of wrapping
    first = idx == 0
    last = idx == n - 1
    top_halo = jnp.where(first, jnp.repeat(lax.slice_in_dim(x, 0, 1, axis=-3), halo, axis=-3), from_above)
    bot_halo = jnp.where(last, jnp.repeat(lax.slice_in_dim(x, x.shape[-3] - 1, x.shape[-3], axis=-3), halo, axis=-3), from_below)
    return jnp.concatenate([top_halo, x, bot_halo], axis=-3)


def spatial_map(
    fn: Callable,
    mesh: Mesh,
    halo: int,
    axis: str = "data",
) -> Callable:
    """Wrap a same-size stencil ``fn(padded_block) -> block`` to run over
    images height-sharded on ``axis``.

    ``fn`` receives a local block with ``halo`` extra rows top and bottom and
    must return the block without halos (shape minus ``2*halo`` rows).
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    def sharded(x):
        def local(block):
            padded = halo_exchange(block, halo, axis)
            return fn(padded)

        spec = P(None, axis, None, None)
        return shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)(x)

    return sharded

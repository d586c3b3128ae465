"""Pipeline parallelism (GPipe-style) over a device-mesh axis.

Beyond-reference (SURVEY §2c: the reference's only strategy is DDP data
parallelism).  A stack of S identical stages (e.g. ViT encoder blocks,
same-resolution conv blocks) is sharded over the ``stage`` mesh axis —
stage s's parameters live only on device s.  A batch is split into M
microbatches which flow through the ring: at each of the M + S - 1 clock
ticks every device applies its stage to its current microbatch and
``ppermute``s the activation to the next stage over ICI.

The whole schedule is a single ``lax.scan`` inside ``shard_map`` — XLA sees
one compiled program per device with a static communication pattern, and the
scan is differentiable, so the same wrapper works under ``jax.grad`` (the
backward pass runs the reverse ring automatically).

Constraints: stage input and output shapes must match (true for transformer
blocks), and the number of stages equals the mesh axis size.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["pipeline_map"]


def _shard_map():
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    return shard_map


def pipeline_map(stage_fn: Callable, mesh: Mesh, axis: str = "stage") -> Callable:
    """Wrap ``stage_fn(params, x) -> y`` (y.shape == x.shape) into a
    pipelined ``apply(stacked_params, microbatches)``.

    ``stacked_params``: pytree whose leaves have a leading axis of size S
    (one slice per stage) — sharded over ``axis`` by ``shard_map``.
    ``microbatches``: (M, mb, ...) array, replicated; returns (M, mb, ...)
    outputs (replicated — the last stage's results are broadcast).
    """

    def local(params, x):
        s = lax.axis_size(axis)
        idx = lax.axis_index(axis)
        p = jax.tree.map(lambda a: a[0], params)  # my stage's slice
        m = x.shape[0]
        # mark the zero-init carries as device-varying over the stage axis —
        # the loop writes varying values into them, and shard_map's vma type
        # system requires carry-in == carry-out
        state0 = lax.pvary(jnp.zeros_like(x[0]), (axis,))
        outs0 = lax.pvary(jnp.zeros_like(x), (axis,))
        ring = [(i, (i + 1) % s) for i in range(s)]

        def tick(carry, t):
            state, outs = carry
            # stage 0 injects microbatch t (clamped after the drain begins)
            xin = x[jnp.clip(t, 0, m - 1)]
            y = stage_fn(p, jnp.where(idx == 0, xin, state))
            # last stage emits microbatch t-(S-1) once the fill completes
            ot = jnp.clip(t - (s - 1), 0, m - 1)
            emit = (idx == s - 1) & (t >= s - 1)
            outs = jnp.where(emit, outs.at[ot].set(y), outs)
            state = lax.ppermute(y, axis, ring)
            return (state, outs), None

        (_, outs), _ = lax.scan(tick, (state0, outs0), jnp.arange(m + s - 1))
        # broadcast the last stage's collected outputs to every device
        return lax.psum(jnp.where(idx == s - 1, outs, jnp.zeros_like(outs)), axis)

    def apply(stacked_params, microbatches):
        return _shard_map()(
            local,
            mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=P(),
        )(stacked_params, microbatches)

    return apply

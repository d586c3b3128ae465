"""Sharded training steps.

``make_train_step`` builds a jitted SGD/optax step over a mesh:

* **DP**: batch sharded over the ``data`` axis; gradient all-reduce is
  implicit in the sharding propagation (what DDP's NCCL hooks do manually,
  reference ``references/classification/train.py:325``).
* **TP**: wide channel dims of the params sharded over the ``model`` axis via
  a sharding-rule callback; XLA inserts the all-gathers/reduce-scatters.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["replicate", "shard_batch", "shard_params_tp", "make_train_step"]


def replicate(tree, mesh: Mesh):
    """Replicate a pytree on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard leading (batch) dim of every leaf over the given mesh axis."""

    def put(x):
        spec = P(axis, *([None] * (jnp.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def _default_tp_rule(path: Tuple, value) -> Optional[P]:
    """Shard the last (output-channel) dim of large kernels on 'model'."""
    if value.ndim >= 2 and value.shape[-1] >= 256 and value.shape[-1] % 2 == 0:
        return P(*([None] * (value.ndim - 1)), "model")
    return P()


def shard_params_tp(params, mesh: Mesh, rule: Callable = _default_tp_rule):
    """Tensor-parallel param placement: ``rule(path, value) -> PartitionSpec``."""

    def put(path, value):
        spec = rule(path, value)
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def make_train_step(
    loss_fn: Callable,
    optimizer=None,
    donate: bool = True,
):
    """Build ``step(state, batch) -> (state, metrics)``.

    ``loss_fn(params, batch) -> (loss, aux)`` must be pure.  ``state`` is
    ``(params, opt_state)``; with ``optimizer=None`` plain SGD(lr=0.01).
    Gradient synchronisation across the mesh is implicit: params/batch carry
    shardings and XLA inserts the collectives.
    """
    if optimizer is None:
        import optax

        optimizer = optax.sgd(0.01)

    def step(state, batch):
        params, opt_state = state
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return (params, opt_state), {"loss": loss, **aux}

    return jax.jit(step, donate_argnums=(0,) if donate else ())

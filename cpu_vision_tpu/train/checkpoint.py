"""Checkpointing (orbax): pytree save/restore.

Counterpart of the reference's epoch-granular checkpoint dicts
(``references/classification/train.py:373-386``: model/optimizer/lr_scheduler/
epoch saved rank-0-only) and of ``WeightsEnum.get_state_dict``'s cached loads
(``models/_api.py:89``).  Orbax handles sharded arrays and atomicity.
"""

from __future__ import annotations

import os
from typing import Any, Optional

__all__ = ["save_checkpoint", "load_checkpoint", "load_params"]


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any) -> None:
    """Save a pytree (params, opt state, epoch counters, ...) to ``path``.

    Multi-process: call from all processes (orbax coordinates); only one
    writes each shard — the moral equivalent of ``save_on_master``.
    """
    import jax

    path = os.path.abspath(path)
    # orbax wants numeric leaves; convert scalars
    state = jax.tree.map(lambda x: x, state)
    _ckptr().save(path, state, force=True)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.  ``target`` (a
    pytree of like-shaped arrays) restores dtypes/shardings."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if target is not None:
        return _ckptr().restore(path, item=target)
    return _ckptr().restore(path)


def load_params(url_or_path: str) -> Any:
    """Load model params referenced by a ``Weights.url``.  Local paths load
    directly; remote URLs require a pre-populated cache directory
    (``CVT_WEIGHTS_CACHE``, default ``~/.cache/cpu_vision_tpu``) — this
    environment has no egress."""
    if os.path.exists(url_or_path):
        return load_checkpoint(url_or_path)
    cache = os.environ.get("CVT_WEIGHTS_CACHE", os.path.expanduser("~/.cache/cpu_vision_tpu"))
    local = os.path.join(cache, os.path.basename(url_or_path.rstrip("/")))
    if os.path.exists(local):
        return load_checkpoint(local)
    raise FileNotFoundError(
        f"weights {url_or_path!r} not found locally; place them under {cache}"
    )

"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["create_mesh", "default_mesh"]


def create_mesh(
    shape: Sequence[int],
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Mesh over the first ``prod(shape)`` devices.

    A ``-1`` entry absorbs the remaining devices (like a reshape).
    """
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    known = int(np.prod([s for s in shape if s != -1]))
    if -1 in shape:
        shape[shape.index(-1)] = len(devices) // known
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def default_mesh(model_parallel: int = 1) -> Mesh:
    """data x model mesh over all devices."""
    n = len(jax.devices())
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    return create_mesh((n // model_parallel, model_parallel))

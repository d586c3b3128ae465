"""Stochastic regularisers: stochastic depth, DropBlock.

Ports of the reference's ``ops/stochastic_depth.py:8-50`` and
``ops/drop_block.py:9-110``, with the one necessary API departure for JAX:
randomness comes from an explicit ``jax.random`` key instead of torch's
global RNG.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["stochastic_depth", "drop_block2d", "drop_block3d"]


def stochastic_depth(
    x: jax.Array, p: float, mode: str, training: bool, key: Optional[jax.Array] = None
) -> jax.Array:
    """Randomly zero whole residual branches (reference
    ``stochastic_depth``, ``ops/stochastic_depth.py:8``).

    ``mode``: "batch" zeroes the whole tensor, "row" zeroes per-sample.
    """
    if p < 0.0 or p > 1.0:
        raise ValueError(f"p must be in [0, 1], got {p}")
    if mode not in ("batch", "row"):
        raise ValueError(f"mode must be 'batch' or 'row', got {mode}")
    if not training or p == 0.0:
        return x
    if key is None:
        raise ValueError("stochastic_depth in training mode needs a PRNG key")
    survival_rate = 1.0 - p
    if mode == "row":
        size = (x.shape[0],) + (1,) * (x.ndim - 1)
    else:
        size = (1,) * x.ndim
    noise = jax.random.bernoulli(key, survival_rate, size).astype(x.dtype)
    if survival_rate > 0.0:
        noise = noise / survival_rate
    return x * noise


def drop_block2d(
    x: jax.Array,
    p: float,
    block_size: int,
    inplace: bool = False,
    eps: float = 1e-06,
    training: bool = True,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """DropBlock2d on NHWC input (reference ``drop_block2d``,
    ``ops/drop_block.py:9``)."""
    if p < 0.0 or p > 1.0:
        raise ValueError(f"p must be in [0, 1], got {p}")
    if x.ndim != 4:
        raise ValueError(f"expected NHWC input, got ndim {x.ndim}")
    if not training or p == 0.0:
        return x
    if key is None:
        raise ValueError("drop_block2d in training mode needs a PRNG key")
    n, h, w, c = x.shape
    block_size = min(block_size, h, w)
    gamma = (p * h * w) / ((block_size**2) * ((h - block_size + 1) * (w - block_size + 1)))
    noise = jax.random.bernoulli(
        key, gamma, (n, h - block_size + 1, w - block_size + 1, c)
    ).astype(x.dtype)
    pad = [(0, 0), (block_size // 2, block_size - 1 - block_size // 2),
           (block_size // 2, block_size - 1 - block_size // 2), (0, 0)]
    noise = jnp.pad(noise, pad)
    # max-pool the seeds into blocks
    noise = jax.lax.reduce_window(
        noise, 0.0, jax.lax.max,
        (1, block_size, block_size, 1), (1, 1, 1, 1), "SAME",
    )
    mask = 1.0 - noise
    normalize_scale = mask.size / (eps + mask.sum())
    return x * mask * normalize_scale


def drop_block3d(
    x: jax.Array,
    p: float,
    block_size: int,
    inplace: bool = False,
    eps: float = 1e-06,
    training: bool = True,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """DropBlock3d on NDHWC input (reference ``drop_block3d``,
    ``ops/drop_block.py:55``)."""
    if p < 0.0 or p > 1.0:
        raise ValueError(f"p must be in [0, 1], got {p}")
    if x.ndim != 5:
        raise ValueError(f"expected NDHWC input, got ndim {x.ndim}")
    if not training or p == 0.0:
        return x
    if key is None:
        raise ValueError("drop_block3d in training mode needs a PRNG key")
    n, d, h, w, c = x.shape
    block_size = min(block_size, d, h, w)
    gamma = (p * d * h * w) / (
        (block_size**3)
        * ((d - block_size + 1) * (h - block_size + 1) * (w - block_size + 1))
    )
    noise = jax.random.bernoulli(
        key, gamma, (n, d - block_size + 1, h - block_size + 1, w - block_size + 1, c)
    ).astype(x.dtype)
    lo = block_size // 2
    hi = block_size - 1 - lo
    noise = jnp.pad(noise, [(0, 0), (lo, hi), (lo, hi), (lo, hi), (0, 0)])
    noise = jax.lax.reduce_window(
        noise, 0.0, jax.lax.max,
        (1, block_size, block_size, block_size, 1), (1, 1, 1, 1, 1), "SAME",
    )
    mask = 1.0 - noise
    normalize_scale = mask.size / (eps + mask.sum())
    return x * mask * normalize_scale

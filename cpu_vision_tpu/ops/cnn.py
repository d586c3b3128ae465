"""``cnn_forward`` — the north-star LeNet-style CNN forward op.

A pure-functional conv→ReLU→pool→FC network (the shape of the reference's
AlexNet features+classifier, ``torchvision/models/alexnet.py:17-46``,
reduced to LeNet scale).  Parameters are an explicit pytree so the op is a
plain jittable function: ``cnn_forward(params, images)``.

TPU: NHWC convs with bf16-friendly dtype handling; all matmuls/convs land on
the MXU.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["cnn_init", "cnn_forward"]


def cnn_init(
    key: jax.Array,
    input_hw: Tuple[int, int] = (28, 28),
    in_channels: int = 1,
    conv_channels: Sequence[int] = (32, 64),
    hidden: int = 128,
    num_classes: int = 10,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Initialise LeNet-style parameters (He init)."""
    params: Dict[str, Any] = {}
    c_in = in_channels
    h, w = input_hw
    for i, c_out in enumerate(conv_channels):
        key, k1, k2 = jax.random.split(key, 3)
        fan_in = 3 * 3 * c_in
        params[f"conv{i}"] = {
            "w": jax.random.normal(k1, (3, 3, c_in, c_out), dtype) * jnp.sqrt(2.0 / fan_in),
            "b": jnp.zeros((c_out,), dtype),
        }
        c_in = c_out
        h, w = h // 2, w // 2
    flat = h * w * c_in
    key, k1, k2, k3, k4 = jax.random.split(key, 5)
    params["fc1"] = {
        "w": jax.random.normal(k1, (flat, hidden), dtype) * jnp.sqrt(2.0 / flat),
        "b": jnp.zeros((hidden,), dtype),
    }
    params["fc2"] = {
        "w": jax.random.normal(k3, (hidden, num_classes), dtype) * jnp.sqrt(2.0 / hidden),
        "b": jnp.zeros((num_classes,), dtype),
    }
    return params


def cnn_forward(params: Dict[str, Any], images: jax.Array) -> jax.Array:
    """Forward pass: [conv3x3 same -> ReLU -> maxpool2] per conv layer, then
    flatten -> FC -> ReLU -> FC logits.  ``images`` is NHWC."""
    x = images
    i = 0
    while f"conv{i}" in params:
        p = params[f"conv{i}"]
        x = lax.conv_general_dilated(
            x, p["w"], (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + p["b"]
        x = jax.nn.relu(x)
        x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        i += 1
    x = x.reshape(x.shape[0], -1)
    x = jax.nn.relu(x @ params["fc1"]["w"] + params["fc1"]["b"])
    return x @ params["fc2"]["w"] + params["fc2"]["b"]

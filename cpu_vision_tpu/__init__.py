"""cpu_vision_tpu — a TPU-native computer-vision framework in JAX.

A ground-up rebuild of the capabilities of the reference CV library
(torchvision, see SURVEY.md) designed for TPU: NHWC layout, uint8 at rest /
float32-bf16 in compute, ``jit``/``vmap``/``pjit`` everywhere, fused Pallas
kernels on the hot stencil paths, and ``jax.sharding`` meshes instead of a
process-group communication backend.

Subpackages
-----------
``ops``         image kernels (filter/blur/edges/resize/warp/color), box and
                RoI ops, losses, NN building blocks, fused Pallas kernels
``transforms``  typed functional + class transform API (v2-style registry)
``models``      model zoo with a ``register_model``/``get_model`` registry
``parallel``    mesh construction, data/model-parallel training steps
``io``          image encode/decode
``datasets``    dataset abstractions and folder/ubiquitous datasets
``train``       training loop utilities (metrics, checkpointing)
"""

__version__ = "0.1.0"

from . import _dtype, _layout  # noqa: F401
from ._dtype import to_dtype  # noqa: F401

_API_USAGE_LOG: dict = {}


def _log_api_usage_once(obj) -> None:
    """Counterpart of the reference's ``_log_api_usage_once``
    (torchvision ``utils.py:619``): records first use of each public API."""
    name = f"{getattr(obj, '__module__', '?')}.{getattr(obj, '__qualname__', str(obj))}"
    _API_USAGE_LOG[name] = _API_USAGE_LOG.get(name, 0) + 1

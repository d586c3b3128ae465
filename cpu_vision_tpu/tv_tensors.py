"""Drop-in alias for the reference import path ``torchvision.tv_tensors``
(reference ``tv_tensors/__init__.py``): the typed array wrappers live in
:mod:`cpu_vision_tpu.tv_arrays` (pytree-registered JAX arrays, not tensor
subclasses); this module re-exports them under the reference's name so
``from cpu_vision_tpu import tv_tensors`` works verbatim."""

from .tv_arrays import *  # noqa: F401,F403
from .tv_arrays import __all__  # noqa: F401

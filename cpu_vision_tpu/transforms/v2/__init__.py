"""Drop-in alias for the reference's ``torchvision.transforms.v2`` namespace.

The reference splits transforms into a legacy v1 API and the typed-dispatch
v2 API (``torchvision/transforms/v2/__init__.py``).  This library has a
single unified implementation living flat on ``cpu_vision_tpu.transforms``;
this module re-exports it so ``from cpu_vision_tpu.transforms import v2``
and ``import cpu_vision_tpu.transforms.v2.functional`` work exactly like the
reference import paths.
"""

import sys as _sys

from .. import *  # noqa: F401,F403
from .. import InterpolationMode, functional  # noqa: F401

# make `cpu_vision_tpu.transforms.v2.functional` importable as a module path
_sys.modules[__name__ + ".functional"] = functional

__all__ = [_n for _n in dir() if not _n.startswith("_") and _n not in ("sys",)]

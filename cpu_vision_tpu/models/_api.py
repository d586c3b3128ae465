"""Model registry + weights metadata.

Counterpart of the reference's ``torchvision/models/_api.py``:
``register_model`` (:196), ``list_models`` (:207), ``get_model`` (:265),
``get_model_builder``, ``get_weight`` (:108), and the ``Weights`` /
``WeightsEnum`` metadata carrier (:20-105).

Weights here reference orbax/msgpack checkpoints of parameter pytrees
instead of torch-hub state dicts; ``Weights.transforms`` is the linked
eval preset exactly like the reference.
"""

from __future__ import annotations

import dataclasses
import fnmatch
from typing import Any, Callable, Dict, List, Mapping, Optional

__all__ = [
    "Weights",
    "WeightsEnum",
    "register_model",
    "list_models",
    "get_model",
    "get_model_builder",
    "get_weight",
    "get_model_weights",
]

_MODEL_REGISTRY: Dict[str, Callable] = {}

# Every WeightsEnum subclass by class name (hand-written ones register via
# __init_subclass__; generated ones via _weights_registry).  get_weight
# resolves "Enum.MEMBER" strings against this, so enums stay addressable
# even for builders that carry a different (hand-written) enum.
ENUM_REGISTRY: Dict[str, type] = {}


@dataclasses.dataclass(frozen=True)
class Weights:
    """Weights metadata (reference ``Weights``, ``models/_api.py:20-39``).

    ``url``: checkpoint location (path or URL); ``transforms``: factory for
    the matching eval preset; ``meta``: free-form metadata (metrics, recipe,
    num_params, categories, ...).
    """

    url: str
    transforms: Callable
    meta: Mapping[str, Any]

    def get_params(self):
        """Load the parameter pytree for these weights (orbax/msgpack)."""
        from ..train.checkpoint import load_params

        return load_params(self.url)


class WeightsEnum:
    """Namespace base for per-model weight enums (reference ``WeightsEnum``,
    ``models/_api.py:45-105``).  Subclasses define class attributes like
    ``IMAGENET1K_V1 = Weights(...)`` and ``DEFAULT``."""

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        ENUM_REGISTRY.setdefault(cls.__name__, cls)

    @classmethod
    def verify(cls, obj):
        if obj is None or isinstance(obj, Weights):
            return obj
        if isinstance(obj, str):
            name = obj.replace(f"{cls.__name__}.", "")
            if not hasattr(cls, name):
                raise ValueError(f"unknown weights {obj!r} for {cls.__name__}")
            return getattr(cls, name)
        raise TypeError(f"invalid weights argument {obj!r}")


def register_model(name: Optional[str] = None):
    """Decorator registering a model builder (reference ``register_model``,
    ``models/_api.py:196``)."""

    def wrapper(fn: Callable) -> Callable:
        key = name if name is not None else fn.__name__
        if key in _MODEL_REGISTRY:
            raise ValueError(f"model {key!r} already registered")
        _MODEL_REGISTRY[key] = fn
        return fn

    return wrapper


def list_models(include: Optional[str] = None, exclude: Optional[str] = None) -> List[str]:
    """Registered model names, optionally filtered by glob patterns
    (reference ``list_models``, ``models/_api.py:207``)."""
    names = set(_MODEL_REGISTRY)
    if include:
        names = set(fnmatch.filter(names, include))
    if exclude:
        names -= set(fnmatch.filter(names, exclude))
    return sorted(names)


def get_model_builder(name: str) -> Callable:
    name = name.lower()
    if name not in _MODEL_REGISTRY:
        raise ValueError(f"unknown model {name!r}; known: {sorted(_MODEL_REGISTRY)[:10]}...")
    return _MODEL_REGISTRY[name]


def get_model(name: str, **config) -> Any:
    """Build a model by name (reference ``get_model``, ``models/_api.py:265``)."""
    return get_model_builder(name)(**config)


def get_model_weights(name) -> Optional[type]:
    """The WeightsEnum class linked to a builder (reference
    ``get_model_weights``)."""
    fn = get_model_builder(name) if isinstance(name, str) else name
    return getattr(fn, "weights_enum", None)


def get_weight(name: str) -> Weights:
    """Resolve "ResNet50_Weights.IMAGENET1K_V1"-style strings (reference
    ``get_weight``, ``models/_api.py:108``)."""
    enum_name, _, member = name.partition(".")
    enum = ENUM_REGISTRY.get(enum_name)
    if enum is None:
        for builder in _MODEL_REGISTRY.values():
            e = getattr(builder, "weights_enum", None)
            if e is not None and e.__name__ == enum_name:
                enum = e
                break
    if enum is None:
        raise ValueError(f"unknown weights enum {enum_name!r}")
    if not hasattr(enum, member):
        raise ValueError(f"{enum_name} has no member {member}")
    return getattr(enum, member)

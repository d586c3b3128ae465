"""Model export (counterpart of the reference's ONNX story).

The reference exports through ``ops/_register_onnx_ops.py`` symbolics +
``torch.onnx``; the TPU-native interchange format is **StableHLO** via
``jax.export``: one serialized artifact that any XLA runtime (TPU, GPU,
CPU, IREE, TF) can load and execute — playing the role ONNX plays for the
reference.  ``export_model`` traces ``model.apply`` once with the given
example input; ``save``/``load_exported`` round-trip the portable bytes;
``call_exported`` runs a loaded artifact.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["export_model", "save", "load_exported", "call_exported", "stablehlo_text"]


def _fn_of(model, train: bool, method: Optional[str]) -> Callable:
    import inspect

    takes_train = False
    try:
        takes_train = "train" in inspect.signature(model.__call__).parameters
    except (TypeError, ValueError):  # pragma: no cover - exotic callables
        pass

    def fn(variables, x):
        if method is not None:
            return model.apply(variables, x, method=method)
        if takes_train:
            return model.apply(variables, x, train=train)
        return model.apply(variables, x)

    return fn


def export_model(model, variables, example_input, *, train: bool = False,
                 method: Optional[str] = None):
    """Trace + lower ``model.apply(variables, example_input)`` and return a
    ``jax.export.Exported`` (serializable, runs on any XLA backend)."""
    from jax import export as jexport

    fn = _fn_of(model, train, method)
    args = (
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables),
        jax.ShapeDtypeStruct(jnp.shape(example_input),
                             jnp.result_type(example_input)),
    )
    return jexport.export(jax.jit(fn))(*args)


def stablehlo_text(exported) -> str:
    """Human-readable StableHLO of an exported artifact (debugging aid,
    the analogue of inspecting an ONNX graph)."""
    return exported.mlir_module()


def save(exported, path: str) -> None:
    """Serialize to the portable bytes format."""
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def call_exported(exported, variables, x):
    """Execute a (possibly deserialized) exported artifact."""
    return exported.call(variables, x)

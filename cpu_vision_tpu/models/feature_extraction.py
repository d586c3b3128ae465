"""Feature extraction from intermediate layers.

Counterpart of the reference's FX-based ``create_feature_extractor``
(``models/feature_extraction.py:334``) and ``IntermediateLayerGetter``
(``models/_utils.py:13``).  Flax modules are pure, so extraction uses
``capture_intermediates`` — no graph surgery needed.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Sequence

import jax

__all__ = ["create_feature_extractor", "extract_features"]


def extract_features(model, variables, x, nodes: Sequence[str], **apply_kwargs) -> Dict[str, Any]:
    """Run ``model.apply`` capturing the outputs of submodules whose path
    contains any of ``nodes`` (substring match on '/'-joined module paths)."""

    def filter_fn(mdl, method_name):
        path = "/".join(mdl.path)
        return any(n in path for n in nodes)

    out, state = model.apply(
        x if False else variables, x, capture_intermediates=filter_fn, mutable=["intermediates"], **apply_kwargs
    )
    feats: Dict[str, Any] = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if k == "__call__":
                feats[prefix] = v[0]
            elif isinstance(v, Mapping):
                walk(v, path)

    walk(state["intermediates"])
    return feats


def create_feature_extractor(model, return_nodes: Sequence[str]) -> Callable:
    """Return ``fn(variables, x, **kw) -> {node: activation}`` (reference
    ``create_feature_extractor``)."""

    def fn(variables, x, **kwargs):
        return extract_features(model, variables, x, return_nodes, **kwargs)

    return fn


def get_graph_node_names(model, variables, x, **apply_kwargs):
    """All capturable module paths (reference ``get_graph_node_names``,
    ``models/feature_extraction.py:244`` — the FX graph walk collapses to
    one traced ``apply`` with every intermediate captured).  Returns
    ``(train_nodes, eval_nodes)``; flax modules trace identically in both
    modes, so the two lists are equal."""
    _, state = model.apply(
        variables, x, capture_intermediates=True, mutable=["intermediates"],
        **apply_kwargs)
    names = []

    def walk(tree, prefix=""):
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if k == "__call__":
                if prefix:
                    names.append(prefix)
            elif isinstance(v, Mapping):
                walk(v, path)

    walk(state["intermediates"])
    return names, list(names)


__all__.append("get_graph_node_names")
